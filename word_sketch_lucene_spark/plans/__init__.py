"""Declarative query plans: grammar-relation catalog → DataFrame templates;
mini-BCQL pattern compiler (``plans.cql``)."""
