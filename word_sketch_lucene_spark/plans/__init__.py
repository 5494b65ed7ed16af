"""Declarative query plans: grammar-relation catalog → DataFrame templates."""
