"""Distributed inverted-index build: postings, stats, segments, merge, manifests."""
