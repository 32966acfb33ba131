"""Distributed operators: blocking, scoring, clustering, evaluation, dedup, ANN."""
