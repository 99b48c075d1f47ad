"""Declarative query plans: the oracle-gated analytics surface."""
