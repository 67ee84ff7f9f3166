"""Reusable column expressions and distributed numeric primitives."""
