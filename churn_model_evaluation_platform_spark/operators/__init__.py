"""Operator library: every operator is ``DataFrame -> DataFrame``."""
