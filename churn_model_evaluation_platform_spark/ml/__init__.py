"""Training-side dataflow (SURVEY §2.C)."""
