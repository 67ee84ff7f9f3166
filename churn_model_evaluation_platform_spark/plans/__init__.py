"""End-to-end pipelines composed from operators."""
