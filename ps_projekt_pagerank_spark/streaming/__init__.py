"""Structured Streaming variants (north-rule is batch-iterative; this is
the training-pipeline surface for continuously-arriving events)."""
