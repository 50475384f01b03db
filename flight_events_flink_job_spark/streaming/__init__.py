"""Structured Streaming layer: incremental execution of the same
transformation functions the batch engine uses (SURVEY.md §2.4, §7.4)."""
