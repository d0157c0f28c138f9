"""Structured Streaming variants of the batch operators (SURVEY.md §7.4.7:
streaming arrives as an engine extension — the reference itself is purely
batch)."""
