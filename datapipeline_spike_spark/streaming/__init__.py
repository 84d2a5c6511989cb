"""Structured Streaming assemblies (SURVEY.md §2.9 ST1-ST9, §3.1-3.2
entry points A/B)."""
