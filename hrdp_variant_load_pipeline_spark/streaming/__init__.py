"""Structured Streaming operators (engine extension; the reference is
strictly batch — SURVEY.md §2.10)."""
