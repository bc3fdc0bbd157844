"""Structured Streaming surface (SURVEY.md §2.B streaming)."""
