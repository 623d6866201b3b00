"""Structured-Streaming execution pipeline (SURVEY.md entry point B)."""
