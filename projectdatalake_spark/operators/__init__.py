"""Operator surface of the engine (SURVEY.md §2)."""
