"""Scalar/text helper functions (SURVEY.md §2.7 inventory)."""
