"""Query definitions for SURVEY.md §2, grouped by capability area."""
