"""Sources & sinks (SURVEY.md §2.5)."""
