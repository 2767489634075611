"""Sources (SURVEY.md §2.1): transcript tables and raw log files."""
