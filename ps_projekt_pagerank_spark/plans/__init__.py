"""Reporting plans (SURVEY.md §2.4, R1-R4)."""
