"""Reusable operator library (E2 surface, SURVEY.md §3.2): pure
DataFrame→DataFrame / Column→Column builders shared by the registered
queries and usable directly by engine users."""
