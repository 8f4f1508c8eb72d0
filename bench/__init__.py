"""Benchmark harness package (SURVEY.md component 30)."""
