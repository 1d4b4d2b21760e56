"""Experiment apps: one entry point per reference workload (SURVEY.md L5)."""
