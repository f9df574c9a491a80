"""Ops layer: spark-submit orchestration, logging, environment detection,
synthetic data generation (SURVEY.md §2.13 X4-X7)."""
