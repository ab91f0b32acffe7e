"""Operator library: relational query catalog + LLM-data-pipeline extensions."""
