"""Medallion pipeline stages (bronze/silver/gold)."""
