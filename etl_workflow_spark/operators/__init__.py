"""Operators: ETL transforms + LLM-data-pipeline extensions."""
