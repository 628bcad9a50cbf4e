"""Extraction operators and DataFrame-level building blocks."""
