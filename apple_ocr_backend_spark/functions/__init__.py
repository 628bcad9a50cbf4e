"""Vectorized kernel functions (pandas/numpy) and columnar expression builders."""
