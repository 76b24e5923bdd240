"""Columnar function library: the engine's scalar/array building blocks."""
