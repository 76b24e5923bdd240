"""Structured Streaming layer: incremental pipelines, scheduled worker
analog, and progress/health reporting."""
