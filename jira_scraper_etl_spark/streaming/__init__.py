"""Orchestration + Structured Streaming layer."""

from .pipeline import (  # noqa: F401
    PipelineConfig,
    run_pipeline,
    run_streaming_silver,
    run_worker,
    scan_issues,
    stream_issues,
    write_status,
)
