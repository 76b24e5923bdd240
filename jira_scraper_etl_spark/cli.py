"""Command-line entry points — the reference's ``main.py`` / ``worker.py``
argparse surface on Spark.

* ``python -m jira_scraper_etl_spark [--extract] [--transform]
  [--project P] [--config path] [--clean]`` — the batch pipeline
  (reference `main.py:98-120,149-155`): no phase flag means both phases
  (`main.py:114-118`); ``--project`` narrows to one configured project
  and errors if unknown (`main.py:146-155`); ``--clean`` deletes
  checkpoint files and the bronze dirs to start fresh
  (`main.py:65-96`, `Makefile:42-45`).
* ``python -m jira_scraper_etl_spark worker [--interval H] [--config
  path] [--no-initial-run]`` — the scheduler (reference
  `worker.py:104-116`), with SIGINT/SIGTERM wired to the worker's stop
  event for graceful shutdown (`worker.py:118-128` — the reference
  exits inside the handler; here the handler only sets the event so the
  in-flight run finishes and the final status write happens on the
  normal path).

Both accept an injected SparkSession for tests; production creates one
via session.get_spark().
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import signal
import sys
import threading

from .streaming.pipeline import PipelineConfig, run_pipeline, run_worker


def load_config(path: str) -> PipelineConfig:
    """Config file is optional, like the reference's load_config
    (`main.py:32-50`): missing file → defaults."""
    if path and os.path.exists(path):
        return PipelineConfig.from_json(path)
    return PipelineConfig()


def clean_data(cfg: PipelineConfig, specific_project: str | None = None) -> int:
    """Delete checkpoint files (and bronze dirs) so the next run starts
    fresh (reference `main.py:65-96`; bronze is the raw-dir analog the
    Makefile's clean targets remove). Returns number of paths removed."""
    removed = 0
    pattern = f"{specific_project}.*" if specific_project else "*"
    for f in glob.glob(os.path.join(cfg.dir("checkpoints"), pattern)):
        try:
            os.remove(f)
            removed += 1
        except OSError:
            pass
    bronze_glob = (f"project={specific_project}" if specific_project
                   else "project=*")
    for d in glob.glob(os.path.join(cfg.dir("bronze"), bronze_glob)):
        shutil.rmtree(d, ignore_errors=True)
        removed += 1
    return removed


def _narrow_project(cfg: PipelineConfig, project: str | None) -> bool:
    if project is None:
        return True
    if project in cfg.projects:
        cfg.projects = [project]
        return True
    print(f"Project {project} not found in config", file=sys.stderr)
    return False


def parse_pipeline_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="jira_scraper_etl_spark",
                                description="Jira ETL pipeline on Spark")
    p.add_argument("--extract", action="store_true", help="run extraction phase")
    p.add_argument("--transform", action="store_true", help="run transformation phase")
    p.add_argument("--project", type=str, help="process only this project")
    p.add_argument("--config", type=str, default="config.json", help="config file path")
    p.add_argument("--clean", action="store_true",
                   help="clean checkpoint files and bronze dirs first")
    args = p.parse_args(argv)
    if not (args.extract or args.transform):  # main.py:114-118
        args.extract = args.transform = True
    return args


def pipeline_main(argv: list[str] | None = None, spark=None) -> bool:
    """The ``python -m jira_scraper_etl_spark`` entry. Returns success
    (the reference's main() boolean, `main.py:205-211`)."""
    args = parse_pipeline_args(argv)
    cfg = load_config(args.config)
    if not _narrow_project(cfg, args.project):
        return False
    if args.clean:
        clean_data(cfg, args.project)
    if spark is None:
        from .session import get_spark
        spark = get_spark()
    import time

    t0 = time.perf_counter()
    report = run_pipeline(spark, cfg, extract=args.extract,
                          transform=args.transform)
    total = time.perf_counter() - t0
    # Per-phase wall-clock lines (reference main.py:139,162-166,188-190).
    for phase in ("extract", "transform"):
        secs = report.get(f"{phase}_seconds")
        if secs is not None:
            print(f"{phase} phase completed in {secs:.3f}s", file=sys.stderr)
    if report.get("transform_skipped"):
        print(f"transform phase skipped: {report['transform_skipped']}",
              file=sys.stderr)
    print(f"pipeline completed in {total:.3f}s "
          f"(success={report['success']})", file=sys.stderr)
    print(json.dumps(report, indent=2))
    return bool(report["success"])


def install_signal_handlers(stop_event: threading.Event):
    """SIGINT/SIGTERM → stop_event.set() (reference `worker.py:118-128`).
    Returns the previous handlers for restoration (tests). No-op when
    not on the main thread (signal.signal would raise)."""
    def handler(sig, frame):
        stop_event.set()

    try:
        prev = {s: signal.signal(s, handler)
                for s in (signal.SIGINT, signal.SIGTERM)}
    except ValueError:  # not the main thread
        prev = {}
    return prev


def parse_worker_args(argv: list[str] | None = None) -> argparse.Namespace:
    p = argparse.ArgumentParser(prog="jira_scraper_etl_spark worker",
                                description="Jira ETL pipeline worker")
    p.add_argument("--interval", type=float, default=6,
                   help="job interval in hours")
    p.add_argument("--config", type=str, default="config.json",
                   help="config file path")
    p.add_argument("--no-initial-run", action="store_true",
                   help="skip the immediate run at startup")
    return p.parse_args(argv)


def worker_main(argv: list[str] | None = None, spark=None,
                stop_event: threading.Event | None = None,
                max_runs: int | None = None) -> dict:
    """The ``python -m jira_scraper_etl_spark worker`` entry.
    ``stop_event``/``max_runs`` are injectable for tests; production
    relies on the signal handlers."""
    args = parse_worker_args(argv)
    cfg = load_config(args.config)
    stop_event = stop_event or threading.Event()
    prev = install_signal_handlers(stop_event)
    try:
        if spark is None:
            from .session import get_spark
            spark = get_spark()
        return run_worker(spark, cfg,
                          interval_seconds=args.interval * 3600,
                          initial_run=not args.no_initial_run,
                          stop_event=stop_event,
                          max_runs=max_runs)
    finally:
        for sig, h in prev.items():
            signal.signal(sig, h)


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if argv and argv[0] == "worker":
        worker_main(argv[1:])
        return 0
    return 0 if pipeline_main(argv) else 1
