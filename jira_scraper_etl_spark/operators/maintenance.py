"""Table maintenance: small-file compaction for the bronze/silver
layers.

Micro-batch sinks (one file per partition per batch) and fine-grained
extracts accumulate small files; at scale the file count, not the byte
count, dominates scan planning and S3 listing. Compaction rewrites a
parquet directory to ~target-sized files and swaps it in. On a real
lakehouse this is `OPTIMIZE`/rewrite-data-files; the local
implementation keeps the same shape (size-based target file count,
write-then-swap) against the local filesystem.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession


def dir_stats(path: str) -> tuple[int, int]:
    """(n_data_files, total_bytes) for a local parquet directory tree."""
    n, total = 0, 0
    for root, _, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                n += 1
                total += os.path.getsize(os.path.join(root, f))
    return n, total


def compact_parquet(spark: SparkSession, path: str,
                    target_file_bytes: int = 128 * 1024 * 1024) -> dict:
    """Rewrite ``path`` to ceil(total_bytes / target) files and swap the
    directory in place (write to a sibling, then replace — the same
    two-phase shape a distributed FS rename gives you). Returns
    before/after stats. Row-preserving by construction: the rewrite is
    a read + coalesce + write of the same data."""
    n_before, total = dir_stats(path)
    df = spark.read.parquet(path)
    n_files = max(1, -(-total // target_file_bytes))
    tmp = path.rstrip("/") + "__compacting"
    df.coalesce(n_files).write.mode("overwrite").parquet(tmp)
    old = path.rstrip("/") + "__old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    n_after, total_after = dir_stats(path)
    return {"files_before": n_before, "files_after": n_after,
            "bytes_before": total, "bytes_after": total_after}
