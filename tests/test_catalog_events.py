"""Events loader unit-detection tests: the driver's generator has
emitted ``ts`` as TIMESTAMP(NANOS) in some rounds and TIMESTAMP(MICROS)
in others; ``load_events`` must read both to identical timestamp_ntz
values (nanos truncate to micros, matching DuckDB)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from jira_scraper_etl_spark.catalog import _events_ts_unit, load_events
from jira_scraper_etl_spark.streaming import events as SE

TS = [
    datetime.datetime(2024, 1, 1, 0, 0, 0, 123456),
    datetime.datetime(2024, 1, 28, 13, 16, 50, 465735),
    datetime.datetime(2024, 3, 31, 23, 59, 59, 999999),
]


def _write_events(path: str, unit: str) -> None:
    n = len(TS)
    tbl = pa.table({
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array(TS, pa.timestamp(unit)),
        "user_id": pa.array([7] * n, pa.int64()),
        "event_type": pa.array(["click"] * n, pa.string()),
        "value": pa.array([1.5] * n, pa.float64()),
        "props": pa.array(["{}"] * n, pa.string()),
    })
    pq.write_table(tbl, path)


@pytest.mark.parametrize("unit", ["ns", "us", "ms"])
def test_load_events_any_unit(spark, tmp_path, unit):
    d = tmp_path / f"events_{unit}"
    d.mkdir()
    _write_events(str(d / "events.parquet"), unit)
    assert _events_ts_unit(str(d / "events.parquet")) == unit
    df = load_events(spark, str(d))
    assert df.schema["ts"].dataType.typeName() == "timestamp_ntz"
    got = [r.ts for r in df.orderBy("event_id").collect()]
    if unit == "ms":  # millis lose sub-milli digits at write time
        want = [t.replace(microsecond=t.microsecond // 1000 * 1000) for t in TS]
    else:
        want = TS
    assert got == want


@pytest.mark.parametrize("unit", ["ns", "us"])
def test_stream_events_any_unit(spark, tmp_path, unit):
    d = tmp_path / f"sevents_{unit}"
    d.mkdir()
    _write_events(str(d / "01.parquet"), unit)
    stream = SE.stream_events(spark, str(d), glob="*.parquet")
    q = (stream.writeStream.format("memory").queryName(f"ev_{unit}")
         .option("checkpointLocation", str(tmp_path / f"ck_{unit}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(60)
    got = sorted(r.ts for r in spark.table(f"ev_{unit}").collect())
    assert got == TS
