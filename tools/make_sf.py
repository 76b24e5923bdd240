"""Scale the driver's sf0.1 testdata by an integer factor K (default 10
→ "sf1") into a repo-local scratch dir, for scaling soaks the read-only
/root/testdata tree doesn't provide.

Usage: python tools/make_sf.py [K] [out_dir]

Construction (deterministic, seed fixed):

* region/nation: copied unchanged (constant-size dims at any SF).
* customer/supplier/part/orders/lineitem/events: K copies with all
  keys shifted by ``copy * (max_key + 1)`` — referential integrity is
  preserved within each copy, and non-key distributions (dates, prices)
  are identical per copy, so the workload density scales exactly K× the
  way a bigger TPC-H SF would. Event TIMESTAMPS are additionally shifted
  by ``copy * 31 days`` (the sf0.1 window is 30 days): stacking K copies
  on identical timestamps makes every time-band join degenerate (K rows
  share each instant, so join_skewed_peers_1h's 1-hour band pairs grow
  ~K² — its sf1 sweep aborted past 18 min on the un-jittered data, a
  generator artifact, round-13 verdict #9). Shifting whole copies keeps
  per-hour density EXACTLY the original, so band-join volume scales K×
  — the way K× more real traffic over K× more wall-clock would.
* documents: copy 0 is the original corpus (keeping its engineered
  near-duplicate structure); copies 1..K-1 get FRESH text sampled from
  the original corpus's own token frequency distribution (same length
  distribution, same vocabulary) — a plain K× copy of the text would
  make every doc a member of a 10-way exact-duplicate cluster, which
  blows up the dedup/LSH workload unrealistically.
* embeddings: copy 0 original; copies get fresh unit-norm N(0,1)
  vectors (dim preserved) with doc_id/label remapped — same rationale.

Output is ~10× sf0.1 ≈ 150 MB of parquet; DuckDB does the heavy
lifting so this runs in seconds.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"

# key strides = max_key + 1 at sf0.1
STRIDES = dict(customer=15_000, orders=150_000, supplier=1_000,
               part=20_000, events=100_000, documents=5_000,
               embeddings=2_000, users=1_500)


def scale_relational(con, out: str, k: int) -> None:
    con.execute(f"CREATE OR REPLACE VIEW copies AS SELECT unnest(range({k})) AS c")
    jobs = {
        "region": "SELECT * FROM src",
        "nation": "SELECT * FROM src",
        "customer": f"""SELECT c_custkey + c*{STRIDES['customer']} AS c_custkey,
            c_name, c_nationkey, c_acctbal, c_mktsegment FROM src, copies""",
        "supplier": f"""SELECT s_suppkey + c*{STRIDES['supplier']} AS s_suppkey,
            s_name, s_nationkey, s_acctbal FROM src, copies""",
        "part": f"""SELECT p_partkey + c*{STRIDES['part']} AS p_partkey,
            p_name, p_brand, p_type, p_size, p_retailprice FROM src, copies""",
        "orders": f"""SELECT o_orderkey + c*{STRIDES['orders']} AS o_orderkey,
            o_custkey + c*{STRIDES['customer']} AS o_custkey,
            o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
            FROM src, copies""",
        "lineitem": f"""SELECT l_orderkey + c*{STRIDES['orders']} AS l_orderkey,
            l_partkey + c*{STRIDES['part']} AS l_partkey,
            l_suppkey + c*{STRIDES['supplier']} AS l_suppkey,
            l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
            l_returnflag, l_linestatus, l_shipdate FROM src, copies""",
        "events": f"""SELECT event_id + c*{STRIDES['events']} AS event_id,
            ts + c * INTERVAL 31 DAY AS ts,
            user_id + c*{STRIDES['users']} AS user_id,
            event_type, value, props FROM src, copies""",
    }
    for name, sql in jobs.items():
        con.execute(f"CREATE OR REPLACE VIEW src AS "
                    f"SELECT * FROM '{SRC}/{name}.parquet'")
        # ROW_GROUP_SIZE: a single-row-group file is unsplittable, so a
        # scan of the one ~40-400 MB output file would serialize in one
        # task — unlike the many-file layout a real warehouse scans.
        # Small groups let Spark's byte-range splits parallelize honestly.
        con.execute(f"COPY ({sql}) TO '{out}/{name}.parquet' "
                    f"(FORMAT PARQUET, ROW_GROUP_SIZE 65536)")
        path = f"{out}/{name}.parquet"
        n = con.execute(f"SELECT count(*) FROM '{path}'").fetchone()[0]
        print(f"{name}: {n} rows")


def scale_documents(con, out: str, k: int, seed: int = 42) -> None:
    rows = con.execute(
        f"SELECT doc_id, text, lang, source FROM '{SRC}/documents.parquet' "
        "ORDER BY doc_id").fetchall()
    # corpus token frequency distribution → sampling table
    freq = con.execute(f"""
        SELECT t, count(*) AS n FROM (
            SELECT unnest(string_split(text, ' ')) AS t
            FROM '{SRC}/documents.parquet') WHERE t <> ''
        GROUP BY t ORDER BY t""").fetchall()
    vocab = [t for t, _ in freq]
    p = np.array([n for _, n in freq], dtype=np.float64)
    p /= p.sum()
    lens = np.array([len(t.split()) for _, t, _, _ in rows])
    rng = np.random.default_rng(seed)

    out_rows = list(rows)  # copy 0 keeps the engineered dup structure
    stride = STRIDES["documents"]
    for c in range(1, k):
        n_tokens = rng.permutation(lens)  # same length distribution
        for (doc_id, _, lang, source), n in zip(rows, n_tokens):
            text = " ".join(rng.choice(vocab, size=n, p=p))
            out_rows.append((doc_id + c * stride, text, lang, source))
    tbl = pa.table({
        "doc_id": pa.array([r[0] for r in out_rows], pa.int64()),
        "text": pa.array([r[1] for r in out_rows], pa.string()),
        "lang": pa.array([r[2] for r in out_rows], pa.string()),
        "source": pa.array([r[3] for r in out_rows], pa.string()),
        "n_chars": pa.array([len(r[1]) for r in out_rows], pa.int64()),
    })
    # small row groups so Spark can split the single file (see COPY note)
    pq.write_table(tbl, f"{out}/documents.parquet", row_group_size=2048)
    print(f"documents: {tbl.num_rows} rows")


def scale_embeddings(con, out: str, k: int, seed: int = 43) -> None:
    base = con.execute(
        f"SELECT vec_id, embedding, label, "
        f"       (SELECT max(len(embedding)) FROM '{SRC}/embeddings.parquet') "
        f"FROM '{SRC}/embeddings.parquet' ORDER BY vec_id").fetchall()
    dim = base[0][3]
    rng = np.random.default_rng(seed)
    vec_ids, embs, labels = ([r[0] for r in base],
                             [r[1] for r in base], [r[2] for r in base])
    stride = STRIDES["embeddings"]
    for c in range(1, k):
        fresh = rng.standard_normal((len(base), dim))
        fresh /= np.linalg.norm(fresh, axis=1, keepdims=True)
        for (vec_id, _, label, _), v in zip(base, fresh):
            vec_ids.append(vec_id + c * stride)
            embs.append([float(x) for x in v])
            labels.append(int(rng.integers(0, 10)))
    tbl = pa.table({
        "vec_id": pa.array(vec_ids, pa.int64()),
        "embedding": pa.array(embs, pa.list_(pa.float32())),
        "label": pa.array(labels, pa.int32()),
    })
    pq.write_table(tbl, f"{out}/embeddings.parquet", row_group_size=2048)
    print(f"embeddings: {tbl.num_rows} rows")


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    out = sys.argv[2] if len(sys.argv) > 2 else f".scratch/sf{k / 10:g}"
    # optional table filter, e.g. "documents,embeddings" — the sf30
    # linear-heavies probe (round-8 verdict #8) only needs the corpus
    # tables, and a full sf30 lineitem (~4 GB) would not fit the box
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    known = {"region", "nation", "customer", "supplier", "part",
             "orders", "lineitem", "events", "documents", "embeddings"}
    if only is not None and only - known:
        # a typo like 'document' would otherwise silently fall into the
        # relational bucket and produce a wrong dataset mix (ADVICE r9)
        print(f"unknown table(s) {sorted(only - known)}; "
              f"known: {sorted(known)}", file=sys.stderr)
        return 2
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    if only is None or only - {"documents", "embeddings"}:
        scale_relational(con, out, k)
    if only is None or "documents" in only:
        scale_documents(con, out, k)
    if only is None or "embeddings" in only:
        scale_embeddings(con, out, k)
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
