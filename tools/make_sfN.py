#!/usr/bin/env python3
"""Synthesize a BENCH-ONLY N-replica scale-up of the provided sf0.1 tables.

The driver ships sf0.001/0.01/0.1 only; the 100 TB claims need measured
scaling points, so this tool replicates the sf0.1 tables R times with
key-shifted facts (dims stay — the classic fact-scale-up):

- orders/lineitem: o_orderkey/l_orderkey shifted per replica (join keys
  stay consistent; dim FKs unchanged).
- events: event_id + user_id shifted — R x users, so windowed/session
  state scales with data instead of piling onto the same keys.
- documents: doc_id shifted; a per-replica marker token appended so
  replicas of one doc form NEAR-duplicate clusters (the shape the dedup
  pipeline is built for) instead of byte-identical rows.
- embeddings: vec_id shifted; a deterministic per-replica perturbation on
  one dimension so replicas are near- (not exact-) neighbors.

Replica 0 is the original data byte-for-byte. Everything is
deterministic — no RNG. The output is NOT a correctness input: oracles
keep running on the driver-provided dirs only; this exists purely for
the scaling curve in PERF.md. R=10 ~= sf1 (10x bench SF); R=100 ~= sf10
(100x bench SF). Key shifts use a 10M stride, safe for any R < 10^4
against sf0.1's key ranges (< 1M).

Usage: python3 tools/make_sfN.py [replicas] [src_dir] [out_dir]
       (out_dir defaults to /root/repo/bench_sf{replicas/10})
"""
import os
import sys

import duckdb

REP = int(sys.argv[1]) if len(sys.argv) > 1 else 10
SRC = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
if len(sys.argv) > 3:
    OUT = sys.argv[3]
else:
    sf = REP / 10
    name = str(int(sf)) if sf == int(sf) else str(sf)
    OUT = f"/root/repo/bench_sf{name}"

COPY_AS_IS = ["region", "nation", "customer", "supplier", "part"]


def main():
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE reps AS SELECT unnest(range({REP})) AS r")
    for t in COPY_AS_IS:
        con.execute(
            f"COPY (SELECT * FROM '{SRC}/{t}.parquet') TO "
            f"'{OUT}/{t}.parquet' (FORMAT PARQUET)")
    shifts = {
        "orders": """SELECT o_orderkey + r * 10000000 AS o_orderkey,
                o_custkey, o_orderstatus, o_totalprice, o_orderdate,
                o_orderpriority""",
        "lineitem": """SELECT l_orderkey + r * 10000000 AS l_orderkey,
                l_partkey, l_suppkey, l_linenumber, l_quantity,
                l_extendedprice, l_discount, l_tax, l_returnflag,
                l_linestatus, l_shipdate""",
        # ts as BIGINT epoch-nanos: the source parquet is TIMESTAMP(NANOS),
        # which Spark reads as LongType under nanosAsLong=true; a DuckDB
        # round-trip would silently downgrade it to timestamp[us] and break
        # every events query's `ts DIV 1000` normalization. int64 nanos
        # reads as the same LongType the loader expects.
        "events": """SELECT event_id + r * 100000000 AS event_id,
                epoch_ns(ts) AS ts,
                user_id + r * 10000000 AS user_id, event_type, value,
                props""",
        # ' rep' || r appends 4 + len(r) chars, so n_chars tracks len(text)
        # exactly (the r6 ADVICE off-by-one used 5 + len(r))
        "documents": """SELECT doc_id + r * 10000000 AS doc_id,
                CASE WHEN r = 0 THEN text
                     ELSE text || ' rep' || r END AS text,
                lang, source,
                CASE WHEN r = 0 THEN n_chars
                     ELSE n_chars + 4 + len(CAST(r AS VARCHAR)) END AS n_chars""",
        "embeddings": """SELECT vec_id + r * 10000000 AS vec_id,
                CASE WHEN r = 0 THEN embedding
                     ELSE list_transform(embedding, (x, i) ->
                       CASE WHEN i = 1
                         THEN CAST(x + 0.001 * r AS FLOAT) ELSE x END)
                END AS embedding,
                label""",
    }
    # documents/embeddings feed per-row-HEAVY scans (shingle minhash, text
    # quality, IVF assignment); DuckDB's default ~123k-row row groups give
    # a 500k-row table only ~5 groups, capping Spark's scan parallelism at
    # 5 tasks no matter how small spark.sql.files.maxPartitionBytes is (a
    # split without a row-group start reads nothing). 20k-row groups let
    # the bench fan those scans out. Fact tables keep the default: their
    # byte volume already yields dozens of groups.
    row_group = {"documents": 20000, "embeddings": 20000}
    for t, sel in shifts.items():
        rg = (f", ROW_GROUP_SIZE {row_group[t]}" if t in row_group else "")
        con.execute(
            f"COPY ({sel} FROM '{SRC}/{t}.parquet' CROSS JOIN reps) "
            f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET{rg})")
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
