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
  pipeline is built for) instead of byte-identical rows. Near-dup
  FAMILIES ARE CAPPED at FAMILY=4 replicas: replicas in group g = r//4
  for g >= 1 get every token suffixed with a group tag, which drops
  cross-group token-set Jaccard to ~0 (< the 0.7 verify threshold and
  below any LSH band collision) while within-group replicas still differ
  only by the ' rep<r>' marker. Without the cap, all R replicas of one
  doc were mutual near-dups and the candidate/CC input grew ~C(R,2) —
  22,000x edges on 100x data (r7 verdict) — a replication artifact, not
  a property of 100x corpora.
- embeddings: vec_id shifted; group g = r//4 rotates the 64-dim vector
  by g positions (zero-mean synthetic dims: cross-group cosine
  concentrates near 0, p99 ~0.29 < the 0.35 eps-join threshold, with a
  realistic sparse tail above it), and within a group a deterministic
  0.001*(r%4) perturbation on one dimension keeps replicas near- (not
  exact-) neighbors. Same C(R,2) -> O(R) edge-growth fix as documents.

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
        # family cap: group g = r//4. g=0 keeps the original token stream
        # (so r=1..3 stay near-dups of the byte-identical r=0); g>=1
        # suffixes EVERY token with 'g<g>', so groups share no tokens —
        # no LSH band collision, token-set Jaccard ~0 across groups.
        # ' rep' || r keeps within-group replicas distinct near-dups.
        # n_chars is recomputed as len(text) — the suffixing makes a
        # constant-offset adjustment impossible to state safely.
        "documents": """SELECT doc_id, text, lang, source,
                CASE WHEN orig THEN n_chars ELSE len(text) END AS n_chars
              FROM (SELECT doc_id + r * 10000000 AS doc_id,
                CASE WHEN r = 0 THEN text
                     WHEN r // 4 = 0 THEN text || ' rep' || r
                     ELSE array_to_string(list_transform(
                            string_split(text, ' '),
                            w -> w || 'g' || (r // 4)), ' ')
                          || ' rep' || r END AS text,
                lang, source, n_chars, r = 0 AS orig FROM {src})""",
        # family cap: group g = r//4 rotates the vector by g positions
        # (dims are zero-mean — rotated copies decorrelate, cosine ~0);
        # within a group the 0.001*(r%4) single-dim perturbation keeps
        # replicas near-neighbors of the unrotated-or-rotated base.
        "embeddings": """SELECT vec_id + r * 10000000 AS vec_id,
                CASE WHEN r = 0 THEN embedding
                     ELSE list_transform(range(len(embedding)), i ->
                       CAST(embedding[((i + r // 4) % len(embedding)) + 1]
                         + CASE WHEN i = 0 THEN 0.001 * (r % 4)
                                ELSE 0 END AS FLOAT))
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
        src = f"'{SRC}/{t}.parquet' CROSS JOIN reps"
        # a query with its own nesting carries a {src} placeholder; the
        # flat SELECT-list-only ones get the FROM appended as before
        q = sel.format(src=src) if "{src}" in sel else f"{sel} FROM {src}"
        con.execute(
            f"COPY ({q}) TO '{OUT}/{t}.parquet' (FORMAT PARQUET{rg})")
        n = con.execute(f"SELECT count(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
