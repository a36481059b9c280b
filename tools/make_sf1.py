"""Generate the sf1 proof tier (10x sf0.1) the round-8/9 verdicts asked
for — the tier that catches precision/overflow cliffs the two small
tiers can't (the round-8 slice-INT_MAX bug was caught only by a hash
gate; int32/precision cliffs often need another decade of rows).

Replication follows tools/scale_check.py's honest key-space scaling:
10 replicas with shifted primary/foreign keys (so join fan-outs and
group cardinalities scale WITH the data, as in production), dimension
tables (region, nation) kept fixed like TPC-H does. Documents get
per-replica token prefixes — in-alphabet 'rNx…', so tokenizer-facing
filters like BPE's ^[a-z0-9]+$ still see the corpus, and shingle
spaces stay disjoint (pair structure stays linear) — EXCEPT replica 0,
which keeps the ORIGINAL tokens (VERDICT r14 item 1: prefixing every
replica made fixed-literal queries — the whole BM25/boolean/hybrid
search family, corpus_clean's language gates, simhash_capped's
near-dup structure — return 0 rows at sf1, so the tier value-checked
nothing for them; the bare r0 token space is disjoint from r1..r9 by
the same prefix argument that keeps the replicas pairwise disjoint).
Embeddings replicate as plain copies (a near-dup-rich corpus at 10x
density — the harder regime for dedup blocking).

Events drop the 17th of EVERY month — `day(ts) != 17` keeps the
day-of-month, not one calendar date, so a corpus spanning months
carries one gap per month (round-15 advice: the docs said "one-day
outage"; the predicate is the shipped semantics and the sf1 proofs
bind to it, so the DOCS are corrected rather than the fixture
regenerated). A recurring monthly ingestion-outage pattern
(same VERDICT item: dense 10x replication closed every gap in the
sparse daily series, so series_gaps_daily proved an empty set). The
gap is a property of the DATA, shared by both engines, so every
event-grain oracle stays exact; gap/missing-data operators now bind
at the proof tier.

DuckDB does the writing: single-process, preserves the source's
TIMESTAMP(NANOS) events encoding, and finishes in seconds.

Usage: python tools/make_sf1.py [out_dir (default /tmp/testdata_sf1)]
"""

from __future__ import annotations

import os
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
K = 10  # replicas
OFF = 10_000_000
EVT_OFF = 100_000_000

# per-table replication SELECTs; {src} = source parquet, r = replica id
SQL = {
    "region": "SELECT * FROM '{src}'",
    "nation": "SELECT * FROM '{src}'",
    "customer": """
        SELECT c_custkey + r*{off} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{src}', range({k}) t(r)""",
    "supplier": """
        SELECT s_suppkey + r*{off} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{src}', range({k}) t(r)""",
    "part": """
        SELECT p_partkey + r*{off} AS p_partkey, p_name, p_brand, p_type,
               p_size, p_retailprice
        FROM '{src}', range({k}) t(r)""",
    "orders": """
        SELECT o_orderkey + r*{off} AS o_orderkey,
               o_custkey + r*{off} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}', range({k}) t(r)""",
    "lineitem": """
        SELECT l_orderkey + r*{off} AS l_orderkey,
               l_partkey + r*{off} AS l_partkey,
               l_suppkey + r*{off} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}', range({k}) t(r)""",
    "events": """
        SELECT event_id + r*{evt_off} AS event_id, ts,
               user_id + r*{off} AS user_id, event_type, value, props
        FROM '{src}', range({k}) t(r)
        WHERE day(ts) != 17""",
    "documents": """
        SELECT doc_id + r*{off} AS doc_id,
               array_to_string(list_transform(string_split(text, ' '),
                 tok -> CASE WHEN r = 0 THEN tok
                        ELSE 'r' || r || 'x' || tok END), ' ') AS text,
               lang, source,
               CAST(length(array_to_string(list_transform(
                 string_split(text, ' '),
                 tok -> CASE WHEN r = 0 THEN tok
                        ELSE 'r' || r || 'x' || tok END), ' '))
                 AS BIGINT) AS n_chars
        FROM '{src}', range({k}) t(r)""",
    "embeddings": """
        SELECT vec_id + r*{off} AS vec_id, embedding, label
        FROM '{src}', range({k}) t(r)""",
}


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/testdata_sf1"
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    for table, tpl in SQL.items():
        sel = tpl.format(
            src=f"{SRC}/{table}.parquet", k=K, off=OFF, evt_off=EVT_OFF
        )
        out = f"{out_dir}/{table}.parquet"
        con.execute(f"COPY ({sel}) TO '{out}' (FORMAT PARQUET)")
        n = con.execute(f"SELECT count(*) FROM '{out}'").fetchone()[0]
        print(f"{table}: {n} rows -> {out}")


if __name__ == "__main__":
    main()
