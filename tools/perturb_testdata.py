"""Randomized-input twin of the driver's testdata: Bernoulli-subsample each
table and deterministically jitter payload columns (hash-seeded, so a given
seed always produces the same corpus), preserving every schema/physical
type the queries rely on (timestamp[us] ts, FLOAT[] embeddings).

The point: the correctness gate (tools/check_oracles.py) compares every
queries() entry against its oracle_sql() on the SAME parquet inputs — on
the FIXED sf tables a query and its oracle could agree by accident (a
predicate that never fires, a group that never collides, a NULL path never
taken). Running the same gate over seeded perturbations (subsampled rows,
jittered numerics/dates, NULLs injected into nullable payload columns)
re-tests the pair on data it was never tuned on. Keys stay unique
(subsample WITHOUT replacement) so window/top-k tie-breaks remain
deterministic on both engines.

Usage: python tools/perturb_testdata.py <out_dir> [seed] [src_dir]
Then:  python tools/check_oracles.py <out_dir>
"""

from __future__ import annotations

import os
import sys

import duckdb


def _j(expr: str, key: str, seed: int, lo: float = 0.8, hi: float = 1.2) -> str:
    """Deterministic multiplicative jitter in [lo, hi) keyed on (key, seed)."""
    span = hi - lo
    return (
        f"({expr}) * ({lo} + {span} * ((hash({key} * 1000003 + {seed})"
        f" % 1000) / 1000.0))"
    )


def _null(expr: str, key: str, seed: int, one_in: int = 25) -> str:
    """Deterministically NULL ~1/one_in of the values."""
    return (
        f"CASE WHEN hash({key} * 7919 + {seed + 13}) % {one_in} = 0"
        f" THEN NULL ELSE ({expr}) END"
    )


def build(out_dir: str, seed: int = 42, src: str = "/root/testdata/sf0.001"):
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()

    def copy(table: str, select: str, sample: int | None = 80):
        tail = f" USING SAMPLE {sample} PERCENT (bernoulli, {seed})" if sample else ""
        con.execute(
            f"COPY (SELECT {select} FROM '{src}/{table}.parquet'{tail})"
            f" TO '{out_dir}/{table}.parquet' (FORMAT PARQUET)"
        )

    # dimension tables: keep whole (tiny, and region/nation names are
    # join anchors for many queries)
    copy("region", "*", sample=None)
    copy("nation", "*", sample=None)

    copy("customer", ", ".join([
        "c_custkey", "c_name", "c_nationkey",
        "CAST(" + _null(_j("c_acctbal", "c_custkey", seed), "c_custkey", seed)
        + " AS DOUBLE) AS c_acctbal",
        "c_mktsegment",
    ]))
    copy("supplier", ", ".join([
        "s_suppkey", "s_name", "s_nationkey",
        "CAST(" + _j("s_acctbal", "s_suppkey", seed) + " AS DOUBLE) AS s_acctbal",
    ]), sample=None)
    copy("part", ", ".join([
        "p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "CAST(" + _null(_j("p_retailprice", "p_partkey", seed), "p_partkey", seed)
        + " AS DOUBLE) AS p_retailprice",
    ]))
    copy("orders", ", ".join([
        "o_orderkey", "o_custkey", "o_orderstatus",
        "CAST(" + _j("o_totalprice", "o_orderkey", seed)
        + " AS DOUBLE) AS o_totalprice",
        # shift by up to ±3 days, microsecond precision preserved
        "o_orderdate + INTERVAL (CAST(hash(o_orderkey * 31 + " + str(seed)
        + ") % 518400 AS BIGINT) - 259200) SECOND AS o_orderdate",
        _null("o_orderpriority", "o_orderkey", seed, one_in=40) + " AS o_orderpriority",
    ]))
    copy("lineitem", ", ".join([
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "CAST(round(" + _j("l_quantity", "l_orderkey + l_linenumber", seed)
        + ") AS DOUBLE) AS l_quantity",
        "CAST(" + _j("l_extendedprice", "l_orderkey * 10 + l_linenumber", seed)
        + " AS DOUBLE) AS l_extendedprice",
        "CAST(" + _null("round(" + _j("l_discount", "l_orderkey + 3 * l_linenumber", seed,
                           0.5, 1.5) + ", 2)", "l_orderkey + 3 * l_linenumber", seed)
        + " AS DOUBLE) AS l_discount",
        "l_tax", "l_returnflag", "l_linestatus", "l_shipdate",
    ]))
    copy("events", ", ".join([
        "event_id",
        "ts + INTERVAL (CAST(hash(event_id * 17 + " + str(seed)
        + ") % 7200 AS BIGINT) - 3600) SECOND AS ts",
        "user_id", "event_type",
        "CAST(" + _null(_j("value", "event_id", seed), "event_id", seed) + " AS DOUBLE) AS value",
        "props",
    ]))
    # corpus tables: subsample, then INJECT fresh near-duplicates — ~1 in 8
    # surviving docs re-appears under a NEW doc_id with a token-level
    # mutation (first word dropped / ' the' suffix, hash-chosen), so the
    # dedup family (MinHash/SimHash/n-gram/exact) faces duplicate
    # structure the fixed tables never had; fresh ids keep tie-breaks
    # deterministic. Text beyond the mutation is untouched: both engines
    # must see byte-identical shingle input
    con.execute(
        f"""
        COPY (
          WITH base AS (
            SELECT * FROM '{src}/documents.parquet'
            USING SAMPLE 80 PERCENT (bernoulli, {seed})
          ),
          mx AS (SELECT max(doc_id) AS m FROM base)
          SELECT * FROM base
          UNION ALL
          SELECT
            mx.m + 1 + row_number() OVER (ORDER BY b.doc_id) AS doc_id,
            CASE WHEN hash(b.doc_id * 131 + {seed}) % 2 = 0
                 THEN b.text || ' the'
                 ELSE regexp_replace(b.text, '^[^ ]+ ', '')
            END AS text,
            b.lang, b.source,
            CAST(length(CASE WHEN hash(b.doc_id * 131 + {seed}) % 2 = 0
                 THEN b.text || ' the'
                 ELSE regexp_replace(b.text, '^[^ ]+ ', '')
            END) AS BIGINT) AS n_chars
          FROM base b, mx
          WHERE hash(b.doc_id * 977 + {seed}) % 8 = 0
        ) TO '{out_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    # the PQ codebook trains on the fixed vec_id range [100, 116) — a
    # corpus contract ann_pq_topk guards loudly (first seed42 sweep:
    # "expects vec_ids [100, 116) present; found 11 of 16"); keep those
    # rows in every sample
    con.execute(
        f"COPY (SELECT * FROM '{src}/embeddings.parquet'"
        f" WHERE vec_id BETWEEN 100 AND 115"
        f" UNION ALL"
        f" SELECT * FROM (SELECT * FROM '{src}/embeddings.parquet'"
        f" USING SAMPLE 80 PERCENT (bernoulli, {seed}))"
        f" WHERE vec_id NOT BETWEEN 100 AND 115)"
        f" TO '{out_dir}/embeddings.parquet' (FORMAT PARQUET)"
    )
    con.close()
    print(f"perturbed testdata written to {out_dir} (seed={seed}, src={src})")


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/randdata/seed42"
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42
    src = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"
    build(out, seed, src)
