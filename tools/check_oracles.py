"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given SF dir; compare row
count, column names, and order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


EXACT = False  # --exact: byte-identical float compare (no rounding)


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "NaN"
                elif not EXACT:
                    # 9 dp: catches float32-precision bugs (~1e-8, e.g.
                    # DuckDB list_cosine_similarity on FLOAT[] computes in
                    # float32 — oracles must CAST to DOUBLE[]) while
                    # tolerating last-ulp distributed-sum-order noise
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    out.sort(key=lambda t: tuple(str(x) for x in t))
    return out


def main() -> int:
    global EXACT
    args = [a for a in sys.argv[1:] if a != "--exact"]
    EXACT = "--exact" in sys.argv[1:]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from __spark_entry__ import oracle_sql, queries
    from proteofav_spark.session import get_spark

    spark = get_spark(
        "oracle_check", cpus=os.environ.get("SPARK_GRAFT_CPUS", "8")
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    qs = queries()
    oracles = oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = sdf.collect()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL  {name}: spark error: {str(exc)[:200]}")
            continue
        if name not in oracles:
            print(f"SKIP  {name}: no oracle (rows-only: {len(srows)} rows)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL  {name}: duckdb error: {str(exc)[:200]}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema: spark={scols} duckdb={ocols}"))
            print(f"FAIL  {name}: schema mismatch {scols} vs {ocols}")
            continue
        if len(srows) != len(orows):
            failures.append((name, f"rows: spark={len(srows)} duckdb={len(orows)}"))
            print(f"FAIL  {name}: row count {len(srows)} vs {len(orows)}")
            continue
        cols_sorted = sorted(scols)
        s_norm = normalize([r.asDict() for r in srows], cols_sorted)
        o_norm = normalize(
            [dict(zip(ocols, r)) for r in orows], cols_sorted
        )
        if s_norm != o_norm:
            diff = [
                (a, b) for a, b in zip(s_norm, o_norm) if a != b
            ][:3]
            failures.append((name, f"values differ, e.g. {diff}"))
            print(f"FAIL  {name}: values differ; first diffs: {diff}")
            continue
        print(f"OK    {name}: {len(srows)} rows")

    print(f"\n{len(failures)} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
