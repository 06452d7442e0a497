"""Local mimic of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the given SF dir; compare row
count, column names, order-insensitive values, AND per-column output types
(Spark schema vs DuckDB result types). The type gate exists because the
driver's value hash is type-aware (Arrow serialization): a DuckDB HUGEINT
vs Spark BIGINT diverges in the driver even when every value compares
equal — exactly how the events_twap `sum(dt) // 1000000` bug survived two
rounds of value-only local checks.

Usage: python tools/check_oracles.py [sf_dir] [query_name ...] [--exact]
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

# Spark simpleString -> DuckDB type names that Arrow-serialize identically.
# Anything not equivalent under Arrow (HUGEINT vs BIGINT, DECIMAL width
# drift, FLOAT vs DOUBLE) must FAIL even when the Python values are equal.
_SPARK2DUCK = {
    "bigint": {"BIGINT"},
    "int": {"INTEGER"},
    "smallint": {"SMALLINT"},
    "tinyint": {"TINYINT"},
    "double": {"DOUBLE"},
    "float": {"FLOAT"},
    "string": {"VARCHAR"},
    "boolean": {"BOOLEAN"},
    "date": {"DATE"},
    "timestamp": {"TIMESTAMP", "TIMESTAMP WITH TIME ZONE"},
    "timestamp_ntz": {"TIMESTAMP"},
    "binary": {"BLOB"},
}


def _split_top_level(s: str) -> list[str]:
    """Split on commas at nesting depth 0 (over <>, (), and quoted
    identifiers)."""
    out, depth, cur, quote = [], 0, [], None
    for ch in s:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = None
            continue
        if ch in "\"'":
            quote = ch
            cur.append(ch)
        elif ch in "<(":
            depth += 1
            cur.append(ch)
        elif ch in ">)":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur).strip())
    return out


class UnknownTypeError(ValueError):
    """A scalar type name the parity mapping has never seen. Raised (not
    reported) since round 7: an unmapped DECIMAL/BINARY/INTERVAL oracle
    column previously sailed through the gate as a NOTE while the
    driver's Arrow hash could still diverge on it (VERDICT r6 'What's
    wrong' #2). The sweep records the raise as a FAIL for that query."""


def type_parity(spark_simple: str, duck_type: str):
    """True if the Spark type and the DuckDB type hash identically under a
    type-aware (Arrow) serialization. Nested types (array/struct/map)
    recurse element-wise and FAIL on divergence — a HUGEINT buried
    inside a STRUCT diverges in the driver's Arrow hash exactly like a
    top-level one (VERDICT r5 'What's wrong' #2). Unknown scalar names
    raise :class:`UnknownTypeError` — extend ``_SPARK2DUCK`` instead of
    letting a new type skip the gate."""
    s = spark_simple.strip().lower()
    d = duck_type.strip().upper()
    if s.startswith("decimal("):
        return d == s.upper()
    if s.startswith("array<") and s.endswith(">"):
        if not d.endswith("[]"):
            return False
        return type_parity(s[6:-1], d[:-2])
    if s.startswith("struct<") and s.endswith(">"):
        if not (d.startswith("STRUCT(") and d.endswith(")")):
            return False
        s_fields = _split_top_level(s[7:-1])
        d_fields = _split_top_level(duck_type.strip()[7:-1])
        if len(s_fields) != len(d_fields):
            return False
        for sf, df in zip(s_fields, d_fields):
            # spark: name:type       duckdb: name TYPE (name may be
            # quoted, and a quoted name may itself contain spaces)
            s_name, _, s_type = sf.partition(":")
            df = df.strip()
            if df.startswith('"'):
                # the closing quote is the first UNDOUBLED quote: DuckDB
                # escapes a literal quote inside a quoted identifier by
                # doubling it ("a""b"), so index('"', 1) would stop at
                # the escape and split name/type wrongly
                close = df.index('"', 1)
                while df[close + 1 : close + 2] == '"':
                    close = df.index('"', close + 2)
                d_name = df[1:close].replace('""', '"')
                d_type = df[close + 1 :].strip()
            else:
                d_name, _, d_type = df.partition(" ")
            if s_name.strip().lower() != d_name.strip().lower():
                return False
            if type_parity(s_type, d_type) is False:
                return False
        return True
    if s.startswith("map<") and s.endswith(">"):
        if not (d.startswith("MAP(") and d.endswith(")")):
            return False
        s_kv = _split_top_level(s[4:-1])
        d_kv = _split_top_level(duck_type.strip()[4:-1])
        if len(s_kv) != 2 or len(d_kv) != 2:
            return False
        return all(
            type_parity(st, dt) is not False for st, dt in zip(s_kv, d_kv)
        )
    expected = _SPARK2DUCK.get(s)
    if expected is None:
        raise UnknownTypeError(
            f"no Arrow-parity mapping for spark={spark_simple!r} vs "
            f"duckdb={duck_type!r}; extend _SPARK2DUCK"
        )
    return d in expected


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
    flags = {a for a in sys.argv[1:] if a.startswith("--")}
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    EXACT = "--exact" in flags
    include_retired = "--include-retired" in flags
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    from proteofav_spark.session import get_spark

    if include_retired:
        # retired twins left the DRIVER catalog (capacity policy, r9)
        # but stay oracle-checkable here and in CI
        from proteofav_spark.queries import all_oracles, all_queries

        def queries():
            return all_queries(include_retired=True)

        def oracle_sql():
            return all_oracles(include_retired=True)
    else:
        from __spark_entry__ import oracle_sql, queries

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
    checked = skipped = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            stypes = {f.name: f.dataType.simpleString() for f in sdf.schema}
            srows = sdf.collect()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"spark error: {exc}"))
            print(f"FAIL  {name}: spark error: {str(exc)[:200]}")
            continue
        if name not in oracles:
            skipped += 1
            print(f"SKIP  {name}: no oracle (rows-only: {len(srows)} rows)")
            continue
        checked += 1
        try:
            rel = con.sql(oracles[name])
            ocols = list(rel.columns)
            otypes = dict(zip(ocols, (str(t) for t in rel.types)))
            orows = rel.fetchall()
        except Exception as exc:  # noqa: BLE001
            failures.append((name, f"duckdb error: {exc}"))
            print(f"FAIL  {name}: duckdb error: {str(exc)[:200]}")
            continue
        if sorted(scols) != sorted(ocols):
            failures.append((name, f"schema: spark={scols} duckdb={ocols}"))
            print(f"FAIL  {name}: schema mismatch {scols} vs {ocols}")
            continue
        try:
            type_mismatch = [
                (c, stypes[c], otypes[c])
                for c in scols
                if type_parity(stypes[c], otypes[c]) is False
            ]
        except UnknownTypeError as exc:
            failures.append((name, f"unknown type in parity gate: {exc}"))
            print(f"FAIL  {name}: unknown type in parity gate: {exc}")
            continue
        if type_mismatch:
            failures.append((name, f"output types diverge: {type_mismatch}"))
            print(
                f"FAIL  {name}: output-type divergence "
                f"(spark vs duckdb): {type_mismatch}"
            )
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

    print(
        f"\nchecked={checked} skipped={skipped} failed={len(failures)}"
    )
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
