"""The oracle checker's type-parity gate must hard-fail NESTED type
divergence, not just scalar divergence: the driver's value hash is
Arrow-type-aware, so a DuckDB HUGEINT buried inside a STRUCT or LIST
diverges exactly like a top-level one. Round 5 reported the gate
returning None (reported-not-failed) for struct/map columns; these
tests pin the hardened behavior."""

import importlib.util
import os

_spec = importlib.util.spec_from_file_location(
    "check_oracles",
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools",
        "check_oracles.py",
    ),
)
check_oracles = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(check_oracles)
type_parity = check_oracles.type_parity


def test_scalar_parity_unchanged():
    assert type_parity("bigint", "BIGINT") is True
    assert type_parity("bigint", "HUGEINT") is False
    assert type_parity("double", "FLOAT") is False
    assert type_parity("array<double>", "DOUBLE[]") is True
    assert type_parity("array<double>", "FLOAT[]") is False


def test_struct_matches_field_by_field():
    assert (
        type_parity("struct<a:bigint,b:string>", "STRUCT(a BIGINT, b VARCHAR)")
        is True
    )
    # quoted DuckDB field names
    assert (
        type_parity("struct<a:bigint>", 'STRUCT("a" BIGINT)') is True
    )


def test_struct_hugeint_inside_fails():
    assert (
        type_parity("struct<a:bigint,b:string>", "STRUCT(a HUGEINT, b VARCHAR)")
        is False
    )


def test_struct_field_name_or_arity_mismatch_fails():
    assert type_parity("struct<a:bigint>", "STRUCT(b BIGINT)") is False
    assert (
        type_parity("struct<a:bigint>", "STRUCT(a BIGINT, b BIGINT)") is False
    )
    assert type_parity("struct<a:bigint>", "BIGINT") is False


def test_map_and_deep_nesting():
    assert type_parity("map<string,bigint>", "MAP(VARCHAR, BIGINT)") is True
    assert type_parity("map<string,bigint>", "MAP(VARCHAR, HUGEINT)") is False
    assert (
        type_parity(
            "array<struct<k:string,v:array<double>>>",
            "STRUCT(k VARCHAR, v DOUBLE[])[]",
        )
        is True
    )
    assert (
        type_parity(
            "array<struct<k:string,v:array<double>>>",
            "STRUCT(k VARCHAR, v FLOAT[])[]",
        )
        is False
    )


def test_mistyped_nested_oracle_fails_the_sweep(spark, tmp_path):
    """End-to-end: a query whose oracle emits HUGEINT inside a STRUCT
    must FAIL the checker's type gate (this was reported-not-failed
    before the hardening). Exercises the exact comparison the sweep
    runs: Spark simpleString vs DuckDB result type string."""
    import duckdb

    sdf = spark.sql(
        "SELECT named_struct('a', CAST(1 AS BIGINT)) AS s"
    )
    stype = dict((f.name, f.dataType.simpleString()) for f in sdf.schema)["s"]
    rel = duckdb.sql("SELECT {'a': 1::HUGEINT} AS s")
    dtype = str(dict(zip(rel.columns, rel.types))["s"])
    assert type_parity(stype, dtype) is False
    rel_ok = duckdb.sql("SELECT {'a': 1::BIGINT} AS s")
    dtype_ok = str(dict(zip(rel_ok.columns, rel_ok.types))["s"])
    assert type_parity(stype, dtype_ok) is True


def test_struct_quoted_field_name_with_space():
    # a quoted DuckDB field name may contain spaces — must parse the
    # full quoted token, not split at the first space
    assert type_parity('struct<a b:bigint>', 'STRUCT("a b" BIGINT)') is True
    assert type_parity('struct<a b:bigint>', 'STRUCT("a b" HUGEINT)') is False
    assert type_parity('struct<a c:bigint>', 'STRUCT("a b" BIGINT)') is False


def test_struct_quoted_field_name_with_escaped_quote():
    # DuckDB doubles a literal quote inside a quoted identifier: a field
    # named a"b renders as "a""b" TYPE. The parser must skip the escape
    # when finding the closing quote and unescape before comparing.
    assert type_parity('struct<a"b:bigint>', 'STRUCT("a""b" BIGINT)') is True
    assert type_parity('struct<a"b:bigint>', 'STRUCT("a""b" HUGEINT)') is False
    assert type_parity('struct<a"c:bigint>', 'STRUCT("a""b" BIGINT)') is False
    # end-to-end against a real DuckDB result type string
    import duckdb

    rel = duckdb.sql('SELECT {\'a"b\': 1::BIGINT} AS s')
    dtype = str(dict(zip(rel.columns, rel.types))["s"])
    assert type_parity('struct<a"b:bigint>', dtype) is True


def test_unknown_scalar_type_raises():
    """An unmapped scalar type must RAISE (recorded as FAIL by the
    sweep), never skip the gate: a DECIMAL-width drift or BINARY/
    INTERVAL oracle column diverges in the driver's Arrow hash exactly
    like HUGEINT does (VERDICT r6 'What's wrong' #2)."""
    import duckdb
    import pytest

    with pytest.raises(check_oracles.UnknownTypeError):
        type_parity("interval", "INTERVAL")
    # a deliberately-mistyped oracle: DuckDB emits HUGEINT for SUM(int);
    # an unmapped spark-side type must fail just as loudly nested
    with pytest.raises(check_oracles.UnknownTypeError):
        type_parity("struct<a:interval>", "STRUCT(a INTERVAL)")
    # real DuckDB DECIMAL drift still hard-fails via the decimal branch
    rel = duckdb.sql("SELECT 1.5::DECIMAL(12,2) AS d")
    dtype = str(dict(zip(rel.columns, rel.types))["d"])
    assert type_parity("decimal(12,2)", dtype) is True
    assert type_parity("decimal(18,2)", dtype) is False
