"""DSSP reader golden tests (fixtures: reference tests/testdata/dssp)."""

import pytest
from pyspark.sql import functions as F

from proteofav_spark.core import EmptyTableError
from proteofav_spark.sources.dssp import (
    add_dssp_full_chain,
    check_dssp_key_uniqueness,
    filter_dssp,
    parse_dssp_residues,
    select_dssp,
)


def test_parse_dssp_2pah(spark, refdata):
    df = parse_dssp_residues(spark, f"{refdata}/dssp/2pah.dssp")
    rows = df.orderBy("line_no").collect()
    # 651 residues + 3 chain-break rows (4 chains in the file header)
    first = rows[0]
    assert first["RES"] == "118"
    assert first["CHAIN"] == "A"
    assert first["AA"] == "V"
    assert first["ACC"] == 127
    breaks = [r for r in rows if r["AA"] in ("!", "!*")]
    assert len(rows) - len(breaks) == 651


def test_filter_dssp_chain_a(spark, refdata):
    df = parse_dssp_residues(spark, f"{refdata}/dssp/2pah.dssp")
    out = filter_dssp(df, chains=("A",), add_rsa=True, add_rsa_class=True,
                      add_ss_reduced=True)
    rows = out.orderBy("line_no").collect()
    assert all(r["CHAIN"] == "A" for r in rows)
    assert all(r["AA"] not in ("!", "!*") for r in rows)
    first = rows[0]
    # RSA for VAL (Sander 142.0): 127/142*100 = 89.437
    assert abs(first["RSA"] - 89.437) < 1e-6
    assert first["RSA_CLASS"] == "Surface"
    assert first["SS_CLASS"] in ("H", "E", "C", "-")


def test_dssp_full_chain_biounit(spark, refdata):
    df = parse_dssp_residues(spark, f"{refdata}/dssp/2pah_bio.dssp")
    out = add_dssp_full_chain(df)
    chains_full = {r["CHAIN_FULL"] for r in out.collect() if r["AA"] not in ("!", "!*")}
    # BioUnit: two copies of A and B → suffixed duplicates appear
    assert any(len(c) > 1 for c in chains_full)


def test_filter_dssp_empty_raises(spark, refdata):
    df = parse_dssp_residues(spark, f"{refdata}/dssp/2pah.dssp")
    with pytest.raises(EmptyTableError):
        filter_dssp(df, chains=("Z",))


def test_dssp_key_uniqueness(spark, refdata):
    df = select_dssp(spark, f"{refdata}/dssp/2pah.dssp", chains=("A",))
    assert check_dssp_key_uniqueness(df)
