"""Pandas-interop seam (compat.py): round-trip fidelity on the
reference's own fixture, the collect guard, and pandas-on-Spark parity
with the Spark-side aggregation."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from proteofav_spark.compat import from_pandas, pandas_api, to_pandas
from proteofav_spark.sources.structures import parse_mmcif_atoms

MMCIF = "/root/reference/tests/testdata/mmcif/2pah.cif"


def test_to_pandas_round_trip_preserves_schema_and_values(spark):
    df = parse_mmcif_atoms(spark, MMCIF).select(
        "label_asym_id", "label_seq_id", "label_atom_id",
        "Cartn_x", "Cartn_y", "Cartn_z",
    )
    pdf = to_pandas(df)
    assert isinstance(pdf, pd.DataFrame)
    assert len(pdf) == df.count()
    back = from_pandas(spark, pdf)
    assert back.schema == df.schema
    # order-insensitive value equality via a sorted key compare
    key = ["label_asym_id", "label_seq_id", "label_atom_id", "Cartn_x"]
    a = sorted(map(tuple, pdf[key].itertuples(index=False)))
    b = sorted(map(tuple, to_pandas(back)[key].itertuples(index=False)))
    assert a == b


def test_to_pandas_refuses_unbounded_collect(spark):
    df = spark.range(100)
    with pytest.raises(ValueError, match="pandas_api"):
        to_pandas(df, max_rows=50)
    assert len(to_pandas(df, max_rows=100)) == 100


def test_pandas_api_groupby_matches_spark(spark):
    """The pandas-on-Spark view computes the same per-chain atom counts
    as the native Spark aggregation — same engine underneath, pandas
    syntax on top."""
    df = parse_mmcif_atoms(spark, MMCIF)
    psdf = pandas_api(df.select("label_asym_id"))
    got = psdf.groupby("label_asym_id").size().to_pandas().sort_index()
    want = {
        r["label_asym_id"]: r["n"]
        for r in df.groupBy("label_asym_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got.to_dict() == want


def test_from_pandas_joins_against_engine_tables(spark):
    """A notebook-built pandas annotation table lifts into the engine and
    broadcast-joins against a parsed structure table."""
    ann = pd.DataFrame(
        {"label_asym_id": ["A"], "note": ["active-site chain"]}
    )
    df = parse_mmcif_atoms(spark, MMCIF)
    joined = df.join(F.broadcast(from_pandas(spark, ann)), "label_asym_id")
    assert joined.count() == df.filter(F.col("label_asym_id") == "A").count()
    assert "note" in joined.columns
