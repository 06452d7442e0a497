"""Pandas interop for reference-library users.

The reference (proteofav, /root/reference/proteofav/structures.py etc.)
hands every table to the user as a pandas DataFrame; its users' notebooks
are written against the pandas API. This module is the migration seam:

- :func:`pandas_api` — zero-copy* view of any engine table through the
  pandas-on-Spark API (``pyspark.pandas``), so existing pandas-style
  code (``.groupby``, ``.loc``, column assignment) keeps running while
  execution stays distributed. (*the data never leaves the JVM; only the
  API surface changes.)
- :func:`to_pandas` — materialize a DRIVER-SIDE pandas DataFrame, the
  literal type the reference returns. Guarded by a row cap because this
  is the one call that collects: per-structure tables (10³-10⁵ atoms —
  the reference's working set) are fine, a 100 TB lake table is not.
- :func:`from_pandas` — lift a user's pandas table (edited annotations,
  a notebook-built variant list) into the engine for distributed joins
  against lake tables.

Round-trip fidelity (schema + values) is pinned by tests/test_compat.py
on the reference's own 2w4o fixture.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

DEFAULT_COLLECT_CAP = 5_000_000


def pandas_api(df: DataFrame):
    """View a Spark table through the pandas-on-Spark API: pandas syntax,
    distributed execution. The default index keeps Spark's partition
    order without forcing a global sort (``distributed`` index — no
    sequential index shuffle)."""
    import pyspark.pandas as ps

    with ps.option_context("compute.default_index_type", "distributed"):
        return df.pandas_api()


def to_pandas(df: DataFrame, max_rows: int = DEFAULT_COLLECT_CAP) -> pd.DataFrame:
    """Materialize as driver-side pandas — the reference's native return
    type — for per-structure tables and query tails. Raises instead of
    silently collecting an unbounded lake table: callers that really
    want a huge collect must raise ``max_rows`` explicitly, making the
    driver-memory decision visible at the call site. The plan executes
    ONCE: collect ``limit(n+1)`` directly (Arrow-backed —
    spark.sql.execution.arrow.pyspark.enabled is on in session.py) and
    raise if the sentinel n+1-th row came back — no separate count probe,
    so expensive plans aren't run twice and nondeterministic plans can't
    pass the probe yet overflow the collect (or vice versa)."""
    pdf = df.limit(max_rows + 1).toPandas()
    if len(pdf) > max_rows:
        raise ValueError(
            f"to_pandas would collect more than {max_rows} rows; raise "
            "max_rows explicitly, or stay distributed via pandas_api(df)"
        )
    return pdf


def from_pandas(spark: SparkSession, pdf: pd.DataFrame) -> DataFrame:
    """Lift a pandas table into the engine (Arrow-batched createDataFrame;
    schema inferred from dtypes). The result is a normal distributed
    DataFrame — broadcastable against lake tables, usable in every
    operator in this package."""
    return spark.createDataFrame(pdf)
