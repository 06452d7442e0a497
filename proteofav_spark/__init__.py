"""proteofav_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of bartongroup/ProteoFAV.

This is NOT a port of the reference (a single-process pandas library); it is a
ground-up Spark engine: every "table" is a Spark DataFrame with an explicit
StructType, every transformation is a lazy Catalyst plan, and all
order-dependent reference semantics (SURVEY.md §2.6) are reproduced with
window functions over an explicit ``line_no`` column emitted by every reader.

Layout
------
- ``session``     SparkSession factory tuned for local[32] testing and a
                  1000-executor cluster profile.
- ``library``     constant lookup tables (amino-acid maps, max-ASA, canonical
                  atom sets) as plain dicts turned into broadcastable
                  ``create_map`` literals / small DataFrames.
- ``core``        generic relational ops (row_selector, exclude_columns,
                  constrain_column_types, merging_down/splitting_up, ...).
- ``sources``     readers: mmCIF, PDB, DSSP, SIFTS XML, validation XML,
                  UniProt GFF, variants JSON, MSA.
- ``operators``   filters, aggregations, window-shaped ops, spatial contacts,
                  dedup / similarity / text-analysis extensions.
- ``plans``       the merge tree (table_merger) and the Tables facade.
- ``sinks``       mmCIF / PDB / csv / json / parquet writers.
- ``streaming``   Structured Streaming over the events table.
"""

__version__ = "0.1.0"

from proteofav_spark.session import get_spark  # noqa: F401
