"""Atom-table operators: altloc/partial-residue removal (window-based),
atom→residue aggregation, spatial contacts, and the composite
``filter_structures`` pipeline.

The reference implements the first two as sequential Python row loops
(proteofav/structures.py:399-480); here they are window/groupBy plans over
the ``line_no`` file-order column, partitioned by ``source_file`` so every
structure processes independently — the shape that scales to millions of
files.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from proteofav_spark.core import (
    EmptyTableError,
    assert_unique,
    exclude_columns,
    row_selector,
)
from proteofav_spark.functions.derived import add_atom_altloc, add_res_full
from proteofav_spark.library import (
    AA_DEFAULT_ATOMS,
    BACKBONE_ATOMS,
    array_map_literal,
)

UNIFIED_KEY = ["pdbx_PDB_model_num", "auth_asym_id", "auth_seq_id", "id"]


def _order_cols(df: DataFrame) -> list[str]:
    return ["source_file", "line_no"] if "source_file" in df.columns else ["line_no"]


def _file_w(df: DataFrame):
    if "source_file" in df.columns:
        return W.partitionBy("source_file").orderBy("line_no")
    return W.orderBy("line_no")


def remove_multiple_altlocs(df: DataFrame) -> DataFrame:
    """Keep only the first of each run of consecutive altloc rows for the
    same atom, rewriting the kept altloc to '.'.

    Reference (proteofav/structures.py:399-427) scans forward row by row;
    the equivalent single-pass rule: drop row *i* iff its altloc != '.' AND
    the previous row (file order) has the same ``label_atom_id`` with a
    non-'.' altloc. All surviving non-'.' altlocs become '.'.
    """
    w = _file_w(df)
    alt = F.col("label_alt_id")
    prev_alt = F.lag("label_alt_id").over(w)
    prev_atom = F.lag("label_atom_id").over(w)
    dropped = (
        (alt != ".")
        & prev_alt.isNotNull()
        & (prev_alt != ".")
        & (prev_atom == F.col("label_atom_id"))
    )
    out = df.withColumn("_drop", dropped).filter(~F.col("_drop")).drop("_drop")
    return out.withColumn(
        "label_alt_id", F.when(alt != ".", F.lit(".")).otherwise(alt)
    )


def remove_partial_residues(df: DataFrame, category: str = "auth") -> DataFrame:
    """Drop ATOM residues missing any canonical heavy atom, and residues
    repeating the previous residue's seq_id.

    Reference loop: proteofav/structures.py:430-480. Spark shape: detect
    consecutive-run boundaries with ``lag`` → run ids via running sum → one
    groupBy computing each run's atom set → run-level verdicts → anti-join.
    Reference quirk reproduced: the file's *last* residue run is never
    dropped (the loop ends before validating it).
    """
    comp, seq, atom = f"{category}_comp_id", f"{category}_seq_id", f"{category}_atom_id"
    part = (F.col("group_PDB") == "ATOM") & F.col(comp).isin(*AA_DEFAULT_ATOMS.keys())
    df = df.withColumn("_part", part)

    w = _file_w(df)
    part_w = (
        W.partitionBy(*(["source_file"] if "source_file" in df.columns else []), "_part")
        .orderBy("line_no")
    )
    # NULL-safe run boundary: each comparison coalesces to True when a
    # side is NULL (first row, or a NULL comp/seq) — the reference's NaN
    # compares unequal to everything, so a NULL always starts a new run.
    new_run = (
        F.coalesce(F.lag(comp).over(part_w) != F.col(comp), F.lit(True))
        | F.coalesce(F.lag(seq).over(part_w) != F.col(seq), F.lit(True))
    ).cast("int")
    df = df.withColumn("_new_run", F.when(F.col("_part"), new_run).otherwise(F.lit(0)))
    df = df.withColumn(
        "_run",
        F.when(
            F.col("_part"),
            F.sum("_new_run").over(part_w.rowsBetween(W.unboundedPreceding, 0)),
        ),
    ).drop("_new_run")

    group_keys = ["source_file", "_run"] if "source_file" in df.columns else ["_run"]
    runs = (
        df.filter(F.col("_part"))
        .groupBy(*group_keys)
        .agg(
            F.first(comp).alias("_comp"),
            F.first(seq).alias("_seq"),
            F.collect_set(F.col(atom)).alias("_atoms"),
            F.min("line_no").alias("_start"),
        )
    )
    defaults = array_map_literal(AA_DEFAULT_ATOMS)
    file_keys = ["source_file"] if "source_file" in df.columns else []
    run_w = (
        W.partitionBy(*file_keys).orderBy("_start")
        if file_keys
        else W.orderBy("_start")
    )
    last_run = F.max("_run").over(
        W.partitionBy(*(file_keys if file_keys else [F.lit(1)]))
    )
    runs = runs.withColumn(
        "_missing", F.size(F.array_except(defaults[F.col("_comp")], F.col("_atoms"))) > 0
    ).withColumn("_last", F.col("_run") == last_run)
    # The reference's dup-seq rule is STATEFUL (next_res_for_rm,
    # proteofav/structures.py:457-473): a run repeating the previous
    # run's seq_id is dropped only if the previous run SURVIVED — a
    # dropped-for-missing-atoms run does not condemn its successor, and
    # in a chain of equal-seq runs the drops alternate. As a recurrence
    # over consecutive equal-seq runs ("blocks"):
    #   drop(i) = missing(i) OR (NOT drop(i-1) AND seq(i-1) == seq(i))
    # whose closed form inside a block (1-based index, virtual drop(0)
    # = True at the block head, where the flag is always clear):
    #   drop(i) = missing(i) OR ((i - j) even), j = last missing index
    #   before i in the block, else 0.
    # Three window passes, no sequential scan.
    # NULL-safe block boundary: if either side of the comparison is NULL
    # (first row, or a NULL _seq — the reference's NaN compares unequal
    # to everything, structures.py:457-473) the comparison yields NULL
    # and must START a block, not silently merge into the previous one.
    new_blk = F.coalesce(
        F.lag("_seq").over(run_w) != F.col("_seq"), F.lit(True)
    ).cast("int")
    runs = runs.withColumn(
        "_blk", F.sum(new_blk).over(run_w.rowsBetween(W.unboundedPreceding, 0))
    )
    blk_w = W.partitionBy(*file_keys, "_blk").orderBy("_start")
    runs = runs.withColumn("_idx", F.row_number().over(blk_w))
    jstar = F.coalesce(
        F.max(F.when(F.col("_missing"), F.col("_idx"))).over(
            blk_w.rowsBetween(W.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    runs = runs.withColumn(
        "_dropped", F.col("_missing") | (((F.col("_idx") - jstar) % 2) == 0)
    )
    bad_runs = runs.filter(F.col("_dropped") & ~F.col("_last")).select(*group_keys)

    out = df.join(F.broadcast(bad_runs), on=group_keys, how="left_anti")
    return out.drop("_part", "_run")


def residues_aggregation(
    df: DataFrame, agg_method: str = "centroid", category: str = "auth"
) -> DataFrame:
    """Atom→residue rollup.

    Parity: proteofav/structures.py:483-512. Methods: ``centroid``/``mean``
    (mean of numeric columns), ``backbone_centroid`` (pre-filter CA,N,C,O
    then centroid), ``first`` (first value in file order — ``min_by`` over
    ``line_no``, deterministic without a sort), ``unique`` (collect_set).
    Output re-sorted by atom ``id`` like the reference — but the re-sort
    is scoped: when the frame carries ``source_file`` (a multi-structure
    lake read) the sort runs WITHIN repartition-by-structure partitions,
    so composing this into lake-scale jobs never inherits a global
    range-exchange sort; the single-structure path keeps the global
    ``orderBy`` the reference API promises (one file's residues — a
    driver-bounded frame).
    """
    if agg_method not in ("centroid", "first", "unique", "mean", "backbone_centroid"):
        raise ValueError(f"Method {agg_method} is not currently implemented...")
    keys = ["pdbx_PDB_model_num", f"{category}_asym_id", f"{category}_seq_id"]
    # multi-structure lake frames: (model, chain, seq) repeats across
    # files, so the structure id must be part of the rollup key or two
    # unrelated proteins' atoms would average into one residue
    if "source_file" in df.columns:
        keys = ["source_file"] + keys
    if agg_method == "backbone_centroid":
        df = row_selector(
            df, f"{category}_atom_id", BACKBONE_ATOMS, check_empty=False
        )
        agg_method = "centroid"
    # pandas groupby(dropna=True): rows whose (model, chain, seq) key has
    # a NaN component are silently DROPPED by the reference — conform
    # (r12 hypothesis differential; DIVERGENCES C13)
    df = df.na.drop(subset=[k for k in keys if k != "source_file"])
    numeric_kinds = ("double", "float", "bigint", "int", "smallint", "tinyint")
    order = F.col("line_no") if "line_no" in df.columns else F.col("id")

    def first_nonnull(c: str) -> Column:
        # pandas GroupBy.first = first NON-NULL per column in row order
        # (NOT the value of the first row — r12 hypothesis differential).
        # min over a struct keyed by the order column skips NULL cells
        # (the whole struct is NULL) and needs no sort.
        return F.min(
            F.when(
                F.col(c).isNotNull(),
                F.struct(order.alias("_o"), F.col(c).alias("_v")),
            )
        )["_v"].alias(c)

    aggs: list[Column] = []
    for c, t in df.dtypes:
        if c in keys:
            continue
        if c == "id":
            # reference: columns_to_agg['id'] = 'first' for EVERY method
            aggs.append(first_nonnull(c))
        elif c == "line_no" or c == "source_file":
            aggs.append(F.min(c).alias(c))
        elif agg_method in ("centroid", "mean") and t in numeric_kinds:
            aggs.append(F.avg(c).alias(c))
        elif agg_method == "unique":
            aggs.append(F.array_sort(F.collect_set(c)).cast("string").alias(c))
        else:
            aggs.append(first_nonnull(c))
    agged = df.groupBy(*keys).agg(*aggs)
    if "source_file" in df.columns:
        return agged.repartition("source_file").sortWithinPartitions(
            "source_file", "id"
        )
    return agged.orderBy("id")


# the 14 neighbor-cell offsets with (dx,dy,dz) lexicographically
# ≥ (0,0,0) — the half-space that generates every unordered cell pair
# exactly once (cell(a) − cell(b) = off has a unique solution and only
# one of ±off is in the half-space). Enumerated in the same dx-outer /
# dy-middle / dz-inner order the retired SQL HOF chain produced.
HALF_SPACE_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
    if dx > 0 or (dx == 0 and (dy > 0 or (dy == 0 and dz >= 0)))
]


def half_space_offsets_lit() -> Column:
    """:data:`HALF_SPACE_OFFSETS` as one literal
    ``array<struct<dx:int,dy:int,dz:int>>``. The former
    ``filter(flatten(transform(sequence(...))))`` SQL expression built
    and filtered the 27-struct array PER PROBE ROW — higher-order
    functions are not constant-folded by Catalyst, so every row paid
    the interpreted allocation chain (guide §1.2 per-task work). A
    literal array of literal structs folds to a single cached value;
    the explode then just iterates it."""
    return F.array(
        *[
            F.struct(
                F.lit(dx).alias("dx"),
                F.lit(dy).alias("dy"),
                F.lit(dz).alias("dz"),
            )
            for dx, dy, dz in HALF_SPACE_OFFSETS
        ]
    )


def add_contacts(df: DataFrame, dist: float = 5.0) -> DataFrame:
    """Spatial self-join: for every atom, the 0-based row positions of all
    atoms within ``dist`` Å (self included), as a ','-joined string column
    ``contact_indexes``.

    Parity: proteofav/structures.py:366-396 (cKDTree). Spark-first strategy:
    bucket atoms into a ⌈coord/dist⌉³ grid, explode each atom to its 27
    neighbor cells on the probe side, equi-join on the cell key, filter
    dist² ≤ r² — a distributed distance join with no N² blow-up, co-located
    per structure via the ``source_file`` key at scale.
    """
    part_keys = ["source_file"] if "source_file" in df.columns else []
    w = _file_w(df)
    base = df.withColumn("_pos", F.row_number().over(w) - 1)
    cell = [
        F.floor(F.col(c) / F.lit(dist)).alias(f"_c{y}")
        for c, y in (("Cartn_x", "x"), ("Cartn_y", "y"), ("Cartn_z", "z"))
    ]
    left = base.select(
        *part_keys, "_pos",
        F.col("Cartn_x").alias("_lx"), F.col("Cartn_y").alias("_ly"),
        F.col("Cartn_z").alias("_lz"), *cell,
    )
    # half-neighborhood fan-out (r13 optimization, guide §2.3/§3.3 — same
    # rewrite as spatial_contacts_grid): the probe explodes to the 14
    # offsets with (dx,dy,dz) lexicographically ≥ (0,0,0) instead of all
    # 27, so every unordered in-radius pair is generated exactly once
    # (same-cell pairs halved by _pos ≤ _rpos; ≤ keeps the self-contact
    # this operator includes) and then symmetrized inline through one
    # Generate. The doubled (a,a) row a self-pair produces is absorbed by
    # the collect_set. Half the probe-side join input and half the
    # distance evaluations; output row-identical.
    offsets = half_space_offsets_lit()
    probe = (
        base.select(
            *part_keys,
            F.col("_pos").alias("_rpos"),
            F.col("Cartn_x").alias("_rx"), F.col("Cartn_y").alias("_ry"),
            F.col("Cartn_z").alias("_rz"), *cell,
        )
        .withColumn("_off", F.explode(offsets))
        .select(
            *part_keys, "_rpos", "_rx", "_ry", "_rz",
            ((F.col("_off.dx") == 0) & (F.col("_off.dy") == 0)
             & (F.col("_off.dz") == 0)).alias("_same"),
            (F.col("_cx") + F.col("_off.dx")).alias("_cx"),
            (F.col("_cy") + F.col("_off.dy")).alias("_cy"),
            (F.col("_cz") + F.col("_off.dz")).alias("_cz"),
        )
    )
    join_keys = part_keys + ["_cx", "_cy", "_cz"]
    d2 = (
        (F.col("_lx") - F.col("_rx")) ** 2
        + (F.col("_ly") - F.col("_ry")) ** 2
        + (F.col("_lz") - F.col("_rz")) ** 2
    )
    pairs = (
        left.join(probe, on=join_keys)
        .filter(
            (~F.col("_same") | (F.col("_pos") <= F.col("_rpos")))
            & (d2 <= F.lit(dist * dist))
        )
        .select(
            *part_keys,
            F.explode(
                F.array(
                    F.struct(
                        F.col("_pos").alias("a"), F.col("_rpos").alias("b")
                    ),
                    F.struct(
                        F.col("_rpos").alias("a"), F.col("_pos").alias("b")
                    ),
                )
            ).alias("_p"),
        )
        .select(
            *part_keys,
            F.col("_p.a").alias("_pos"),
            F.col("_p.b").alias("_rpos"),
        )
        .groupBy(*part_keys, "_pos")
        .agg(
            F.concat_ws(
                ",", F.transform(F.array_sort(F.collect_set("_rpos")), lambda x: x.cast("string"))
            ).alias("contact_indexes")
        )
    )
    out = base.join(pairs, on=part_keys + ["_pos"], how="left").drop("_pos")
    return out


def reset_atom_id(df: DataFrame) -> DataFrame:
    """Renumber ``id`` 1..n in file order (parity:
    proteofav/structures.py:860-864)."""
    return df.withColumn("id", F.row_number().over(_file_w(df)))


def filter_structures(
    table: DataFrame,
    excluded_cols: tuple[str, ...] | None = None,
    models="first",
    chains=None,
    res=None,
    res_full=None,
    comps=None,
    atoms=None,
    lines=None,
    category: str = "auth",
    residue_agg: bool = False,
    agg_method: str = "centroid",
    add_res_full_col: bool = True,
    add_atom_altloc_col: bool = False,
    add_contacts_col: bool = False,
    dist: float = 5.0,
    reset_atom_id_flag: bool = True,
    remove_altloc: bool = False,
    remove_hydrogens: bool = True,
    remove_partial_res: bool = False,
    check_empty: bool = True,
) -> DataFrame:
    """Composite atom-table pipeline, same option surface and operation
    order as the reference (proteofav/structures.py:777-894)."""
    table = exclude_columns(table, excluded_cols)
    if models:
        table = row_selector(table, "pdbx_PDB_model_num", models, check_empty=False)
    if chains:
        table = row_selector(table, f"{category}_asym_id", chains, check_empty=False)
    if lines:
        table = row_selector(table, "group_PDB", lines, check_empty=False)
    if add_res_full_col:
        table = add_res_full(table)
    if add_atom_altloc_col:
        table = add_atom_altloc(table)
    if add_contacts_col:
        table = add_contacts(table, dist=dist)
    if remove_hydrogens:
        table = row_selector(table, "type_symbol", "H", reverse=True, check_empty=False)
    if remove_altloc:
        table = remove_multiple_altlocs(table)
        reset_atom_id_flag = True
    if remove_partial_res:
        table = remove_partial_residues(table, category=category)
    if reset_atom_id_flag:
        table = reset_atom_id(table)
    if res:
        table = row_selector(table, f"{category}_seq_id", res, check_empty=False)
    if res_full:
        table = row_selector(table, f"{category}_seq_id_full", res_full, check_empty=False)
    if comps:
        table = row_selector(table, f"{category}_comp_id", comps, check_empty=False)
    if atoms in ("centroid", "backbone_centroid"):
        table = residues_aggregation(table, agg_method=atoms, category=category)
    elif atoms:
        table = row_selector(table, f"{category}_atom_id", atoms, check_empty=False)
    if residue_agg:
        table = residues_aggregation(table, agg_method=agg_method, category=category)
    if check_empty and table.isEmpty():
        raise EmptyTableError("The filters resulted in an empty DataFrame...")
    return table


def select_structures(
    spark,
    filename: str,
    excluded_cols: tuple[str, ...] | None = None,
    check_unique: bool = True,
    **filter_kwargs,
) -> DataFrame:
    """read (format dispatch by extension) → parse → filter → key check.
    Parity: select_structures / read_structures
    proteofav/structures.py:739-774, :897-931."""
    from proteofav_spark.sources.structures import parse_mmcif_atoms, parse_pdb_atoms

    low = filename.lower()
    if low.endswith((".pdb", ".ent")):
        table = parse_pdb_atoms(spark, filename, excluded_cols=excluded_cols)
    else:
        table = parse_mmcif_atoms(spark, filename, excluded_cols=excluded_cols)
    table = filter_structures(table, **filter_kwargs)
    if check_unique:
        assert_unique(table, UNIFIED_KEY, label="structures")
    return table
