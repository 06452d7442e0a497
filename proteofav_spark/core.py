"""Generic relational operators shared by every source pipeline.

Parity targets (see SURVEY.md §2.3/§2.5):
- row_selector             proteofav/utils.py:97-133
- exclude_columns          proteofav/utils.py:203-220
- constrain_column_types   proteofav/utils.py:136-200 (try-cast semantics)
- splitting_up_by_key      proteofav/utils.py:223-247 (explode)
- merging_down_by_key      proteofav/utils.py:250-307 (groupBy collect_set;
                           the reference's O(n²) loop becomes one shuffle)
- drop_empty_cols          proteofav/mergers.py:385-399 (single agg pass)

All ops are lazy plan builders except where the reference semantics force an
action (empty-result guard, 'first'-value selection, single-value detection).
Those actions are cheap aggregate probes, kept explicit and minimal.
"""

from __future__ import annotations

from collections.abc import Iterable, Mapping

from pyspark.sql import Column, DataFrame, functions as F

ORDER_COL = "line_no"


class EmptyTableError(ValueError):
    """Raised when a selection produces no rows (reference convention:
    every filter raises on empty — proteofav/utils.py:129-131)."""


def row_selector(
    df: DataFrame,
    key: str,
    value,
    reverse: bool = False,
    order_col: str = ORDER_COL,
    check_empty: bool = True,
) -> DataFrame:
    """Generic predicate filter.

    ``value`` may be a scalar (equality), list/tuple/set (isin) or the
    sentinel ``'first'`` = keep rows equal to the column's first value in
    file order. ``reverse`` negates — with the reference's exact pandas
    semantics (proteofav/utils.py:97-133, pinned by the r11 hypothesis
    differential): NULL rows are dropped by ``==``/``isin`` but KEPT by
    the reverse forms (pandas ``!=``/``~isin`` are True for NaN), and
    the ``'first'`` branch ignores ``reverse`` entirely (its pandas
    branch never reads the flag). Raises :class:`EmptyTableError` when
    the result is empty and ``check_empty`` (facade pipelines disable
    the guard and check once at the end, so lazy plans stay lazy).
    """
    if value == "first":
        order = F.col(order_col) if order_col in df.columns else F.monotonically_increasing_id()
        first_val = df.orderBy(order).select(key).first()
        if first_val is None:
            raise EmptyTableError(f"'{key}': table is empty")
        pred: Column = F.col(key) == F.lit(first_val[0])
        reverse = False  # reference quirk: 'first' never reverses
    elif isinstance(value, (list, tuple, set, frozenset)):
        # empty collection → no rows (the reference's isin([]) semantic);
        # Spark's isin() with zero arguments raises instead (review r9)
        vals = list(value)
        pred = F.col(key).isin(*vals) if vals else F.lit(False)
    else:
        pred = F.col(key) == F.lit(value)
    if reverse:
        # NULL-safe negation: ~(NULL == v) is NULL and would drop the
        # row; pandas keeps NaN under != / ~isin
        pred = ~F.coalesce(pred, F.lit(False))
    out = df.filter(pred)
    if check_empty and out.isEmpty():
        raise EmptyTableError(f"filter on {key!r} with {value!r} produced no rows")
    return out


def exclude_columns(df: DataFrame, excluded: Iterable[str] | None) -> DataFrame:
    """Drop listed columns — ALL-OR-NOTHING like the reference: when ANY
    listed name is missing, the ENTIRE drop is a no-op
    (proteofav/utils.py:203-220 — `table.drop(list(excluded))` under an
    except-ValueError that old pandas raised for missing labels; pandas≥2
    raises KeyError, so the reference as-run today would crash — this
    restores its intended/contemporary behavior, same class as the
    parse_qs and regex restorations in DIVERGENCES.md; pinned by the r12
    hypothesis differential)."""
    if not excluded:
        return df
    names = list(excluded)
    if not set(names) <= set(df.columns):
        return df
    return df.drop(*names)


def constrain_column_types(
    df: DataFrame,
    dtypes: Mapping[str, str],
    nan_value_dict: Mapping[str, object] | None = None,
    replace_value_dict: Mapping[str, tuple[object, object]] | None = None,
) -> DataFrame:
    """Cast columns to declared types with silent-fallback semantics.

    Reference semantics (proteofav/utils.py:184-199, pinned live by the
    r12 hypothesis differential):

    - ``astype`` is ALL-OR-NOTHING per column: one uncastable cell keeps
      the whole column as-is. Integer targets additionally fail whenever
      the column holds ANY NaN (pandas int64 cannot hold NaN — the
      docstring's "NaNs and Upcasting" note), so a nullable column under
      an int constraint always stays un-cast. One probe aggregate over
      ALL constrained columns decides per-column cast-vs-keep in a
      single pass (the one eager job this op costs; constrain calls sit
      once per parsed table, never in a per-row hot path).
    - Order per column: cast, THEN fillna, THEN replace — the replace
      compares against post-cast, post-fill values.
    - Deliberate divergences (DIVERGENCES.md): a ``string`` constraint
      leaves NULLs NULL (pandas astype(str) stamps the literal
      ``'None'``/``'nan'``), and fills/replacements must be
      type-coherent with the column (a pandas object column tolerates
      mixed int-among-strings cells; a Spark column cannot).
    """
    out = df
    present = [(c, t) for c, t in dtypes.items() if c in out.columns]
    if not present and not nan_value_dict and not replace_value_dict:
        return out

    def _is_int(t: str) -> bool:
        return t.lower() in ("bigint", "int", "integer", "long",
                             "smallint", "tinyint", "short", "byte")

    def _never_fails(t: str) -> bool:
        return t.lower() in ("string", "varchar")

    probes = []
    for c, t in present:
        if _never_fails(t):
            continue
        raw, cast = F.col(c), F.col(c).try_cast(t)
        bad = raw.isNotNull() & cast.isNull()
        if _is_int(t):
            bad = bad | raw.isNull()
        probes.append(F.max(bad.cast("int")).alias(c))
    failed: set[str] = set()
    if probes:
        row = out.agg(*probes).first()
        failed = {c for c in row.asDict() if row[c] == 1}

    for col_name, t in present:
        if col_name not in failed:
            out = out.withColumn(col_name, F.col(col_name).try_cast(t))
    # fills/replacements walk EVERY table column, independent of dtypes
    # membership — the reference's for-col loop (utils.py:184-199)
    # applies fillna/replace to any column named in the dicts whether or
    # not col_type_dict constrains it (ADVICE r12 low: the old loop only
    # visited constrained columns and returned early without them)
    if nan_value_dict or replace_value_dict:
        col_types = dict(out.dtypes)
        for col_name in out.columns:
            col_type = col_types[col_name]
            if nan_value_dict and col_name in nan_value_dict:
                fill = F.lit(nan_value_dict[col_name]).try_cast(col_type)
                out = out.withColumn(
                    col_name,
                    F.when(F.col(col_name).isNull(), fill)
                    .otherwise(F.col(col_name)),
                )
            if replace_value_dict and col_name in replace_value_dict:
                old, new = replace_value_dict[col_name]
                out = out.withColumn(
                    col_name,
                    F.when(
                        F.col(col_name) == F.lit(old),
                        F.lit(new).try_cast(col_type),
                    ).otherwise(F.col(col_name)),
                )
    return out


def splitting_up_by_key(df: DataFrame, key: str = "xrefs_id") -> DataFrame:
    """Explode rows whose ``key`` cell is an array into one row per value.

    Parity: proteofav/utils.py:223-247. Scalars (non-array key column) pass
    through unchanged. A NULL cell survives as one NULL-key row (the
    reference's scalar branch keeps NaN), but an EMPTY list drops the
    row entirely — the reference's list branch iterates `for v in []`
    and appends nothing (r11, found by the hypothesis differential:
    explode_outer alone kept a NULL-key row the reference never emits).
    """
    field = dict(df.dtypes).get(key, "")
    if not field.startswith("array"):
        return df
    return df.filter(
        F.col(key).isNull() | (F.size(key) > 0)
    ).withColumn(key, F.explode_outer(key))


def merging_down_by_key(df: DataFrame, key: str = "xrefs_id") -> DataFrame:
    """Collapse rows sharing ``key``: per non-key column gather distinct
    non-null values → element if one, array if many, null if none.

    The reference does this with an O(n²) pandas loop
    (proteofav/utils.py:267-269); here it is a single hash aggregation with
    map-side partial aggregation — one shuffle on ``key`` regardless of scale.
    Multi-valued cells stay ``ArrayType`` (Spark-native; the reference used
    Python tuples).
    """
    others = [c for c in df.columns if c != key]
    # ARRAY-typed cells: a SINGLE-row key group passes its cell VERBATIM
    # (duplicates intact — the reference merges only `len(dup) > 1`
    # groups), while a multi-row group merges by FLATTENING: the
    # reference's collapse loop iterates `for g in v` over tuple/list
    # cells and dedups through `tuple(set(...))`, so a merged cell holds
    # the distinct union of the rows' ELEMENTS, never nested lists (r12
    # flattener fuzz — collect_set over an array column nested them, and
    # an unconditional dedup rewrote verbatim single-row cells)
    dtypes = dict(df.dtypes)
    _n = "__mdbk_rows"
    arr_others = [c for c in others if dtypes[c].startswith("array")]
    aggs = [
        (
            F.collect_list(c).alias(c)
            if dtypes[c].startswith("array")
            else F.array_sort(F.collect_set(c)).alias(c)
        )
        for c in others
    ] + [F.count(F.lit(1)).alias(_n)]
    # NULL-key rows never merge — the reference's dup probe is
    # `table[key] == pid`, and NaN == NaN is False, so every NaN-key row
    # survives separately (r11, found by the hypothesis differential:
    # a plain groupBy silently collapsed ALL null-key rows into one).
    # They pass through unmerged, each cell wrapped as its 0/1-element
    # value set (array cells pass verbatim) to align with the collapsed
    # schema.
    collapsed = df.filter(F.col(key).isNotNull()).groupBy(key).agg(*aggs)
    collapsed = collapsed.select(
        key,
        *[
            (
                F.when(
                    F.col(_n) == 1, F.try_element_at(F.col(c), F.lit(1))
                )
                .otherwise(
                    F.array_sort(
                        F.array_distinct(
                            F.array_compact(F.flatten(F.col(c)))
                        )
                    )
                )
                .alias(c)
                if c in arr_others
                else F.col(c)
            )
            for c in others
        ],
    )
    passthrough = df.filter(F.col(key).isNull()).select(
        key,
        *[
            (
                # NULL array cells pass through as NULL — the reference
                # keeps NaN verbatim, and the collapsed branch's
                # try_element_at over an empty collect_list agrees
                # (ADVICE r12 low: the old coalesce-to-empty-array made
                # the two paths disagree with each other and with the
                # reference)
                F.col(c).alias(c)
                if dtypes[c].startswith("array")
                else F.array_compact(F.array(F.col(c))).alias(c)
            )
            for c in others
        ],
    )
    collapsed = collapsed.unionByName(passthrough)
    # A Spark column has one type, so the reference's mixed scalar/tuple cells
    # become: unwrap a column to its element type when no group is
    # multi-valued, else keep the whole column as an array. One probe pass.
    sizes = collapsed.agg(*[F.max(F.size(c)).alias(c) for c in others]).first()
    final_cols: list[Column] = [F.col(key)]
    for c in others:
        if sizes[c] is not None and sizes[c] <= 1:
            final_cols.append(F.try_element_at(F.col(c), F.lit(1)).alias(c))
        else:
            final_cols.append(F.col(c).alias(c))
    return collapsed.select(*final_cols)


def merging_down_by_key_arrays(df: DataFrame, key: str = "xrefs_id") -> DataFrame:
    """Spark-native variant of :func:`merging_down_by_key` keeping every
    collapsed column as ``array<...>`` (no mixed scalar/tuple cells)."""
    others = [c for c in df.columns if c != key]
    aggs = [F.array_sort(F.collect_set(c)).alias(c) for c in others]
    return df.groupBy(key).agg(*aggs)


def drop_empty_cols(df: DataFrame) -> tuple[DataFrame, dict[str, object]]:
    """Drop every column with EXACTLY one non-null distinct value (unless
    that value is ``'?'`` — the mmCIF missing marker); return the dropped
    single values as attributes.

    Parity: proteofav/mergers.py:385-399 — `dropna().unique()` of length
    1, with the `'?'` keep rule; all-NaN columns STAY in the table (the
    reference's `shape[0] == 1` is False for them). The r11 hypothesis
    differential caught the old ≤1 rule dropping all-NULL columns the
    reference keeps, and the missing '?' rule. One aggregate pass
    computes all countDistinct + first values; no per-column scans.
    """
    aggs = []
    for c in df.columns:
        aggs.append(F.countDistinct(F.col(c)).alias(f"n::{c}"))
        aggs.append(F.first(F.col(c), ignorenulls=True).alias(f"v::{c}"))
    row = df.agg(*aggs).first()
    attrs: dict[str, object] = {}
    keep: list[str] = []
    for c in df.columns:
        if row[f"n::{c}"] == 1 and row[f"v::{c}"] != "?":
            attrs[c] = row[f"v::{c}"]
        else:
            keep.append(c)
    return df.select(*keep), attrs


def with_line_no(df: DataFrame, existing: str | None = None) -> DataFrame:
    """Attach the monotone file-order column every order-dependent operator
    needs (SURVEY.md §2.6). When reading a single text file in order, a
    window-free zipWithIndex equivalent is used."""
    if existing and existing in df.columns:
        return df.withColumn(ORDER_COL, F.col(existing).cast("bigint"))
    return df.withColumn(ORDER_COL, F.monotonically_increasing_id())


def assert_unique(df: DataFrame, keys: list[str], label: str = "table") -> None:
    """Duplicate-key guard (parity: proteofav/structures.py:770-772,
    proteofav/dssp.py:337-338). One aggregation probe."""
    dup = df.groupBy(*keys).count().filter(F.col("count") > 1).limit(1).count()
    if dup:
        raise ValueError(f"{label}: duplicate rows for key {keys}")
