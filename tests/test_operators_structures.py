"""Structure-operator tests: altloc removal (4ibw), residue aggregation,
contacts, composite pipeline (2pah)."""

from pyspark.sql import functions as F

from proteofav_spark.operators.structures import (
    add_contacts,
    filter_structures,
    remove_multiple_altlocs,
    remove_partial_residues,
    residues_aggregation,
    select_structures,
)
from proteofav_spark.sources.structures import parse_mmcif_atoms


def test_remove_altlocs_4ibw(spark, refdata):
    df = parse_mmcif_atoms(spark, f"{refdata}/mmcif/4ibw.cif")
    n_before = df.count()
    out = remove_multiple_altlocs(df)
    n_after = out.count()
    assert n_after < n_before
    # all altlocs rewritten to '.'
    assert out.filter(F.col("label_alt_id") != ".").count() == 0
    # no duplicated (model, chain, seq, atom) among ATOM records
    dup = (
        out.filter(F.col("group_PDB") == "ATOM")
        .groupBy("pdbx_PDB_model_num", "label_asym_id", "label_seq_id",
                 "label_atom_id", "auth_seq_id")
        .count()
        .filter(F.col("count") > 1)
    )
    assert dup.count() == 0


def test_residues_aggregation_centroid(spark, refdata):
    df = parse_mmcif_atoms(spark, f"{refdata}/mmcif/2pah.cif")
    df = filter_structures(df, models="first", chains=("A",),
                           reset_atom_id_flag=True)
    agg = residues_aggregation(df, agg_method="centroid")
    # one row per residue
    n_res = df.select("auth_asym_id", "auth_seq_id").distinct().count()
    assert agg.count() == n_res
    # centroid of first residue = mean of its atom coords
    atoms = df.filter(F.col("auth_seq_id") == "118")
    expect = atoms.agg(F.avg("Cartn_x")).first()[0]
    got = agg.filter(F.col("auth_seq_id") == "118").first()["Cartn_x"]
    assert abs(got - expect) < 1e-9


def test_residues_aggregation_first(spark, refdata):
    df = parse_mmcif_atoms(spark, f"{refdata}/mmcif/2pah.cif")
    df = filter_structures(df, models="first", chains=("A",))
    agg = residues_aggregation(df, agg_method="first")
    first = agg.orderBy("id").first()
    # first atom of residue 118 is N
    assert first["auth_seq_id"] == "118"
    assert first["label_atom_id"] == "N"


def test_filter_structures_ca_chain_a(spark, refdata):
    df = select_structures(
        spark, f"{refdata}/mmcif/2pah.cif",
        models="first", chains=("A",), atoms=("CA",), lines=("ATOM",),
    )
    rows = df.orderBy("id").collect()
    assert all(r["label_atom_id"] == "CA" for r in rows)
    assert all(r["auth_asym_id"] == "A" for r in rows)
    # 2pah chain A has 329 observed CA atoms (ATOM records)
    assert len(rows) == 329
    # id reset happens BEFORE the atom filter (reference order), so the first
    # CA carries the post-reset serial of the chain's second atom
    assert rows[0]["id"] == 2
    assert rows[0]["auth_seq_id_full"] == "118"


def test_remove_partial_residues(spark, refdata):
    df = parse_mmcif_atoms(spark, f"{refdata}/mmcif/2pah.cif")
    df = filter_structures(df, models="first", remove_partial_res=False)
    out = remove_partial_residues(df)
    assert out.count() <= df.count()
    # every surviving ATOM residue has a complete heavy-atom set
    from proteofav_spark.library import AA_DEFAULT_ATOMS
    rows = out.filter(F.col("group_PDB") == "ATOM").collect()
    by_res = {}
    for r in rows:
        key = (r["auth_asym_id"], r["auth_seq_id"], r["auth_comp_id"])
        by_res.setdefault(key, set()).add(r["auth_atom_id"])
    incomplete = [
        k for k, atoms in by_res.items()
        if k[2] in AA_DEFAULT_ATOMS and set(AA_DEFAULT_ATOMS[k[2]]) - atoms
    ]
    # the reference's last-residue quirk allows at most the final residue
    # of the file to be incomplete
    assert len(incomplete) <= 2


def test_add_contacts_small(spark):
    rows = [
        ("f", 0, 1, 0.0, 0.0, 0.0),
        ("f", 1, 2, 3.0, 0.0, 0.0),
        ("f", 2, 3, 20.0, 0.0, 0.0),
    ]
    df = spark.createDataFrame(
        rows, ["source_file", "line_no", "id", "Cartn_x", "Cartn_y", "Cartn_z"]
    )
    out = add_contacts(df, dist=5.0).orderBy("line_no").collect()
    assert out[0]["contact_indexes"] == "0,1"
    assert out[1]["contact_indexes"] == "0,1"
    assert out[2]["contact_indexes"] == "2"


def test_residues_aggregation_multi_structure_no_cross_merge(spark, refdata):
    """On a multi-structure frame the rollup must key on source_file:
    the union of two parses aggregates to exactly the sum of the
    per-file aggregations, never merging residues across structures."""
    from proteofav_spark.sources.structures import parse_mmcif_atoms

    a = parse_mmcif_atoms(spark, f"{refdata}/mmcif/2w4o.cif")
    b = parse_mmcif_atoms(spark, f"{refdata}/mmcif/2pah.cif")
    multi = a.unionByName(b, allowMissingColumns=True)
    na = residues_aggregation(a).count()
    nb = residues_aggregation(b).count()
    both = residues_aggregation(multi)
    assert both.count() == na + nb
    per_file = {r["source_file"]: r["n"] for r in
                both.groupBy("source_file").agg(F.count("*").alias("n")).collect()}
    assert set(per_file) == {"2w4o.cif", "2pah.cif"} or len(per_file) == 2
    assert sorted(per_file.values()) == sorted([na, nb])


def test_remove_partial_residues_null_seq_starts_new_run(spark):
    """A NULL seq_id must start a new run at EVERY row (reference: NaN
    compares unequal to everything incl. itself, so `prev_seq ==
    curr_seq` is False on each NaN row — proteofav/structures.py:457-481
    fragments a NaN-seq residue into one-atom runs, each then dropped as
    atom-incomplete). Pre-r11 the NULL comparison yielded NULL, the
    running sum skipped the boundary, and the NULL-seq atoms silently
    merged into the PREVIOUS residue's run — surviving when the
    reference drops them, and corrupting the dup-seq block alternation
    for neighbouring complete runs."""
    from pyspark.sql.types import (
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType([
        StructField("source_file", StringType()),
        StructField("line_no", IntegerType()),
        StructField("group_PDB", StringType()),
        StructField("auth_comp_id", StringType()),
        StructField("auth_seq_id", StringType()),
        StructField("auth_atom_id", StringType()),
    ])
    bb = ["N", "CA", "C", "O"]
    rows, n = [], 0
    for seq in ["10", None, None, "11"]:
        for atom in bb:
            rows.append(("f", n, "ATOM", "GLY", seq, atom))
            n += 1
    df = spark.createDataFrame(rows, schema)
    out = remove_partial_residues(df)
    # reference trace: seq "10" run is complete and survives; each
    # NULL-seq atom is its own incomplete run and is dropped; seq "11"
    # is the file's final run (never validated) and survives
    assert out.count() == 8
    assert out.filter(F.col("auth_seq_id").isNull()).count() == 0
    kept = sorted(r["auth_seq_id"] for r in out.collect())
    assert kept == ["10"] * 4 + ["11"] * 4


def test_half_space_offsets_literal_matches_retired_hof_chain(spark):
    """r14 optimization pin: the constant-folded literal offset array
    (half_space_offsets_lit) must stay element-for-element identical —
    same structs, same order — to the retired per-row SQL HOF chain it
    replaced, so the grid-join candidate stream cannot drift."""
    from proteofav_spark.operators.structures import (
        HALF_SPACE_OFFSETS,
        half_space_offsets_lit,
    )

    retired = F.expr(
        "filter(flatten(transform(sequence(-1,1), dx -> "
        "flatten(transform(sequence(-1,1), dy -> "
        "transform(sequence(-1,1), dz -> struct(dx, dy, dz)))))), "
        "o -> o.dx > 0 or (o.dx = 0 and (o.dy > 0 or "
        "(o.dy = 0 and o.dz >= 0))))"
    )
    row = spark.range(1).select(
        retired.alias("old"), half_space_offsets_lit().alias("new")
    ).first()
    old = [(o["dx"], o["dy"], o["dz"]) for o in row["old"]]
    new = [(o["dx"], o["dy"], o["dz"]) for o in row["new"]]
    assert old == new == HALF_SPACE_OFFSETS
    # exactly one representative per unordered offset pair: the half
    # space contains (0,0,0) and exactly one of ±off for the other 13
    assert len(new) == 14
    assert (0, 0, 0) in new
    negs = {(-dx, -dy, -dz) for (dx, dy, dz) in new if (dx, dy, dz) != (0, 0, 0)}
    assert negs.isdisjoint(set(new))
