"""Nested flattener (SURVEY §2.10) incl. surrogate-key determinism fix."""

from pyspark.sql import functions as F

from datapipelines_essentials_python_spark.operators.flatten import (
    flatten_columns,
    flatten_nested,
)

NESTED_JSON = [
    """{"nct_id": "N1", "rank": 1,
        "sponsors": {"lead": {"agency": "A", "cls": "gov"},
                     "collaborator": [{"agency": "B"}, {"agency": "C"}]},
        "keyword": ["k1", "k2"],
        "props": {"alpha": 1, "beta": 2}}""",
    """{"nct_id": "N2", "rank": 2,
        "sponsors": {"lead": {"agency": "D", "cls": "ind"}, "collaborator": []},
        "keyword": [],
        "props": {}}""",
]


def _nested_df(spark):
    return spark.read.json(spark.sparkContext.parallelize(NESTED_JSON))


def test_flatten_structure(spark):
    df = _nested_df(spark)
    res = flatten_nested(df, "study", cascade_keys={"nct_id": "pk_nct_id"})
    assert set(res.tables) >= {
        "study",
        "study_sponsors",
        "study_sponsors_lead",
        "study_sponsors_collaborator",
        "study_keyword",
        "study_props",
    }
    collab = res.tables["study_sponsors_collaborator"]
    rows = {(r["pk_nct_id"], r["agency"]) for r in collab.collect()}
    assert rows == {("N1", "B"), ("N1", "C")}  # N2's empty array → no rows
    # cascaded natural key reaches every level
    for tbl in res.tables.values():
        assert "pk_nct_id" in tbl.columns
    kw = res.tables["study_keyword"]
    assert {(r["pk_nct_id"], r["array_index"], r["keyword"]) for r in kw.collect()} == {
        ("N1", 0, "k1"),
        ("N1", 1, "k2"),
    }


def test_map_type_flattened(spark):
    df = _nested_df(spark).select(
        "nct_id",
        F.create_map(F.lit("a"), F.col("rank"), F.lit("b"), F.col("rank") * 2).alias("m"),
    )
    res = flatten_nested(df, "root", cascade_keys={"nct_id": "pk_nct_id"})
    m = res.tables["root_m"]
    got = {(r["pk_nct_id"], r["map_key"], r["map_value"]) for r in m.collect()}
    assert got == {("N1", "a", 1), ("N1", "b", 2), ("N2", "a", 2), ("N2", "b", 4)}


def test_surrogate_ids_deterministic_across_recompute(spark):
    df = _nested_df(spark)
    ids1 = {
        r["pk_nct_id"]: r["surrogate_id_study"]
        for r in flatten_nested(df, "study", {"nct_id": "pk_nct_id"}).tables["study"].collect()
    }
    ids2 = {
        r["pk_nct_id"]: r["surrogate_id_study"]
        for r in flatten_nested(df, "study", {"nct_id": "pk_nct_id"}).tables["study"].collect()
    }
    assert ids1 == ids2  # the reference's monotonically_increasing_id is NOT


def test_parent_child_join_lines_up(spark):
    df = _nested_df(spark)
    res = flatten_nested(df, "study", {"nct_id": "pk_nct_id"})
    root = res.tables["study"]
    sponsors = res.tables["study_sponsors"]
    lead = res.tables["study_sponsors_lead"]
    # each level links to its immediate parent via that parent's surrogate id
    joined = (
        lead.select("surrogate_id_study_sponsors", "agency")
        .join(sponsors.select("surrogate_id_study_sponsors", "surrogate_id_study"),
              "surrogate_id_study_sponsors")
        .join(root.select("surrogate_id_study", F.col("pk_nct_id").alias("root_key")),
              "surrogate_id_study")
    )
    assert {(r["root_key"], r["agency"]) for r in joined.collect()} == {
        ("N1", "A"),
        ("N2", "D"),
    }


def test_xpaths_recorded(spark):
    res = flatten_nested(_nested_df(spark), "study", {"nct_id": "pk_nct_id"})
    assert any(p.startswith("/sponsors/lead/") for p in res.xpaths["study_sponsors_lead"])


def test_flatten_columns_width_wise(spark):
    df = _nested_df(spark)
    flat = flatten_columns(df.select("nct_id", "sponsors"))
    assert "sponsors_lead_agency" in flat.columns
