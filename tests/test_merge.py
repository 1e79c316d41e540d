"""Version-guarded merge semantics (reference K1-K8 conditional writes)."""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from block_crawler_spark.operators.merge import (
    additive_upsert,
    idempotent_append,
    latest_by_version,
    metadata_url_upsert,
    versioned_upsert,
)


def _df(spark, rows, cols):
    return spark.createDataFrame(rows, cols)


def test_versioned_upsert_new_wins_and_old_ignored(spark):
    existing = _df(spark, [("k1", "old", 5), ("k2", "keep", 9)], ["k", "v", "data_version"])
    updates = _df(spark, [("k1", "new", 7), ("k2", "stale", 3), ("k3", "ins", 1)], ["k", "v", "data_version"])
    got = {r["k"]: (r["v"], r["data_version"]) for r in versioned_upsert(existing, updates, ["k"]).collect()}
    assert got == {"k1": ("new", 7), "k2": ("keep", 9), "k3": ("ins", 1)}


def test_versioned_upsert_tie_goes_to_update(spark):
    existing = _df(spark, [("k1", "old", 5)], ["k", "v", "data_version"])
    updates = _df(spark, [("k1", "new", 5)], ["k", "v", "data_version"])
    got = versioned_upsert(existing, updates, ["k"]).collect()
    assert got[0]["v"] == "new"


def test_metadata_url_upsert_secondary_version(spark):
    cols = ["k", "metadata_url", "data_version", "metadata_url_version_hex"]
    existing = _df(spark, [("k1", "a", 5, "0005"), ("k2", "b", 5, "0009")], cols)
    updates = _df(
        spark,
        [("k1", "a2", 5, "0007"),   # same dv, newer uri version → wins
         ("k2", "b2", 5, "0001")],  # same dv, older uri version → loses
        cols,
    )
    got = {r["k"]: r["metadata_url"] for r in metadata_url_upsert(existing, updates, ["k"]).collect()}
    assert got == {"k1": "a2", "k2": "b"}


def test_additive_same_version_adds_newer_sets(spark):
    cols = ["k", "quantity", "data_version"]
    d = Decimal
    existing = _df(spark, [("k1", d(10), 5), ("k2", d(10), 5), ("k3", d(4), 5)], cols)
    updates = _df(
        spark,
        [("k1", d(3), 5),    # same version → ADD → 13
         ("k1", d(2), 5),    # second delta same version → 15
         ("k2", d(99), 6),   # newer version → SET → 99
         ("k3", d(1), 4),    # older version → ignored
         ("k4", d(7), 5)],   # new key → insert
        cols,
    )
    got = {r["k"]: (r["quantity"], r["data_version"]) for r in additive_upsert(existing, updates, ["k"]).collect()}
    assert got == {"k1": (d(15), 5), "k2": (d(99), 6), "k3": (d(4), 5), "k4": (d(7), 5)}


def test_additive_zero_delete_and_null_poison(spark):
    cols = ["k", "quantity", "data_version"]
    d = Decimal
    existing = _df(spark, [("k1", d(5), 5)], cols)
    updates_rows = [("k1", d(-5), 5), ("k2", None, 5)]
    updates = spark.createDataFrame(updates_rows, existing.schema)
    got = {r["k"]: r["quantity"] for r in additive_upsert(existing, updates, ["k"], drop_zero=True).collect()}
    # k1 nets to zero → dropped (K8); k2 overflow-null survives as NULL
    assert got == {"k2": None}


def test_idempotent_append(spark):
    existing = _df(spark, [("k1", "a")], ["k", "v"])
    updates = _df(spark, [("k1", "DIFFERENT"), ("k2", "b"), ("k2", "b")], ["k", "v"])
    got = {r["k"]: r["v"] for r in idempotent_append(existing, updates, ["k"]).collect()}
    assert got == {"k1": "a", "k2": "b"}


def test_latest_by_version(spark):
    df = _df(spark, [("k1", "v1", 1), ("k1", "v3", 3), ("k1", "v2", 2)], ["k", "v", "ver"])
    got = latest_by_version(df, ["k"], ["ver"]).collect()
    assert len(got) == 1 and got[0]["v"] == "v3"
