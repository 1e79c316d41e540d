"""End-to-end curation pipeline (plans/pipeline): stage semantics + determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from block_crawler_spark.plans.pipeline import (
    QUALITY_MIN_PPM,
    curated_doc_ids,
    curation_pipeline_query,
)
from block_crawler_spark.plans.text_ops import (
    decontaminate_query,
    quality_ppm,
    stratified_sample_query,
)
from block_crawler_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_survivors_satisfy_every_stage(spark):
    surv = {r["doc_id"] for r in curated_doc_ids(spark, SF).collect()}
    all_ids = {r["doc_id"] for r in load_table(spark, SF, "documents").select("doc_id").collect()}
    assert surv and surv < all_ids, "pipeline must keep some and drop some"
    good = {
        r["doc_id"]
        for r in quality_ppm(spark, SF).filter(F.col("quality_ppm") >= QUALITY_MIN_PPM).collect()
    }
    clean = {
        r["doc_id"] for r in decontaminate_query(spark, SF).filter(~F.col("contaminated")).collect()
    }
    sampled = {r["doc_id"] for r in stratified_sample_query(spark, SF).collect()}
    assert surv <= good and surv <= clean and surv <= sampled
    # benchmark stand-in docs (doc_id % 97 == 0) never survive
    assert not any(d % 97 == 0 for d in surv)


def test_manifest_is_deterministic_and_covers_survivors(spark):
    m1 = {(r["shard"], r["bin_id"]): r["doc_digest"] for r in curation_pipeline_query(spark, SF).collect()}
    m2 = {(r["shard"], r["bin_id"]): r["doc_digest"] for r in curation_pipeline_query(spark, SF).collect()}
    assert m1 == m2, "same input -> same manifest, digest included"
    n_docs = sum(r["n_docs"] for r in curation_pipeline_query(spark, SF).collect())
    assert n_docs == curated_doc_ids(spark, SF).count()
