"""End-to-end curation pipeline (plans/pipeline): stage semantics + determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from block_crawler_spark.plans.pipeline import (
    curated_doc_ids,
    curation_pipeline_query,
)
from block_crawler_spark.plans.text_ops import (
    decontaminate_query,
    quality_budget_cut_query,
    quality_ppm,
    stratified_sample_query,
)
from block_crawler_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_survivors_satisfy_every_stage(spark):
    surv = {r["doc_id"] for r in curated_doc_ids(spark, SF).collect()}
    all_ids = {r["doc_id"] for r in load_table(spark, SF, "documents").select("doc_id").collect()}
    assert surv and surv < all_ids, "pipeline must keep some and drop some"
    # the default quality stage is the DATA-DRIVEN budget cut (round 8)
    cut = quality_budget_cut_query(spark, SF).collect()[0]["cut_ppm"]
    good = {
        r["doc_id"]
        for r in quality_ppm(spark, SF).filter(F.col("quality_ppm") >= cut).collect()
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


def test_budget_cut_feeds_the_quality_stage(spark):
    """quality_min=None (the default) must apply EXACTLY the measured
    cut_ppm from doc_quality_budget_cut: the survivor set equals the one an
    explicit quality_min at that value produces, and a deliberately looser
    explicit floor keeps strictly more — proving the broadcast cut row
    actually gates the filter rather than some constant."""
    cut = quality_budget_cut_query(spark, SF).collect()[0]["cut_ppm"]
    budget_surv = {r["doc_id"] for r in curated_doc_ids(spark, SF).collect()}
    explicit_surv = {r["doc_id"] for r in curated_doc_ids(spark, SF, quality_min=cut).collect()}
    assert budget_surv == explicit_surv
    loose_surv = {r["doc_id"] for r in curated_doc_ids(spark, SF, quality_min=0).collect()}
    assert budget_surv < loose_surv, "the measured cut must actually drop something"


def test_pipeline_contamination_certifies_zero_and_matches_raw_report(spark):
    """The composed eval-side report (round 11): final columns must be the
    ZERO certificate (the pipeline's any-overlap decon stage leaves no
    surviving doc sharing a shingle with any bench item), the raw columns
    must be NON-trivial (the corpus really is contaminated before the
    cut), and the raw columns must equal the standalone
    doc_contamination_by_bench report row-for-row — one definition of
    'contaminating', computed through two plans."""
    from block_crawler_spark.plans.pipeline import pipeline_contamination_query
    from block_crawler_spark.plans.text_ops import contamination_by_bench_query

    rows = {r["bench_id"]: r for r in pipeline_contamination_query(spark, SF).collect()}
    assert rows, "bench items must be reported even when clean"
    assert all(r["n_contam_final"] == 0 and r["n_shingles_final"] == 0 for r in rows.values())
    assert any(r["n_contam_raw"] > 0 for r in rows.values())
    standalone = {r["bench_id"]: r for r in contamination_by_bench_query(spark, SF).collect()}
    assert set(rows) == set(standalone)
    for bid, r in rows.items():
        assert r["n_contam_raw"] == standalone[bid]["n_contaminating_docs"]
        assert r["n_shingles_raw"] == standalone[bid]["n_shared_shingles"]
