"""applyInPandasWithState: cross-batch per-key state == batch aggregation."""

from __future__ import annotations

from pyspark.sql import functions as F

from block_crawler_spark.sources.tables import load_table
from block_crawler_spark.streaming.stateful import running_user_stats
from block_crawler_spark.streaming.windows import read_events_stream

SF = "/root/testdata/sf0.001"


def test_running_stats_match_batch(spark, tmp_path):
    events = load_table(spark, SF, "events")
    src = str(tmp_path / "chunks")
    events.repartition(4).write.parquet(src)

    stream = read_events_stream(spark, src)
    q = (
        running_user_stats(stream)
        .writeStream.format("memory")
        .queryName("user_stats")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # update mode emits one row per key per batch that touched it — keep the
    # final state per user (highest last_event_id)
    final = (
        spark.sql("select * from user_stats")
        .groupBy("user_id")
        .agg(
            F.max_by("n_events", "last_event_id").alias("n_events"),
            F.max_by("total_cents", "last_event_id").alias("total_cents"),
        )
    )
    got = {r["user_id"]: (r["n_events"], r["total_cents"]) for r in final.collect()}

    exp_df = events.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.sum(F.expr("CAST(round(value * 100) AS BIGINT)")).alias("cents"),
    )
    exp = {r["user_id"]: (r["n"], r["cents"]) for r in exp_df.collect()}
    assert got == exp and len(got) > 5
