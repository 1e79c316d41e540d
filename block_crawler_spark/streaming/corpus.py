"""Streaming corpus ingestion with cross-batch online deduplication.

The batch dedup operators (``operators.dedup``) answer "is this corpus
internally duplicate-free"; a live training-data pipeline needs the streaming
form: documents arrive continuously, and a document whose fingerprint was
EVER seen before must not enter the corpus — across micro-batches, across
restarts.  ``dropDuplicatesWithinWatermark`` cannot express this (its state
is watermark-bounded by design; corpus membership never expires), so the
operator is a ``foreachBatch`` merge against a durable fingerprint set, the
same pattern the chain tail uses for silver merges (``streaming/tail.py``).

Storage layout (append-only, replay-idempotent):

    root/docs/batch-<id>/...parquet   one directory per committed micro-batch

Each corpus row carries its text fingerprint, so the "seen" set IS the corpus
projection ``select fp`` — one table, no second store to keep consistent.
Idempotence: ``foreachBatch`` hands Spark's monotonic ``batch_id`` to the
sink; a replayed batch (restart between sink write and checkpoint commit)
finds its ``batch-<id>`` directory already committed and skips — the
classic idempotent-foreachBatch contract (exactly-once corpus content).

Scale shape at 100 TB: the per-batch work is (tiny batch) × (huge seen set)
— a left-anti equi-join on ``fp``, which Spark executes as a shuffle join
keyed by the fingerprint; the corpus side prunes to the single ``fp``
column at scan time (column pruning — no text bytes move).  Two levers keep
it bounded as the corpus grows: compact ``docs/batch-*`` into larger files
periodically (any parquet compactor works — directories are immutable after
commit), and persist the fp projection bucketed by ``fp`` so the anti-join
co-locates without a shuffle of the corpus side.  Both are out-of-band
maintenance; the ingest path never rewrites committed data.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..functions.text import fingerprint

DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@dataclass
class CorpusIngestStore:
    spark: SparkSession
    root: str

    def _docs_root(self) -> str:
        return os.path.join(self.root, "docs")

    def _committed_batches(self) -> list[str]:
        base = self._docs_root()
        try:
            return sorted(
                d for d in os.listdir(base)
                if d.startswith("batch-") and os.path.exists(os.path.join(base, d, "_SUCCESS"))
            )
        except OSError:
            return []

    def corpus(self) -> DataFrame:
        batches = self._committed_batches()
        if not batches:
            return self.spark.createDataFrame([], DOC_SCHEMA + ", fp string")
        return self.spark.read.parquet(*[os.path.join(self._docs_root(), b) for b in batches])

    def seen_fingerprints(self) -> DataFrame:
        """The dedup state: every fingerprint ever admitted.  A column-pruned
        scan of the corpus — parquet reads only the ``fp`` column."""
        return self.corpus().select("fp")

    def ingest_batch(self, batch: DataFrame, batch_id: int) -> None:
        """Admit a micro-batch: fingerprint → within-batch keep-lowest-id →
        anti-join against every previously admitted fingerprint → commit as
        an immutable ``batch-<id>`` directory.  Re-invocation with an
        already-committed id is a no-op (replay after crash)."""
        out = os.path.join(self._docs_root(), f"batch-{batch_id}")
        if os.path.exists(os.path.join(out, "_SUCCESS")):
            return
        fresh = batch.withColumn("fp", fingerprint(F.col("text")))
        firsts = fresh.groupBy("fp").agg(F.min("doc_id").alias("doc_id"))
        fresh = fresh.join(firsts, ["fp", "doc_id"], "semi")
        fresh = fresh.join(self.seen_fingerprints(), "fp", "anti")
        fresh.select(*[f.split()[0] for f in DOC_SCHEMA.split(",")], "fp").write.mode(
            "overwrite"
        ).parquet(out)

    def start_stream(self, source_dir: str, checkpoint_dir: str, available_now: bool = True) -> StreamingQuery:
        """Tail a document drop-directory into the deduplicated corpus."""
        stream = self.spark.readStream.schema(DOC_SCHEMA).parquet(source_dir)
        writer = stream.writeStream.foreachBatch(self.ingest_batch).option(
            "checkpointLocation", checkpoint_dir
        )
        if available_now:
            writer = writer.trigger(availableNow=True)
        return writer.start()
