"""Streaming-ingest scaling probe: per-batch cost vs admitted-corpus size.

The batch-query probe (scripts/scaling_probe.py) covers the registry; this
one measures the INGEST path of the streaming corpus store: a fixed-size
micro-batch admitted against a seen set grown 1×/10×/100×.  The engine's
claim is that per-batch work is bounded by the BATCH, not the corpus —
the exact-dedup fp probe prunes to the batch's fp buckets (round 7) and
the near-dup band probe prunes to the batch's band buckets (round 8) — so
the per-batch wall should stay near-flat while the admitted corpus grows
100×.  The probe also times the round-7 residual this round removed: the
band-candidate join fed by a FULL-index band derivation vs the pruned
band-index read, on the same store.

Documents are derived rows (distinct md5-worded texts keyed by doc_id), so
the probe measures machinery — index layout, pruning, join shapes — not
text-content luck.  Usage:

    PYTHONPATH=/root/repo python scripts/corpus_ingest_probe.py [--sizes 1000,10000,100000]
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from block_crawler_spark.operators.dedup import band_buckets, band_pairs, minhash_signatures  # noqa: E402
from block_crawler_spark.session import get_spark  # noqa: E402
from block_crawler_spark.streaming.corpus import CorpusIngestStore  # noqa: E402

BATCH_ROWS = 200  # fixed probe batch: half fresh, half dupes of admitted docs


def _docs(spark, start: int, n: int, dup_of: int | None = None):
    """n rows (doc_id = start..start+n-1) with deterministic distinct texts;
    ``dup_of`` re-keys the text generator so those rows EXACTLY duplicate
    the seed rows' texts (dup detection does real work in the probe)."""
    base = F.col("id") if dup_of is None else (F.col("id") - start + dup_of)
    word = lambda j: F.concat(  # noqa: E731
        F.lit("w"), F.substring(F.md5(F.concat(base.cast("string"), F.lit(f"|{j}"))), 1, 6)
    )
    text = F.concat_ws(" ", *[word(j) for j in range(12)])
    return (
        spark.range(start, start + n)
        .select(
            F.col("id").alias("doc_id"),
            text.alias("text"),
            F.lit("en").alias("lang"),
            F.lit("probe").alias("source"),
            F.length(text).alias("n_chars"),
        )
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1000,10000,100000")
    args = ap.parse_args()
    sizes = [int(s) for s in args.sizes.split(",")]

    spark = get_spark("corpus-ingest-probe")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {"batch_rows": BATCH_ROWS, "sizes": {}}
    work = tempfile.mkdtemp(prefix="corpus-probe-")
    try:
        for n in sizes:
            root = f"{work}/corpus-{n}"
            store = CorpusIngestStore(spark, root, near_dup=True)
            store.ingest_batch(_docs(spark, 0, n), 0)

            # fixed-size probe batch: half fresh ids/texts, half exact dupes
            half = BATCH_ROWS // 2
            batch = _docs(spark, n, half).unionByName(_docs(spark, n + half, half, dup_of=0))
            t0 = time.monotonic()
            store.ingest_batch(batch, 1)
            ingest_s = time.monotonic() - t0

            # residual comparison on the SAME store: band-candidate count via
            # the pruned band index (round 8) vs a full-index band derivation
            # (the round-7 shape this round removed)
            sigs = minhash_signatures(
                _docs(spark, 2 * n + 10, half).select("doc_id", "text"), materialize=False
            )
            probe_bands = band_buckets(sigs.select("doc_id", "sig"))
            bb = sorted(
                r["b"]
                for r in probe_bands.select(store._bbucket_expr().alias("b")).distinct().collect()
            )
            t0 = time.monotonic()
            band_pairs(store.band_index(buckets=bb), probe_bands).count()
            pruned_s = time.monotonic() - t0
            t0 = time.monotonic()
            band_pairs(
                band_buckets(store.index().select("doc_id", "sig")), probe_bands
            ).count()
            full_s = time.monotonic() - t0

            out["sizes"][str(n)] = {
                "ingest_batch_s": round(ingest_s, 3),
                "band_probe_pruned_s": round(pruned_s, 3),
                "band_probe_fullscan_s": round(full_s, 3),
            }
    finally:
        shutil.rmtree(work, ignore_errors=True)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
