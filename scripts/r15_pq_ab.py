"""r15 A/B probe: PQ-family ADC shapes (VERDICT r14 task 1).

Compares, on the exact registry query shapes (emb_pq_topk layout: M=16,
K=64, sub_dim=4, Q=8, top-5), the r14 packed-codebook HOF projection
against candidate per-row-work reductions:

  v0  HEAD: map-based LUT + HOF aggregate ADC + struct array_min encode
  v1  positional-array LUT + UNROLLED flat ADC sum (no HOF in ADC)
  v2  v1 + unrolled int_sqdist encode (no slice/zip_with/aggregate per
      codeword; array_position argmin instead of struct array_min)
  v3  v2 + numpy mapInArrow encode (guide §4.2) — codes computed batch-wise
      in int64 numpy, byte-identical fixed-point arithmetic

Every variant is asserted ROW-IDENTICAL to v0 before it is timed.
Usage: python scripts/r15_pq_ab.py [--runs 3]
"""

from __future__ import annotations

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from block_crawler_spark.operators.ann import int_sqdist, micro_fixed
from block_crawler_spark.operators.pq import _packed_cb, pq_codebook
from block_crawler_spark.session import get_spark
from block_crawler_spark.sources.tables import load_table

M, K, SUB, TOPK = 16, 64, 4, 5
QIDS = 8


# --- r14 shapes, inlined verbatim so the A/B stays reproducible after the
# --- library moved to the v2 forms (operators/pq.py now IS v2) --------------


def codes_r14(vec: Column, sub_dim: int) -> Column:
    """r14 encode: array_min over per-codeword (d, code) structs with
    int_sqdist's zip_with+aggregate fold inside a dynamic transform."""
    return F.transform(
        F.col("_cb"),
        lambda e: F.array_min(
            F.transform(
                e["cw"],
                lambda c: F.struct(
                    int_sqdist(F.slice(vec, e["m"] * sub_dim + 1, sub_dim), c["cvec"]).alias(
                        "d"
                    ),
                    c["code"].alias("code"),
                ),
            )
        )["code"],
    )


def luts_r14(vec: Column, sub_dim: int) -> Column:
    """r14 LUT: array over m of map(code -> int64 sqdist)."""
    return F.transform(
        F.col("_cb"),
        lambda e: F.map_from_entries(
            F.transform(
                e["cw"],
                lambda c: F.struct(
                    c["code"],
                    int_sqdist(F.slice(vec, e["m"] * sub_dim + 1, sub_dim), c["cvec"]),
                ),
            )
        ),
    )


def adc_r14(codes: Column, luts: Column, m: int) -> Column:
    """r14 ADC: interpreted aggregate HOF, O(K) map scan per term."""
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.element_at(F.element_at(luts, i + 1), F.element_at(codes, i + 1)),
    )


# --- candidate column builders ---------------------------------------------


def codes_unrolled(mv: Column, m: int, sub_dim: int) -> Column:
    """v2 encode: per-m argmin with unrolled squared-L2 terms; ties to the
    lowest code via array_position's first-occurrence over the code-sorted
    cw list (identical tie rule to array_min over (d, code) structs)."""
    def make_dist(mi: int):
        # single-arg lambda: a second parameter (even defaulted) makes
        # F.transform pass the array INDEX into it
        def dist(c):
            s = None
            for j in range(sub_dim):
                d = F.element_at(mv, mi * sub_dim + j + 1) - F.element_at(c["cvec"], j + 1)
                sq = d * d
                s = sq if s is None else s + sq
            return s

        return dist

    cols = []
    for mi in range(m):
        cw = F.element_at(F.col("_cb"), mi + 1)["cw"]
        dists = F.transform(cw, make_dist(mi))
        pos = F.array_position(dists, F.array_min(dists)).cast("int")
        cols.append(F.element_at(cw, pos)["code"])
    return F.array(*cols)


def luts_maps(mv: Column, sub_dim: int) -> Column:
    """Step 1 of the positional LUT: array over m of (max_code, code->dist map)."""
    return F.transform(
        F.col("_cb"),
        lambda e: F.struct(
            F.element_at(e["cw"], F.size(e["cw"]))["code"].alias("maxc"),
            F.map_from_entries(
                F.transform(
                    e["cw"],
                    lambda c: F.struct(
                        c["code"],
                        int_sqdist(F.slice(mv, e["m"] * sub_dim + 1, sub_dim), c["cvec"]),
                    ),
                )
            ).alias("mp"),
        ),
    )


def luts_positional(lm: Column) -> Column:
    """Step 2: array over m of positional dist array (index = code + 1;
    dropped codewords leave nulls that no emitted code ever touches)."""
    return F.transform(
        lm,
        lambda e: F.transform(
            F.sequence(F.lit(0).cast("long"), e["maxc"]), lambda i: F.element_at(e["mp"], i)
        ),
    )


def adc_unrolled(codes: Column, luts: Column, m: int) -> Column:
    s = None
    for mi in range(m):
        term = F.element_at(
            F.element_at(luts, mi + 1), (F.element_at(codes, mi + 1) + 1).cast("int")
        )
        s = term if s is None else s + term
    return s


def numpy_codes(emb: DataFrame, cb_rows, m: int, sub_dim: int) -> DataFrame:
    """v3 encode: batch numpy argmin (int64-exact, same tie rule)."""
    import numpy as np

    # cb_rows: list of (m, code, cvec) — build per-subspace (codes, cmat)
    by_m: dict[int, list[tuple[int, list[int]]]] = {}
    for r in cb_rows:
        by_m.setdefault(r["m"], []).append((r["code"], r["cvec"]))
    packs = []
    for mi in range(m):
        entries = sorted(by_m[mi])
        codes = np.array([c for c, _ in entries], dtype=np.int64)
        cmat = np.array([v for _, v in entries], dtype=np.int64)
        packs.append((codes, cmat))

    def encode(it):
        import pyarrow as pa

        for batch in it:
            tbl = batch.to_pydict()
            vids = tbl["vec_id"]
            vecs = np.array(tbl["embedding"], dtype=np.float64)
            mv = np.floor(vecs * 1_000_000.0).astype(np.int64)
            out = np.empty((len(vids), m), dtype=np.int64)
            for mi, (codes, cmat) in enumerate(packs):
                sub = mv[:, mi * sub_dim : (mi + 1) * sub_dim]
                diff = sub[:, None, :] - cmat[None, :, :]
                d = (diff * diff).sum(axis=2)
                out[:, mi] = codes[d.argmin(axis=1)]
            yield pa.RecordBatch.from_pydict(
                {"vec_id": pa.array(vids, pa.int64()), "codes": pa.array(out.tolist(), pa.list_(pa.int64()))}
            )

    return emb.select("vec_id", "embedding").mapInArrow(encode, "vec_id long, codes array<long>")


# --- pipeline variants ------------------------------------------------------


def v0(emb: DataFrame) -> DataFrame:
    """r14 HEAD shape, inlined: map LUT + HOF-aggregate ADC + struct-min encode."""
    cb = pq_codebook(emb, M, K, SUB)
    pcb = _packed_cb(cb)
    codes = emb.crossJoin(F.broadcast(pcb)).select(
        F.col("vec_id"), codes_r14(micro_fixed(F.col("embedding")), SUB).alias("codes")
    )
    queries = emb.filter(F.col("vec_id") < QIDS)
    lutq = queries.crossJoin(F.broadcast(pcb)).select(
        F.col("vec_id").alias("q_id"),
        luts_r14(micro_fixed(F.col("embedding")), SUB).alias("luts"),
    )
    cand = (
        codes.crossJoin(F.broadcast(lutq))
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", adc_r14(F.col("codes"), F.col("luts"), M).alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("q_id", F.col("vec_id").alias("c_id"), "adc_dist", "rank")
    )


def _topk_from(codes: DataFrame, lutq: DataFrame) -> DataFrame:
    cand = (
        codes.crossJoin(F.broadcast(lutq))
        .filter(F.col("q_id") != F.col("vec_id"))
        .select("q_id", "vec_id", adc_unrolled(F.col("codes"), F.col("luts"), M).alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("q_id", F.col("vec_id").alias("c_id"), "adc_dist", "rank")
    )


def _lutq_positional(emb: DataFrame, pcb: DataFrame) -> DataFrame:
    queries = emb.filter(F.col("vec_id") < QIDS)
    lm = (
        queries.crossJoin(F.broadcast(pcb))
        .select(
            F.col("vec_id").alias("q_id"),
            luts_maps(micro_fixed(F.col("embedding")), SUB).alias("_lm"),
        )
    )
    return lm.select("q_id", luts_positional(F.col("_lm")).alias("luts"))


def v1(emb: DataFrame) -> DataFrame:
    cb = pq_codebook(emb, M, K, SUB)
    pcb = _packed_cb(cb)
    codes = emb.crossJoin(F.broadcast(pcb)).select(
        F.col("vec_id"), codes_r14(micro_fixed(F.col("embedding")), SUB).alias("codes")
    )
    return _topk_from(codes, _lutq_positional(emb, pcb))


def v2(emb: DataFrame) -> DataFrame:
    """The shipped r15 shape — exercises the LIVE library code."""
    from block_crawler_spark.operators.pq import pq_adc_topk, pq_codes

    cb = pq_codebook(emb, M, K, SUB)
    codes = pq_codes(emb, cb, M, SUB)
    queries = emb.filter(F.col("vec_id") < QIDS)
    return pq_adc_topk(queries, codes, cb, M, SUB, TOPK)


def v3(emb: DataFrame, spark) -> DataFrame:
    cb = pq_codebook(emb, M, K, SUB)
    cb_rows = cb.collect()
    pcb = _packed_cb(cb)
    codes = numpy_codes(emb, cb_rows, M, SUB)
    return _topk_from(codes, _lutq_positional(emb, pcb))


def main() -> None:
    runs = 3
    if "--runs" in sys.argv:
        runs = int(sys.argv[sys.argv.index("--runs") + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("r15-pq-ab")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_table(spark, sf_dir, "embeddings")

    builders = {
        "v0_head": lambda: v0(emb),
        "v1_poslut_unrolled_adc": lambda: v1(emb),
        "v2_plus_unrolled_encode": lambda: v2(emb),
        "v3_numpy_encode": lambda: v3(emb, spark),
    }
    ref = sorted(tuple(r) for r in builders["v0_head"]().collect())
    for name, b in builders.items():
        got = sorted(tuple(r) for r in b().collect())
        assert got == ref, f"{name} NOT row-identical to v0 ({len(got)} vs {len(ref)} rows)"
        print(f"{name}: row-identical OK ({len(got)} rows)")

    for name, b in builders.items():
        best = None
        spark.sparkContext.setJobDescription(f"pq-ab {name}")
        for _ in range(runs):
            df = b()
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        print(f"{name}: best-of-{runs} {best:.3f}s  load1={os.getloadavg()[0]:.1f}")


if __name__ == "__main__":
    main()
