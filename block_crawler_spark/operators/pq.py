"""Product quantization (PQ) for embedding ANN at corpus scale.

PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — public paper) splits a D-dim vector into M subspaces and
replaces each subvector with the id of its nearest codeword from a
per-subspace codebook of K entries.  A 64-dim float vector (256 B)
compresses to M single-byte codes — the difference between an embedding
index that fits in executor memory at 100 TB and one that doesn't.  Query
time never touches the original vectors: an M×K lookup table of
query-to-codeword distances is broadcast, and candidate distance is M
integer adds per corpus row (asymmetric distance computation, ADC).

Spark shapes:

- **Codebook** — K rows × M subspaces, built from a deterministic seed
  set (``vec_id < K``, :func:`pq_codebook`) or TRAINED per subspace with
  grouped fixed-point Lloyd (:func:`pq_train_codebook` — all M subspaces
  in one loop, exactly the integer-exact scheme ``emb_ivf_trained_topk``
  uses for the IVF coarse quantizer).  Always broadcast — it is M·K rows.
- **Encode** — one corpus scan: explode into M subvectors, broadcast-join
  the codebook, per-(vector, subspace) argmin.  One shuffle on
  ``(vec_id, m)`` with map-side partial aggregation; output is the codes
  table, the only thing the search path ever scans.
- **ADC search** — LUT = queries × codebook (broadcast, Q·M·K rows);
  codes ⋈ LUT on ``(m, code)`` then one ``(q_id, vec_id)`` sum-agg and a
  per-query top-k window (WindowGroupLimit).  No full-vector math on the
  corpus side.

Exactness (the repo's shared portability rule, via ``ann.micro_fixed`` /
``ann.int_sqdist``): components fix-point to micros (``floor(x·1e6)`` in
double space, IEEE-exact), all distances are int64 sums of squared
integer diffs, so every emitted value hash-matches a DuckDB replica
bit-for-bit.  The Spark argmin uses ``min(struct(dist, code))`` (total
order, lowest-code tie-break, no overflow mode for any scale/dim); the
DuckDB oracle (`plans/embed_ops._pq_sql`) packs ``min(d·K + code)``,
which is tie-equivalent but bounded — safe there because the registry
query pins sub_dim=4, K=64, unit-range micros (d·K ≲ 1e15 ≪ 2^63), NOT
safe for arbitrary scale/dim; raise either and the SQL must move to a
struct min too.

Reference parity note: the reference engine has no ANN surface at all
(`/root/reference/` is an NFT chain crawler); this module is part of the
beyond-parity LLM-training-data pipeline the build plan calls for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .ann import int_sqdist, micro_fixed


def _subvectors(
    df: DataFrame, id_col: str, vec_col: str, m: int, sub_dim: int, fixed: bool = False
) -> DataFrame:
    """(id, m, sv): the M micro-int subvectors of each row's vector.
    ``fixed=True`` treats ``vec_col`` as ALREADY micro-int (the residual
    path subtracts micros in integer space — ``micro(v) − micro(c)`` is
    exact and portable, ``micro(v − c)`` would round differently)."""
    v = df.select(
        F.col(id_col).alias("_id"),
        (F.col(vec_col) if fixed else micro_fixed(F.col(vec_col))).alias("_v"),
    )
    parts = F.array(
        *[
            F.struct(F.lit(i).alias("m"), F.slice("_v", i * sub_dim + 1, sub_dim).alias("sv"))
            for i in range(m)
        ]
    )
    return v.select("_id", F.explode(parts).alias("p")).select(
        F.col("_id"), F.col("p.m").alias("m"), F.col("p.sv").alias("sv")
    )


def pq_codebook(emb: DataFrame, m: int, k: int, sub_dim: int) -> DataFrame:
    """Seed-set codebook: (m, code, cvec) from corpus rows ``vec_id < k``
    (deterministic; swap in a per-subspace Lloyd run to train)."""
    seeds = emb.filter(F.col("vec_id") < k)
    return _subvectors(seeds, "vec_id", "embedding", m, sub_dim).select(
        "m", F.col("_id").alias("code"), F.col("sv").alias("cvec")
    )


def pq_train_codebook(
    emb: DataFrame, m: int, k: int, sub_dim: int, iters: int = 2
) -> DataFrame:
    """Per-subspace Lloyd k-means in fixed-point integer space — the trained
    variant of :func:`pq_codebook`, with ALL M subspaces trained in one
    grouped loop (``m`` joins the group keys) instead of M separate runs.

    Same exactness rules as ``ann.kmeans_lloyd_fixed``: integer squared-L2
    distances, argmin ties to the lowest code via ``min(struct(d, code))``,
    centroid update ``floor(sum / count)`` in double space — bit-reproducible
    across engines, so even the trained codewords hash-check against the
    DuckDB replica.  Seeds are the ``vec_id < k`` subvectors (exactly the
    seed-set codebook), so training strictly refines the untrained baseline.
    A codeword that loses all members drops out (that subspace's k shrinks)
    — mirrored by the SQL oracle.

    Scale shape per iteration: one broadcast of the M·K-row codebook against
    the subvector table (no shuffle to assign) + one posexplode/groupBy
    update (shuffle bounded by M·K·sub_dim rows out).  The subvector table
    is cached for the loop and unpersisted before returning — the returned
    M·K-row codebook is materialized through the driver (bounded by
    construction) so it carries no lineage back into the released cache
    (ADVICE r6: each invocation used to leak one cached RDD for the
    session).  At corpus scale persist the subvector table to a parquet
    stage instead (same lever as ``dedup.minhash_signatures``)."""
    return _lloyd_train_sub(_subvectors(emb, "vec_id", "embedding", m, sub_dim), k, iters)


def _lloyd_train_sub(sub: DataFrame, k: int, iters: int) -> DataFrame:
    """The grouped Lloyd loop over an ``(_id, m, sv)`` subvector frame —
    shared by :func:`pq_train_codebook` (raw subvectors) and the residual
    path of :func:`ivfpq_residual_topk` (residual subvectors; round 8).
    Seeds are ``_id < k``; returns the (m, code, cvec) codebook
    driver-materialized (≤ M·K rows) with the loop cache released."""
    sub = sub.cache()
    cents = sub.filter(F.col("_id") < k).select(
        "m", F.col("_id").alias("code"), F.col("sv").alias("cvec")
    )
    best = F.min(F.struct("d", "code")).alias("b")
    for _ in range(iters):
        scored = sub.join(F.broadcast(cents), "m").select(
            "_id", "m", "code", int_sqdist(F.col("sv"), F.col("cvec")).alias("d")
        )
        a = (
            scored.groupBy("_id", "m")
            .agg(best)
            .select("_id", "m", F.col("b.code").alias("code"))
        )
        per_dim = a.join(sub, ["_id", "m"]).select(
            "m", "code", F.posexplode("sv").alias("pos", "val")
        )
        upd = per_dim.groupBy("m", "code", "pos").agg(
            F.floor(F.sum("val") / F.count("*")).cast("long").alias("cval")
        )
        cents = upd.groupBy("m", "code").agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cval"))), lambda s: s["cval"]
            ).alias("cvec")
        )
    # materialize the tiny (M·K rows) result through the driver and release
    # the loop cache — a localCheckpoint would itself pin an RDD; a
    # collect/recreate of ≤ M·K rows is bounded by construction and leaves
    # the session with zero persisted state per invocation
    cents = sub.sparkSession.createDataFrame(cents.collect(), cents.schema)
    sub.unpersist()
    return cents


def pq_encode(emb: DataFrame, codebook: DataFrame, m: int, sub_dim: int) -> DataFrame:
    """Corpus → codes (vec_id, m, code): per-subspace nearest codeword by
    exact integer squared-L2, ties to the lowest code id."""
    sub = _subvectors(emb, "vec_id", "embedding", m, sub_dim)
    scored = sub.join(F.broadcast(codebook), "m").select(
        F.col("_id").alias("vec_id"), "m", "code", int_sqdist(F.col("sv"), F.col("cvec")).alias("d")
    )
    best = F.min(F.struct("d", "code")).alias("b")
    return (
        scored.groupBy("vec_id", "m")
        .agg(best)
        .select("vec_id", "m", F.col("b.code").alias("code"))
    )


def pq_adc_topk(
    queries: DataFrame, codes: DataFrame, codebook: DataFrame, m: int, sub_dim: int, k: int
) -> DataFrame:
    """ADC top-k join: (q_id, c_id, adc_dist, rank) for each query, over
    the codes table only — the corpus's float vectors are never read."""
    q_sub = _subvectors(queries, "vec_id", "embedding", m, sub_dim)
    lut = q_sub.join(F.broadcast(codebook), "m").select(
        F.col("_id").alias("q_id"), "m", "code", int_sqdist(F.col("sv"), F.col("cvec")).alias("d")
    )
    # the LUT is dense over (m, code) for every query, so the inner join
    # contributes exactly M rows per (query, candidate) — the sum is total
    cand = (
        codes.join(F.broadcast(lut), ["m", "code"])
        .filter(F.col("q_id") != F.col("vec_id"))
        .groupBy("q_id", "vec_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist").asc(), F.col("vec_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", F.col("vec_id").alias("c_id"), "adc_dist", "rank")
    )


def ivfpq_adc_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    codebook: DataFrame,
    codes: DataFrame,
    m: int,
    sub_dim: int,
    k: int,
    nprobe: int = 4,
) -> DataFrame:
    """IVF cell pruning composed with ADC scoring — the IVFADC layout of
    Jégou et al. §IV without residual encoding: the coarse quantizer only
    PRUNES (each query scores the codes of its ``nprobe`` nearest cells),
    while PQ codes encode the raw vectors.  Residual encoding (PQ over
    ``v − centroid``) is the standard refinement when the corpus has cluster
    structure worth exploiting; on isotropic embeddings it buys nothing, and
    either way the composition shape below is unchanged (the codes table
    would simply store residual codes per cell).

    Scale shape: candidate pairs come from the (query-probe ⋈ corpus-cell)
    equi-join on centroid_id — the corpus side is the CODES table keyed by
    cell, never the float vectors; the per-query LUT (Q·M·K rows) and the
    k-row centroid table broadcast.  Cost per query ≈ nprobe/n_cells of the
    flat ADC scan, on top of ADC's ~16× byte compression.
    """
    from .ann import ivf_assign

    ca = ivf_assign(corpus, centroids).select(F.col("vec_id").alias("c_id"), "centroid_id")
    qa = ivf_assign(queries, centroids, n_assign=nprobe).select(
        F.col("vec_id").alias("q_id"), "centroid_id"
    )
    # cells are disjoint for the corpus, so nprobe probes produce no
    # duplicate (q_id, c_id) pairs — no dedup needed
    pairs = qa.join(ca, "centroid_id").filter(F.col("q_id") != F.col("c_id")).select("q_id", "c_id")
    q_sub = _subvectors(queries, "vec_id", "embedding", m, sub_dim)
    lut = q_sub.join(F.broadcast(codebook), "m").select(
        F.col("_id").alias("q_id"), "m", "code", int_sqdist(F.col("sv"), F.col("cvec")).alias("d")
    )
    cand = (
        pairs.join(codes.withColumnRenamed("vec_id", "c_id"), "c_id")
        .join(F.broadcast(lut), ["q_id", "m", "code"])
        .groupBy("q_id", "c_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist").asc(), F.col("c_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "adc_dist", "rank")
    )


def _residual_sub_factory(centroids: DataFrame, m: int, sub_dim: int):
    """Returns ``residual_sub(vectors, id_alias, n_assign)`` producing the
    (id_alias, centroid_id, m, sv) per-(vector, assigned-cell) residual
    subvector frame — cell id carried THROUGH the explode so the codes need
    no join back to the assignment (the corpus residual lineage runs once,
    not three times).  Shared by :func:`ivfpq_residual_topk` and
    :func:`ivfpq_residual_codebook` so the search and the standalone
    trainer can never residualize differently."""
    from .ann import ivf_assign

    cmicro = centroids.select(
        F.col("vec_id").alias("centroid_id"), micro_fixed(F.col("embedding")).alias("cv")
    )
    residual = F.zip_with("_mv", "cv", lambda a, b: a - b)
    parts = F.array(
        *[
            F.struct(F.lit(i).alias("m"), F.slice("rv", i * sub_dim + 1, sub_dim).alias("sv"))
            for i in range(m)
        ]
    )

    def residual_sub(vectors: DataFrame, id_alias: str, n_assign: int) -> DataFrame:
        a = ivf_assign(vectors, centroids, n_assign=n_assign)
        res = (
            a.withColumn("_mv", micro_fixed(F.col("embedding")))
            .join(F.broadcast(cmicro), "centroid_id")
            .select(F.col("vec_id").alias(id_alias), "centroid_id", residual.alias("rv"))
        )
        return res.select(id_alias, "centroid_id", F.explode(parts).alias("p")).select(
            id_alias, "centroid_id", F.col("p.m").alias("m"), F.col("p.sv").alias("sv")
        )

    return residual_sub


def ivfpq_residual_codebook(
    corpus: DataFrame,
    centroids: DataFrame,
    m: int,
    sub_dim: int,
    n_codewords: int,
    train_iters: int,
    train_sample: int | None = None,
) -> DataFrame:
    """The TRAINED residual codebook of :func:`ivfpq_residual_topk`'s
    ``train_iters > 0`` path, exposed standalone (round 12) so the plan
    layer can train once per session and pass the ≤M·K-row result back via
    the ``codebook`` parameter: Lloyd over the residual subvectors of the
    bounded deterministic ``vec_id < train_sample`` sample, seeded by the
    same ``vec_id < n_codewords`` residuals the untrained path uses, so
    training strictly refines the baseline.  Driver-materialized by
    ``_lloyd_train_sub`` (bounded by construction, zero persisted state)."""
    if train_sample is not None and train_sample < n_codewords:
        raise ValueError(
            f"train_sample={train_sample} must be >= n_codewords={n_codewords}: "
            "the first n_codewords sampled residuals seed the codebook"
        )
    residual_sub = _residual_sub_factory(centroids, m, sub_dim)
    sample_n = n_codewords if train_sample is None else train_sample
    tsub = residual_sub(corpus.filter(F.col("vec_id") < sample_n), "_id", 1).select(
        "_id", "m", "sv"
    )
    return _lloyd_train_sub(tsub, n_codewords, train_iters)


def ivfpq_residual_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: DataFrame,
    m: int,
    sub_dim: int,
    k: int,
    n_codewords: int,
    nprobe: int = 4,
    train_iters: int = 0,
    train_sample: int | None = None,
    codebook: DataFrame | None = None,
) -> DataFrame:
    """IVFADC WITH residual encoding — the full Jégou et al. §IV layout
    (:func:`ivfpq_adc_topk` is the documented no-residual variant): PQ
    codes quantize ``v − centroid(cell(v))``, so the codebook spends its
    budget on the within-cell displacement instead of re-encoding the cell
    position the coarse quantizer already knows.  The query side pays the
    standard price: the ADC lookup table is per (query, PROBED CELL) —
    Q·nprobe·M·K rows instead of Q·M·K — because the query's residual
    differs in every probed cell.

    Exactness: residuals are ``micro(v) − micro(centroid)`` in int64 space
    (exact; subtracting micros, never micro-ing a float difference), so
    every ADC distance still hash-matches the DuckDB replica.  Codebook
    seeds are the residuals of ``vec_id < n_codewords``; ``train_iters > 0``
    refines them with the shared grouped Lloyd loop over the RESIDUAL
    subvectors of the ``vec_id < train_sample`` rows (round 8 — the trained
    twin of the seed-set residual codebook, same fixed-point exactness as
    :func:`pq_train_codebook`, so even the trained residual codewords
    hash-check against the SQL replica).

    Scale shape: identical to the no-residual form — candidates come from
    the (probed-cell ⋈ corpus-cell) equi-join on the CODES table (now
    keyed (centroid_id, m, code)), float vectors never join, centroid and
    codebook tables broadcast; the only growth is the LUT's nprobe factor,
    still query-side-tiny."""
    # A sample smaller than the codeword count would silently shrink the
    # codebook (seeds are _id < n_codewords), so reject it up front — and
    # compare against None, not truthiness, so train_sample=0 errors
    # instead of quietly meaning "unset" (ADVICE r8).
    if train_iters > 0 and train_sample is not None and train_sample < n_codewords:
        raise ValueError(
            f"train_sample={train_sample} must be >= n_codewords={n_codewords}: "
            "the first n_codewords sampled residuals seed the codebook"
        )

    residual_sub = _residual_sub_factory(centroids, m, sub_dim)

    if codebook is not None:
        # pre-trained residual codebook supplied by the caller (the plan
        # layer's session memo — round 12): MUST have been produced by
        # ivfpq_residual_codebook with the SAME (centroids, m, sub_dim,
        # n_codewords, iters, sample).  The caller owns the centroid/iters/
        # sample part of that contract (unverifiable from the frame), but
        # the LAYOUT is checked here (ADVICE r12): a codebook trained with
        # a different (m, sub_dim, n_codewords) would silently produce
        # wrong ADC distances, not an error.  The codebook is ≤ M·K rows
        # and already driver-materialized by every caller, so the check is
        # one cheap bounded action.
        layout = (
            codebook.groupBy("m")
            .agg(
                F.max("code").alias("max_code"),
                F.collect_set(F.size("cvec")).alias("widths"),
            )
            .collect()
        )
        got_ms = sorted(r["m"] for r in layout)
        # NB: a trained codebook legitimately carries FEWER than n_codewords
        # codes per subspace (Lloyd drops empty clusters), so only codes AT
        # OR PAST n_codewords are definitely a different layout
        bad_codes = {r["m"]: r["max_code"] for r in layout if r["max_code"] >= n_codewords}
        bad_widths = {r["m"]: r["widths"] for r in layout if set(r["widths"]) != {sub_dim}}
        if got_ms != list(range(m)) or bad_codes or bad_widths:
            raise ValueError(
                f"ivfpq_residual_topk: supplied codebook does not match the requested "
                f"layout (m={m}, sub_dim={sub_dim}, n_codewords={n_codewords}): "
                f"subspaces={got_ms}, out-of-range codes={bad_codes}, "
                f"wrong codeword widths={bad_widths}"
            )
        cb = codebook
    elif train_iters > 0:
        cb = ivfpq_residual_codebook(
            corpus, centroids, m, sub_dim, n_codewords, train_iters, train_sample
        )
    else:
        # codebook from the SEEDS' residuals only — a seed's cell assignment
        # depends on nothing but its own row, so this tiny lineage (≤ K
        # vectors through the window) equals filtering the full residual table
        cb = residual_sub(corpus.filter(F.col("vec_id") < n_codewords), "c_id", 1).select(
            "m", F.col("c_id").alias("code"), F.col("sv").alias("cvec")
        )
    best = F.min(F.struct("d", "code")).alias("b")
    codes = (
        residual_sub(corpus, "c_id", 1)
        .join(F.broadcast(cb), "m")
        .select("c_id", "centroid_id", "m", "code", int_sqdist(F.col("sv"), F.col("cvec")).alias("d"))
        .groupBy("c_id", "centroid_id", "m")
        .agg(best)
        .select("c_id", "centroid_id", "m", F.col("b.code").alias("code"))
    )

    q_sub = residual_sub(queries, "q_id", nprobe)
    lut = q_sub.join(F.broadcast(cb), "m").select(
        "q_id", "centroid_id", "m", "code", int_sqdist(F.col("sv"), F.col("cvec")).alias("d")
    )
    cand = (
        codes.join(F.broadcast(lut), ["centroid_id", "m", "code"])
        .filter(F.col("q_id") != F.col("c_id"))
        .groupBy("q_id", "c_id")
        .agg(F.sum("d").alias("adc_dist"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("adc_dist").asc(), F.col("c_id").asc())
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "c_id", "adc_dist", "rank")
    )
