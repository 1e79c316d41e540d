"""Training-data *shaping* queries: chunking, sequence packing, mixture planning.

The dedup/quality/sampling families (``text_ops``) clean a corpus; this module
covers the next pipeline stage — turning the cleaned corpus into model-ready
training sequences.  Three oracle-checked operators:

* **Sliding-window chunking** — split each document into fixed-width,
  overlapping character windows (the standard long-document → context-window
  step).  Pure column expressions: ``sequence`` → ``explode`` → ``substring``;
  zero shuffles, and each chunk is certified by its md5 so the oracle pins the
  exact chunk *text*, not just counts.
* **Concat-and-split sequence packing** — assign documents to fixed-token-
  budget training sequences by concatenating them in a deterministic order and
  cutting every ``SEQ_LEN_TOK`` tokens (the "packing" step of LLM pretraining
  loaders).  Packing is order-dependent by definition, so the scale unit is the
  hash **shard**: documents hash to shards, each shard packs independently with
  a window cumulative-sum.  At 100 TB you raise ``PACK_SHARDS`` so a shard
  holds O(executor-memory) tokens (shards ≈ total_tokens / 10⁹ keeps each
  shard's sort+scan bounded); the per-shard sequential pass is inherent to the
  operator's semantics, not an implementation shortcut.
* **Mixture planning** — given per-source target weights and a global token
  budget, compute each source's deterministic sampling rate and the realized
  sample (the "data mixture" step: up/down-weighting sources to hit a target
  distribution).  Two aggregations over ``source`` (20 values ⇒ tiny) plus a
  1-row budget broadcast and a broadcast rate-join back to the docs — the
  doc-side work is a single scan + map-side filter, no doc-keyed shuffle.

Engine-parity rules (shared with ``text_ops``): integer ppm/div arithmetic
only, md5-hex-prefix as the cross-engine uniform hash, every output column
BIGINT or VARCHAR, DuckDB ``SUM``/window sums cast back to BIGINT (they widen
to HUGEINT, which the driver's pandas fetch would turn into float64).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.text import n_tokens
from ..sources.tables import load_table

CHUNK_CHARS = 400
STRIDE_CHARS = 300

PACK_SHARDS = 8
SEQ_LEN_TOK = 512

MIX_WEIGHT_MOD = 4
MIX_BUDGET_DIV = 2  # global token budget = total available tokens div 2


def _u_ppm(prefix: str) -> F.Column:
    """Deterministic uniform hash of doc_id into [0, 1e6) — md5-prefix rule."""
    h = F.md5(F.concat(F.lit(prefix), F.col("doc_id").cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % 1_000_000


def pack_shard(shards: int = PACK_SHARDS) -> F.Column:
    """Deterministic pack-shard assignment of doc_id (md5-hex-prefix rule).
    The SINGLE definition shared by ``pack_sequences_query`` and the
    composed pipeline (``plans.pipeline.packed_docs``) — the CLI manifest is
    only equal to the registry output while these stay identical."""
    h = F.md5(F.concat(F.lit("pack|"), F.col("doc_id").cast("string")))
    return F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % shards


def n_tok_col(mode: str = "ws") -> F.Column:
    """The shaping unit as BIGINT — shared by packing, mixture and the
    composed pipeline.  ``mode="ws"`` is the whitespace count (identical to
    ``doc_token_stats``'s ``n_tok``, the pre-round-7 default); ``"bpe"``
    counts with the deterministic toy-BPE merge chain
    (``functions.text.bpe_token_count`` — ``doc_bpe_token_stats`` proves
    its cross-engine parity), so sequence budgets and mixture token targets
    are measured in tokenizer-relevant units instead of words.  Both are
    zero-shuffle column expressions; switching modes changes no operator
    shape."""
    if mode == "ws":
        return n_tokens(F.col("text")).cast("long")
    if mode == "bpe":
        from ..functions.text import bpe_token_count

        return bpe_token_count(F.col("text")).cast("long")
    raise ValueError(f"n_tok_col: unknown mode {mode!r} (expected 'ws' or 'bpe')")


_N_TOK_SQL = {
    "ws": "CAST(len(string_split_regex(trim(text), '\\s+')) AS BIGINT)",
}


def _n_tok_sql(mode: str) -> str:
    if mode == "bpe":
        from ..functions.text import bpe_count_sql_expr

        return bpe_count_sql_expr("text")
    return _N_TOK_SQL[mode]


# ---------------------------------------------------------------------------
# sliding-window chunking
# ---------------------------------------------------------------------------

def chunk_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping character windows: chunk *i* covers
    ``[i*STRIDE, i*STRIDE + CHUNK)``; a window starts wherever
    ``i*STRIDE < length`` so every character lands in ≥1 chunk and
    consecutive chunks overlap by ``CHUNK - STRIDE`` characters.  The md5
    column certifies chunk content byte-for-byte against the oracle."""
    with_idx = _chunked_frame(spark, sf_dir)
    return with_idx.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.length(_chunk_expr()).cast("long").alias("chunk_len"),
        F.md5(_chunk_expr()).alias("chunk_md5"),
    )


def _chunked_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, text, chunk_idx) — the ONE definition of the chunk window
    starts, shared by ``doc_chunk_stats`` and ``doc_chunk_dup_stats`` (as
    ``_CHUNK_CTE`` is for their SQL oracles)."""
    d = load_table(spark, sf_dir, "documents").filter(F.length("text") > 0)
    return d.select(
        "doc_id",
        "text",
        F.expr(f"explode(sequence(0, int((length(text) - 1) div {STRIDE_CHARS})))").alias("chunk_idx"),
    )


# the chunk text at the current (text, chunk_idx) row — Spark and DuckDB forms
# (function, not a module constant: F.expr needs an active SparkContext)
def _chunk_expr() -> F.Column:
    return F.expr(f"substring(text, chunk_idx * {STRIDE_CHARS} + 1, {CHUNK_CHARS})")


_CHUNK_SQL_EXPR = f"substr(text, CAST(chunk_idx * {STRIDE_CHARS} + 1 AS INT), {CHUNK_CHARS})"
_CHUNK_CTE = f"""c AS (
  SELECT doc_id, text,
         unnest(generate_series(0, (length(text) - 1) // {STRIDE_CHARS})) AS chunk_idx
  FROM documents WHERE length(text) > 0
)"""

CHUNK_SQL = f"""
WITH {_CHUNK_CTE}
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(length({_CHUNK_SQL_EXPR}) AS BIGINT) AS chunk_len,
       md5({_CHUNK_SQL_EXPR}) AS chunk_md5
FROM c
"""


def chunk_dup_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-granularity duplication: how much of each document consists of
    windows that appear elsewhere in the corpus — the chunk analog of C4's
    line-level dedup, the standard boilerplate detector (headers, footers,
    licence blocks repeat across documents; prose doesn't).  Shape: the
    chunk generate (zero-shuffle) → one hash-agg on chunk_md5 → count join
    back → per-doc roll-up.  At corpus scale the md5 aggregate is the same
    single shuffle as exact dedup, on strictly smaller keys."""
    chunks = _chunked_frame(spark, sf_dir).select("doc_id", F.md5(_chunk_expr()).alias("chunk_md5"))
    occ = chunks.groupBy("chunk_md5").agg(F.count("*").alias("n_occ"))
    return (
        chunks.join(occ, "chunk_md5")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).cast("long").alias("n_dup_chunks"),
        )
        .withColumn("dup_ppm", F.expr("CAST(n_dup_chunks * 1000000 DIV n_chunks AS BIGINT)"))
    )


CHUNK_DUP_SQL = f"""
WITH {_CHUNK_CTE}, ch AS (
  SELECT doc_id, md5({_CHUNK_SQL_EXPR}) AS chunk_md5
  FROM c
), occ AS (
  SELECT chunk_md5, count(*) AS n_occ FROM ch GROUP BY chunk_md5
)
SELECT ch.doc_id,
       CAST(count(*) AS BIGINT) AS n_chunks,
       CAST(sum(CASE WHEN occ.n_occ > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_chunks,
       CAST(sum(CASE WHEN occ.n_occ > 1 THEN 1 ELSE 0 END) * 1000000 // count(*) AS BIGINT) AS dup_ppm
FROM ch JOIN occ USING (chunk_md5)
GROUP BY ch.doc_id
"""


# ---------------------------------------------------------------------------
# concat-and-split sequence packing
# ---------------------------------------------------------------------------

def assign_bins(per: DataFrame, seq_len: int = SEQ_LEN_TOK, by_length: bool = False) -> DataFrame:
    """The packing rule, once: given a frame with (doc_id, n_tok, shard),
    append ``cum`` (within-shard running token total) and ``bin_id`` (the
    cut the document STARTS in).  Shared by ``doc_pack_sequences`` and the
    composed pipeline's ``packed_docs`` — the CLI manifest equals the
    registry output only while this is the single definition of the bin
    math.  Tape order is doc_id (replayable default); ``by_length`` lays
    the tape longest-doc-first (n_tok DESC, doc_id tiebreak) — the
    distributed approximation of length-grouped packing that
    ``doc_pack_sorted_fill_stats`` compares against."""
    order = [F.desc("n_tok"), F.asc("doc_id")] if by_length else [F.asc("doc_id")]
    w = Window.partitionBy("shard").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    return per.withColumn("cum", F.sum("n_tok").over(w)).withColumn(
        "bin_id", F.expr(f"(cum - n_tok) div {seq_len}")
    )


def pack_sequences_query(spark: SparkSession, sf_dir: str, n_tok_mode: str = "ws") -> DataFrame:
    """Deterministic concat-and-split packing: within each hash shard,
    documents are laid end-to-end in doc_id order and the tape is cut every
    ``SEQ_LEN_TOK`` tokens; a document belongs to the bin where it *starts*.
    One shuffle (hash by shard) + per-shard window cumsum; the bin roll-up
    reuses the same partitioning.  Shard count is the scale dial — see the
    module docstring for the 100 TB sizing rule.  ``n_tok_mode`` picks the
    budget unit (whitespace words or toy-BPE tokens — registry pins both
    variants)."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select("doc_id", n_tok_col(n_tok_mode).alias("n_tok"), pack_shard().alias("shard"))
    binned = assign_bins(per)
    return binned.groupBy("shard", "bin_id").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("tok_sum"),
        F.min("doc_id").alias("first_doc"),
        F.max("doc_id").alias("last_doc"),
    )


def _pack_cum_cte(n_tok_mode: str = "ws", order_sql: str = "doc_id") -> str:
    """The per→cum CTE preamble (shard hash + within-shard window cumsum) —
    the SQL twin of :func:`assign_bins` and, like it, the ONE definition of
    the bin math (r10 review: four hand-copies had accumulated; text_ops
    solved the same drift class with ``_minhash_cand_ctes``).  ``order_sql``
    is the tape order — ``doc_id`` (default) or the length-sorted
    ``n_tok DESC, doc_id``."""
    return f"""per AS (
  SELECT doc_id,
         {_n_tok_sql(n_tok_mode)} AS n_tok,
         CAST('0x' || substr(md5('pack|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % {PACK_SHARDS} AS shard
  FROM documents
), cum AS (
  SELECT doc_id, n_tok, shard,
         CAST(sum(n_tok) OVER (PARTITION BY shard ORDER BY {order_sql} ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
  FROM per
)"""


def _pack_sql(n_tok_mode: str = "ws") -> str:
    return f"""
WITH {_pack_cum_cte(n_tok_mode)}
SELECT shard,
       CAST((cum - n_tok) // {SEQ_LEN_TOK} AS BIGINT) AS bin_id,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_tok) AS BIGINT) AS tok_sum,
       min(doc_id) AS first_doc,
       max(doc_id) AS last_doc
FROM cum
GROUP BY shard, CAST((cum - n_tok) // {SEQ_LEN_TOK} AS BIGINT)
"""


PACK_SQL = _pack_sql("ws")


# ---------------------------------------------------------------------------
# mixture planning
# ---------------------------------------------------------------------------

def mixture_rates(per_doc: DataFrame) -> DataFrame:
    """Per-source sampling plan from a (source, n_tok, ...) frame: the
    source aggregate, target weights, the 1-row budget broadcast and the
    rate computation — WITHOUT the realized-sample pass.  Callers that only
    need ``rate_ppm`` (the pipeline's mixture sampling) use this directly
    and skip the second corpus scan ``mixture_plan_query`` adds."""
    src = per_doc.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("avail_tok")
    )
    # digit-less sources get weight 1 explicitly: without the coalesce the
    # NULL would flow into rate_ppm, where Spark's null-skipping `least`
    # silently yields 1e6 (keep everything) while DuckDB's least yields NULL
    # (keep nothing) — both wrong, and divergent
    weight = F.coalesce(
        (F.regexp_extract(F.col("source"), r"(\d+)$", 1).cast("int") % MIX_WEIGHT_MOD + 1).cast("long"),
        F.lit(1).cast("long"),
    )
    src = src.withColumn("weight", weight)
    totals = src.agg(F.sum("avail_tok").alias("tot_tok"), F.sum("weight").alias("w_sum"))
    return (
        src.crossJoin(F.broadcast(totals))
        .withColumn("budget", F.expr(f"tot_tok div {MIX_BUDGET_DIV}"))
        .withColumn("target_tok", F.expr("budget * weight div w_sum"))
        .withColumn("rate_ppm", F.least(F.lit(1_000_000).cast("long"), F.expr("target_tok * 1000000 div avail_tok")))
    )


def mixture_plan_query(spark: SparkSession, sf_dir: str, n_tok_mode: str = "ws") -> DataFrame:
    """Token-budget mixture: each source gets ``weight``/Σweights of a global
    budget (half the available tokens), capped at what the source actually
    has; the realized sample keeps a document iff its uniform hash falls
    under the source's rate_ppm.  Plan shape: doc scan → source agg (tiny) →
    1-row budget broadcast → broadcast rate-join back → filtered agg.  The
    doc table is scanned twice but never shuffled on a per-doc key; at 100 TB
    the first scan's (source, n_tok, u) projection is the natural candidate
    for a persisted stage table.  ``target_tok * 1e6`` bounds avail_tok at
    ~9e12 tokens per source before BIGINT overflow — beyond that, switch the
    ppm math to DOUBLE or pre-divide the budget."""
    docs = load_table(spark, sf_dir, "documents")
    per_doc = docs.select("source", n_tok_col(n_tok_mode).alias("n_tok"), _u_ppm("mix|").alias("u"))
    planned = mixture_rates(per_doc)
    sampled = (
        per_doc.join(F.broadcast(planned.select("source", "rate_ppm")), "source")
        .filter(F.col("u") < F.col("rate_ppm"))
        .groupBy("source")
        .agg(F.count("*").alias("n_sampled"), F.sum("n_tok").alias("sampled_tok"))
    )
    return planned.join(F.broadcast(sampled), "source", "left").select(
        "source",
        "n_docs",
        "avail_tok",
        "weight",
        "target_tok",
        "rate_ppm",
        F.coalesce(F.col("n_sampled"), F.lit(0).cast("long")).alias("n_sampled"),
        F.coalesce(F.col("sampled_tok"), F.lit(0).cast("long")).alias("sampled_tok"),
    )


def _mixture_sql(n_tok_mode: str = "ws") -> str:
    return rf"""
WITH per_doc AS (
  SELECT source,
         {_n_tok_sql(n_tok_mode)} AS n_tok,
         CAST('0x' || substr(md5('mix|' || CAST(doc_id AS VARCHAR)), 1, 8) AS BIGINT) % 1000000 AS u
  FROM documents
), src AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS avail_tok,
         CAST(COALESCE(TRY_CAST(regexp_extract(source, '(\d+)$', 1) AS INT) % {MIX_WEIGHT_MOD} + 1, 1) AS BIGINT) AS weight
  FROM per_doc GROUP BY source
), totals AS (
  SELECT CAST(sum(avail_tok) AS BIGINT) AS tot_tok, CAST(sum(weight) AS BIGINT) AS w_sum FROM src
), planned AS (
  SELECT source, n_docs, avail_tok, weight,
         (tot_tok // {MIX_BUDGET_DIV}) * weight // w_sum AS target_tok,
         least(1000000, ((tot_tok // {MIX_BUDGET_DIV}) * weight // w_sum) * 1000000 // avail_tok) AS rate_ppm
  FROM src, totals
), sampled AS (
  SELECT d.source, CAST(count(*) AS BIGINT) AS n_sampled, CAST(sum(d.n_tok) AS BIGINT) AS sampled_tok
  FROM per_doc d JOIN planned p ON d.source = p.source
  WHERE d.u < p.rate_ppm
  GROUP BY d.source
)
SELECT p.source, p.n_docs, p.avail_tok, p.weight, p.target_tok, p.rate_ppm,
       COALESCE(s.n_sampled, 0) AS n_sampled,
       COALESCE(s.sampled_tok, 0) AS sampled_tok
FROM planned p LEFT JOIN sampled s ON p.source = s.source
"""


MIXTURE_SQL = _mixture_sql("ws")


def _pack_sequences_bpe_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``doc_pack_sequences`` with the toy-BPE budget unit — the
    ``n_tok_mode`` switch exercised end-to-end under the oracle."""
    return pack_sequences_query(spark, sf_dir, n_tok_mode="bpe")


def fill_ppm_expr() -> F.Column:
    """Mean-fill ppm over the grouped bins frame, overflow-free: the token
    sum is widened to DECIMAL(38,0) BEFORE the ×1e6 scale, because
    ``sum(bin_tok) * 1000000`` as int64 overflows once a shard holds
    ≳9.2e12 tokens (~37 TB of text at 4 B/token with the committed 8
    shards) — under Spark 4's default ANSI mode that KILLS the query with
    ArithmeticException, exactly at the 100 TB regime this engine targets
    (pinned in ``test_ppm_exprs_survive_int64_overflow_region``).  DuckDB
    needs no twin fix: its SUM(BIGINT) promotes to HUGEINT and ``//``
    truncates, so the oracle SQL is overflow-free as written; Spark DIV on
    DECIMAL also truncates, so the two engines stay bit-identical
    (non-negative operands make floor == truncate)."""
    return F.expr(
        f"CAST(CAST(sum(bin_tok) AS DECIMAL(38,0)) * 1000000"
        f" DIV (count(*) * {SEQ_LEN_TOK}) AS BIGINT)"
    )


def waste_ppm_expr() -> F.Column:
    """Attention-waste ppm over the grouped bins frame, overflow-free via
    the same DECIMAL(38,0) widening as :func:`fill_ppm_expr` —
    ``sum(t*t) * 1000000`` wraps int64 once a shard's pair sum passes
    ~9.2e12 (≈3.5e7 bins ≈ 72 GB of packed text at SEQ_LEN 512), far
    below target scale.  The widened product tops out near 1e24 for any
    physical corpus, comfortably inside DECIMAL(38,0)."""
    return F.expr(
        "CAST(CAST(sum(t * t - s2) AS DECIMAL(38,0)) * 1000000 DIV sum(t * t) AS BIGINT)"
    )


def pack_fill_stats_query(spark: SparkSession, sf_dir: str, by_length: bool = False) -> DataFrame:
    """Packing-efficiency audit per shard: how full the cut bins actually
    are.  Padding waste is a direct training cost (every under-filled
    sequence burns compute on pad tokens), so the pipeline needs the
    fill-rate measured, not assumed: per shard — bin count, token total,
    mean fill ppm of SEQ_LEN, and the min/max per-bin token loads (the
    doc-starts-where-it-begins rule lets a bin overflow by one document's
    tail, so max > 1e6 ppm is expected and quantified here, not a bug).

    ``by_length`` audits the LENGTH-SORTED tape instead (same columns, the
    :func:`assign_bins` flag) so the two layouts diff row-for-row — the
    replayable-order vs low-overflow trade measured, not guessed.

    Scale shape: reuses the packing window (one hash-by-shard shuffle +
    per-shard cumsum — the sort is WITHIN the shard partition, never a
    corpus-wide range shuffle), then two bounded hash-aggs — (shard, bin)
    keys, then shard keys.  All ppm fields are BIGINT fixed-point."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select("doc_id", n_tok_col().alias("n_tok"), pack_shard().alias("shard"))
    bins = assign_bins(per, by_length=by_length).groupBy("shard", "bin_id").agg(
        F.sum("n_tok").alias("bin_tok")
    )
    return (
        bins.groupBy("shard")
        .agg(
            F.count("*").cast("long").alias("n_bins"),
            F.sum("bin_tok").cast("long").alias("tok_sum"),
            fill_ppm_expr().alias("mean_fill_ppm"),
            F.min("bin_tok").cast("long").alias("min_bin_tok"),
            F.max("bin_tok").cast("long").alias("max_bin_tok"),
        )
    )


def _pack_fill_sql(by_length: bool = False) -> str:
    order_sql = "n_tok DESC, doc_id" if by_length else "doc_id"
    return f"""
WITH {_pack_cum_cte("ws", order_sql)}, bins AS (
  SELECT shard, CAST((cum - n_tok) // {SEQ_LEN_TOK} AS BIGINT) AS bin_id,
         CAST(sum(n_tok) AS BIGINT) AS bin_tok
  FROM cum GROUP BY shard, CAST((cum - n_tok) // {SEQ_LEN_TOK} AS BIGINT)
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(bin_tok) AS BIGINT) AS tok_sum,
       CAST(sum(bin_tok) * 1000000 // (count(*) * {SEQ_LEN_TOK}) AS BIGINT) AS mean_fill_ppm,
       CAST(min(bin_tok) AS BIGINT) AS min_bin_tok,
       CAST(max(bin_tok) AS BIGINT) AS max_bin_tok
FROM bins
GROUP BY shard
"""


PACK_FILL_SQL = _pack_fill_sql()


def pack_attention_waste_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document attention waste of the packed layout (round 10):
    without document masking, a transformer attends across every token
    pair inside a packed sequence, so a bin holding docs of sizes
    n₁..n_k spends T² − Σnᵢ² of its T² attention pairs on CROSS-document
    positions — pure contamination (and wasted FLOPs under masking).  Per
    shard: bin count, total/cross pair sums, and waste ppm — the number
    that decides whether this corpus needs doc-masked attention or
    best-fit (length-grouped) packing instead of concat-and-split.
    Complements ``doc_pack_fill_stats``: fill measures PAD waste, this
    measures ATTENTION waste; the two are the complete packing-cost story.

    Scale shape: the shared :func:`assign_bins` window (one hash-by-shard
    shuffle + per-shard cumsum), then two bounded hash-aggs — (shard, bin)
    keys carrying Σn and Σn², then ≤PACK_SHARDS keys.  Integer bounds:
    T ≤ SEQ_LEN + one doc tail keeps T² small, but the per-shard pair SUMS
    grow linearly with bin count — ``sum(t*t) * 1e6`` wraps int64 at
    ~72 GB/shard of packed text, so the ppm is computed via
    :func:`waste_ppm_expr`'s DECIMAL(38,0) widening (DuckDB promotes to
    HUGEINT natively); the raw ``total_pairs``/``cross_pairs`` columns
    stay int64-safe to ~9.2e18 pairs per shard (≈37 PB of text)."""
    docs = load_table(spark, sf_dir, "documents")
    per = docs.select("doc_id", n_tok_col().alias("n_tok"), pack_shard().alias("shard"))
    bins = assign_bins(per).groupBy("shard", "bin_id").agg(
        F.sum("n_tok").alias("t"),
        F.sum(F.col("n_tok") * F.col("n_tok")).alias("s2"),
    )
    return bins.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_bins"),
        F.sum(F.col("t") * F.col("t")).cast("long").alias("total_pairs"),
        F.sum(F.col("t") * F.col("t") - F.col("s2")).cast("long").alias("cross_pairs"),
        waste_ppm_expr().alias("waste_ppm"),
    )


PACK_ATTENTION_SQL = f"""
WITH {_pack_cum_cte("ws")}, bins AS (
  SELECT shard, CAST((cum - n_tok) // {SEQ_LEN_TOK} AS BIGINT) AS bin_id,
         CAST(sum(n_tok) AS BIGINT) AS t,
         CAST(sum(n_tok * n_tok) AS BIGINT) AS s2
  FROM cum GROUP BY shard, CAST((cum - n_tok) // {SEQ_LEN_TOK} AS BIGINT)
)
SELECT shard,
       CAST(count(*) AS BIGINT) AS n_bins,
       CAST(sum(t * t) AS BIGINT) AS total_pairs,
       CAST(sum(t * t - s2) AS BIGINT) AS cross_pairs,
       CAST(sum(t * t - s2) * 1000000 // sum(t * t) AS BIGINT) AS waste_ppm
FROM bins
GROUP BY shard
"""


def pack_sorted_fill_stats_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill-rate audit of the LENGTH-SORTED packing layout (round 10) —
    :func:`pack_fill_stats_query` with ``by_length=True`` (the
    ``_pack_sequences_bpe_query`` wrapper pattern): longest-doc-first per
    shard, the distributed stand-in for length-grouped / best-fit packing
    (true FFD is inherently sequential; a sorted tape already puts
    same-length docs adjacent so late bins hold small docs and straddle
    less).  Same columns as ``doc_pack_fill_stats`` by construction."""
    return pack_fill_stats_query(spark, sf_dir, by_length=True)


PACK_SORTED_FILL_SQL = _pack_fill_sql(by_length=True)


QUERIES = {
    "doc_chunk_stats": (chunk_stats_query, CHUNK_SQL),
    "doc_chunk_dup_stats": (chunk_dup_stats_query, CHUNK_DUP_SQL),
    "doc_pack_sequences": (pack_sequences_query, PACK_SQL),
    "doc_pack_sequences_bpe": (_pack_sequences_bpe_query, _pack_sql("bpe")),
    "doc_mixture_plan": (mixture_plan_query, MIXTURE_SQL),
    "doc_pack_fill_stats": (pack_fill_stats_query, PACK_FILL_SQL),
    "doc_pack_attention_waste": (pack_attention_waste_query, PACK_ATTENTION_SQL),
    "doc_pack_sorted_fill_stats": (pack_sorted_fill_stats_query, PACK_SORTED_FILL_SQL),
}
