"""Operator-inventory analogs over the ``events`` stream table.

Each query here exercises one family from SURVEY §2 with a driver-checkable
oracle: routing/classification (P-filters + T15), the version oracle (T14),
last-writer-wins folds (A1/A2, K5), additive ± balance folds (A3, K4/K7),
JSON extraction, tumbling windows (ST7), and the J2 full-outer
reconciliation shape.

Determinism rules: the total order is ``event_id`` (the stream's
attribute_version analog) — never raw ``ts``, whose nanosecond parquet
precision Spark truncates to µs while DuckDB keeps it; timestamps only ever
appear through ``date_trunc``; money flows through decimal casts; ratios are
integer ppm.

Output policy (round-2, VERDICT.md r1): emitted numeric columns are BIGINT
on both engines — money as fixed-point cents (exact: the decimal sum × 100
has zero fractional part before the cast), DuckDB CASE-sums and window sums
wrapped in CAST(... AS BIGINT) to defeat the HUGEINT→float64 pandas fetch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table


def _dec(col):
    return F.col(col).cast("decimal(18,2)")


def _cents(expr):
    return (expr * F.lit(100)).cast("long")


def classify_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3-P6 + T15 + T14: predicate routing, when/otherwise classification,
    and the padded-hex version oracle, on one scan."""
    e = load_table(spark, sf_dir, "events")
    return e.select(
        "event_id",
        "user_id",
        F.when(F.col("event_type") == "purchase", "mint")
        .when(F.col("event_type") == "error", "burn")
        .otherwise("transfer")
        .alias("transaction_type"),
        F.lpad(F.lower(F.hex(F.col("event_id"))), 40, "0").alias("version_hex"),
    )


CLASSIFY_SQL = """
SELECT event_id, user_id,
       CASE WHEN event_type = 'purchase' THEN 'mint'
            WHEN event_type = 'error' THEN 'burn'
            ELSE 'transfer' END AS transaction_type,
       lpad(lower(hex(event_id)), 40, '0') AS version_hex
FROM events
"""


def token_state_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 analog: per-user fold — net value of mint/burn flows, first/last
    event by the total order, event count (max_by/min_by on version)."""
    e = load_table(spark, sf_dir, "events")
    signed = (
        F.when(F.col("event_type") == "purchase", _dec("value"))
        .when(F.col("event_type") == "error", -_dec("value"))
        .otherwise(F.lit(0).cast("decimal(18,2)"))
    )
    return e.groupBy("user_id").agg(
        _cents(F.sum(signed).cast("decimal(38,2)")).alias("net_value"),
        F.min_by("event_type", "event_id").alias("first_event_type"),
        F.max_by("event_type", "event_id").alias("last_event_type"),
        F.count("*").alias("n_events"),
    )


TOKEN_STATE_SQL = """
SELECT user_id,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN CAST(value AS DECIMAL(18,2))
                     WHEN event_type = 'error' THEN -CAST(value AS DECIMAL(18,2))
                     ELSE CAST(0 AS DECIMAL(18,2)) END) * 100 AS BIGINT) AS net_value,
       arg_min(event_type, event_id) AS first_event_type,
       arg_max(event_type, event_id) AS last_event_type,
       COUNT(*) AS n_events
FROM events GROUP BY user_id
"""


def latest_by_version(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O3/K5 analog: last-writer-wins row per key by total order."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("event_id").desc())
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", _cents(_dec("value")).alias("value_cents"))
    )


LATEST_SQL = """
SELECT user_id, event_id, event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS value_cents
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn FROM events)
WHERE rn = 1
"""


def json_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 analog with JSON extraction: each event moves `value` from the
    counterparty (``props.k``) to the user; explode ± deltas, fold additive
    balances, drop zeros (K7/K8)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
        _dec("value").alias("v"),
    )
    deltas = e.select(
        F.explode(
            F.array(
                F.struct(F.col("user_id").alias("account"), F.col("v").alias("delta")),
                F.struct(F.col("k").alias("account"), (-F.col("v")).alias("delta")),
            )
        ).alias("d")
    ).select("d.account", "d.delta")
    return (
        deltas.groupBy("account")
        .agg(F.sum("delta").cast("decimal(38,2)").alias("balance_dec"))
        .filter(F.col("balance_dec") != 0)
        .select("account", _cents(F.col("balance_dec")).alias("balance"))
    )


JSON_BALANCES_SQL = """
WITH deltas AS (
  SELECT user_id AS account, CAST(value AS DECIMAL(18,2)) AS delta FROM events
  UNION ALL
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) AS account,
         -CAST(value AS DECIMAL(18,2)) AS delta FROM events
)
SELECT account, CAST(SUM(delta) * 100 AS BIGINT) AS balance
FROM deltas GROUP BY account
HAVING CAST(SUM(delta) AS DECIMAL(38,2)) <> 0
"""


def window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST7: tumbling 1-hour window aggregation (batch form of the streaming
    windowed agg; the foreachBatch tail reuses exactly this plan)."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type"))
        .agg(
            F.count("*").alias("n"),
            _cents(F.sum(_dec("value")).cast("decimal(38,2)")).alias("total_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )


WINDOW_SQL = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events GROUP BY 1, 2
"""


def full_outer_reconcile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2 shape: two independent per-user derivations, full-outer-joined;
    null sides become the two error classes, mismatches the third."""
    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").groupBy("user_id").agg(F.count("*").alias("n_purchases"))
    clicks = e.filter(F.col("event_type") == "click").groupBy("user_id").agg(F.count("*").alias("n_clicks"))
    j = purchases.join(clicks, "user_id", "full_outer")
    return j.select(
        "user_id",
        "n_purchases",
        "n_clicks",
        F.when(F.col("n_clicks").isNull(), "missing_in_db")
        .when(F.col("n_purchases").isNull(), "not_in_logs")
        .when(F.col("n_purchases") == F.col("n_clicks"), "count_match")
        .otherwise("count_mismatch")
        .alias("status"),
    )


RECONCILE_SQL = """
WITH p AS (SELECT user_id, COUNT(*) AS n_purchases FROM events WHERE event_type='purchase' GROUP BY 1),
     c AS (SELECT user_id, COUNT(*) AS n_clicks FROM events WHERE event_type='click' GROUP BY 1)
SELECT COALESCE(p.user_id, c.user_id) AS user_id, n_purchases, n_clicks,
       CASE WHEN n_clicks IS NULL THEN 'missing_in_db'
            WHEN n_purchases IS NULL THEN 'not_in_logs'
            WHEN n_purchases = n_clicks THEN 'count_match'
            ELSE 'count_mismatch' END AS status
FROM p FULL OUTER JOIN c ON p.user_id = c.user_id
"""


def sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows by 30-minute inactivity gap — the classic streaming
    session operator in its batch form (lag + cumulative sum over the
    per-user event sequence)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_micros(ts) div 1000000").alias("sec")
    )
    w = Window.partitionBy("user_id").orderBy("event_id")
    gap = F.when(
        (F.col("sec") - F.lag("sec", 1).over(w)) > 1800, 1
    ).otherwise(0)
    sess = e.withColumn("new_sess", gap).withColumn(
        "session_no", F.sum("new_sess").over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


SESSIONIZE_SQL = """
WITH seq AS (
  SELECT user_id, event_id, CAST(floor(epoch(ts)) AS BIGINT) AS sec,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT) - lag(CAST(floor(epoch(ts)) AS BIGINT), 1)
                   OVER (PARTITION BY user_id ORDER BY event_id) > 1800
              THEN 1 ELSE 0 END AS new_sess
  FROM events
),
sess AS (
  SELECT user_id, event_id,
         CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_no
  FROM seq
)
SELECT user_id, session_no, COUNT(*) AS n_events,
       MIN(event_id) AS first_event, MAX(event_id) AS last_event
FROM sess GROUP BY user_id, session_no
"""

def asof_last_signup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase attaches the user's most recent signup
    event at-or-before it (operators.asof — single-shuffle union+window;
    oracle = DuckDB's native ASOF JOIN)."""
    from ..operators.asof import asof_join

    e = load_table(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select("event_id", "user_id")
    signups = e.filter(F.col("event_type") == "signup").select(
        "user_id", "event_id", F.col("event_id").alias("signup_event_id")
    )
    out = asof_join(
        purchases,
        signups,
        on=["user_id"],
        order_col="event_id",
        payload_cols=["signup_event_id"],
    )
    return out.select("event_id", "user_id", F.col("asof_signup_event_id").alias("signup_event_id"))


ASOF_SQL = """
SELECT p.event_id, p.user_id, s.event_id AS signup_event_id
FROM (SELECT event_id, user_id FROM events WHERE event_type = 'purchase') p
ASOF LEFT JOIN (SELECT event_id, user_id FROM events WHERE event_type = 'signup') s
  ON p.user_id = s.user_id AND p.event_id >= s.event_id
"""

def value_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking-function family over a grouped aggregate: per event type, the
    top-5 users by net value with dense_rank + global rank + running count
    (ntile-free — ntile boundaries are engine-defined on ties)."""
    e = load_table(spark, sf_dir, "events")
    per_user = e.groupBy("event_type", "user_id").agg(
        _cents(F.sum(_dec("value")).cast("decimal(38,2)")).alias("total_cents")
    )
    w = Window.partitionBy("event_type").orderBy(F.col("total_cents").desc(), F.col("user_id").asc())
    # dense_rank orders by value ONLY, so ties share a rank (deterministic:
    # rank depends on the value alone); row_number adds the id tiebreak
    wd = Window.partitionBy("event_type").orderBy(F.col("total_cents").desc())
    return (
        per_user.withColumn("rnk", F.row_number().over(w))
        .withColumn("dense", F.dense_rank().over(wd))
        .filter(F.col("rnk") <= 5)
        .select("event_type", "user_id", "total_cents", "rnk", "dense")
    )


VALUE_RANK_SQL = """
WITH per_user AS (
  SELECT event_type, user_id, CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_cents
  FROM events GROUP BY event_type, user_id
)
SELECT event_type, user_id, total_cents, rnk, dense
FROM (
  SELECT *,
         row_number() OVER (PARTITION BY event_type ORDER BY total_cents DESC, user_id ASC) AS rnk,
         dense_rank() OVER (PARTITION BY event_type ORDER BY total_cents DESC) AS dense
  FROM per_user
)
WHERE rnk <= 5
"""


_SELECT_BUCKETS = 1024  # candidate sets in selection pass 3 are ~n/1024 rows


def _exact_rank_values(
    e: DataFrame, val: str, ranks: dict[str, str], group_col: str = "event_type"
) -> DataFrame:
    """Exact per-``group_col`` values of ``val`` at a SET of 1-based ranks of
    the sorted multiset — WITHOUT a per-type full sort.  ``ranks`` maps an
    output column name to a SQL expression over ``n`` (the group count),
    e.g. ``{"p50_cents": "(n * 50 + 99) div 100"}``.

    The naive rank-selection (``row_number`` over a per-type window) funnels
    each type's entire partition through one task's sort — a straggler by
    construction when there are few types (round-4 verdict).  This is the
    scale-safe two-pass bucketed selection instead:

    1. per-type ``(n, lo, hi)`` — one map-side-partial agg;
    2. per-(type, value-bucket) counts with width ``(hi-lo) div B + 1`` —
       output ≤ types × B rows; a window over that tiny frame locates each
       target rank's bucket and its preceding-row offset;
    3. only candidate-bucket rows (broadcast join on the bucket spec keeps
       everything else out of the shuffle) are ranked — the sort covers
       ~n/B rows per type × target, never the full partition.

    Heavy duplicate values collapse into one bucket and shrink the win
    (never the correctness); a fully constant type short-circuits on
    ``hi == lo`` and skips pass 3.  Ties need no id tiebreak: the value at
    a rank depends only on the sorted multiset.  Returns
    ``(event_type, n, <one column per rank label>)``.
    """
    B = _SELECT_BUCKETS
    labels = list(ranks)
    # r14 (guide §1.2): stats is BOUNDED (one row per group) but feeds
    # const, var_stats, the bucket-spec broadcast, the target explode and
    # the final n join — without a materialization point each consumer
    # re-ran the full input scan + agg (~6 scans per quantile query).
    # localCheckpoint pins the tiny frame once per invocation; the
    # corpus-sized `rows` below stays LIVE on purpose (recomputing two
    # scans beats materializing a corpus-sized frame at 100 TB).
    stats = e.groupBy(group_col).agg(
        F.count("*").alias("n"), F.min(val).alias("lo"), F.max(val).alias("hi")
    ).localCheckpoint()
    const = stats.filter(F.col("hi") == F.col("lo")).select(
        group_col, "n", *[F.col("lo").cast("long").alias(lb) for lb in labels]
    )
    var_stats = stats.filter(F.col("hi") != F.col("lo")).withColumn(
        "w", F.expr(f"(hi - lo) div {B} + 1")
    )
    rows = e.join(F.broadcast(var_stats.select(group_col, "lo", "w")), group_col).withColumn(
        "bkt", F.expr(f"({val} - lo) div w")
    )
    cum = (
        rows.groupBy(group_col, "bkt")
        .agg(F.count("*").alias("cnt"))
        .withColumn("cum", F.sum("cnt").over(Window.partitionBy(group_col).orderBy("bkt")))
        .withColumn("off", F.col("cum") - F.col("cnt"))
    )
    targets = var_stats.select(
        group_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lb).alias("which"),
                        F.expr(ranks[lb]).cast("long").alias("r"),
                    )
                    for lb in labels
                ]
            )
        ).alias("t"),
    ).select(group_col, "t.which", "t.r")
    spec = (
        targets.join(cum, group_col)
        .filter((F.col("off") < F.col("r")) & (F.col("r") <= F.col("cum")))
        .select(group_col, "which", "bkt", (F.col("r") - F.col("off")).alias("local_r"))
    )
    cand = rows.join(F.broadcast(spec), [group_col, "bkt"])
    wloc = Window.partitionBy(group_col, "which", "bkt").orderBy(F.col(val).asc())
    picked = cand.withColumn("rn", F.row_number().over(wloc)).filter(F.col("rn") == F.col("local_r"))
    varres = picked.groupBy(group_col).agg(
        *[F.max(F.when(F.col("which") == lb, F.col(val))).cast("long").alias(lb) for lb in labels]
    ).join(var_stats.select(group_col, "n"), group_col)
    return varres.select(group_col, "n", *labels).unionByName(const)


def _middle_rank_sum(e: DataFrame, val: str, out: str) -> DataFrame:
    """Exact ``value_at_rank((n+1)÷2) + value_at_rank((n+2)÷2)`` per
    event_type — i.e. exactly 2× the median in ``val``'s units — via
    :func:`_exact_rank_values`.  Returns ``(event_type, n, <out>)``."""
    two = _exact_rank_values(e, val, {"_r1": "(n + 1) div 2", "_r2": "(n + 2) div 2"})
    return two.select(
        "event_type", "n", (F.col("_r1") + F.col("_r2")).cast("long").alias(out)
    )


def value_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact median per event type (quantile family) without interpolation
    ambiguity: emit ``median2x`` = value-at-rank (n+1)÷2 plus value-at-rank
    (n+2)÷2 in cents — always exactly 2×median as a BIGINT, engine-
    independent (interpolating medians produce .5 fractions whose
    decimal/float handling differs between engines).  Selection runs via
    ``_middle_rank_sum``'s bucketed two-pass — no per-type full sort."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", _cents(_dec("value")).alias("cents")
    )
    return _middle_rank_sum(e, "cents", "median2x")


def outliers_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier counts: |value − median| > 3×MAD, entirely in
    exact integer space (anomaly-detection family).

    Doubled-rank medians sidestep interpolation: the type median lives in
    2× cents (``median2x``), absolute deviations in 2× space, and the MAD
    (median of those deviations) in 4× space (``mad4x``); the outlier test
    compares ``dev2x × 2 > 3 × mad4x`` — every quantity BIGINT, identical
    on both engines.  Both medians run through ``_middle_rank_sum``'s
    bucketed selection, so no per-type full sort anywhere in the plan."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", _cents(_dec("value")).alias("cents")
    )
    med = _middle_rank_sum(e, "cents", "median2x").select("event_type", "median2x")
    dev = e.join(F.broadcast(med), "event_type").withColumn(
        "dev2x", F.abs(F.col("cents") * 2 - F.col("median2x"))
    )
    mad = _middle_rank_sum(dev.select("event_type", "dev2x"), "dev2x", "mad4x").select(
        "event_type", "mad4x"
    )
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.max("median2x").alias("median2x"),
            F.max("mad4x").alias("mad4x"),
            F.count(F.when(F.col("dev2x") * 2 > 3 * F.col("mad4x"), 1)).alias("n_outliers"),
        )
    )


OUTLIERS_MAD_SQL = """
WITH e AS (
  SELECT event_type, event_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events
), c AS (
  SELECT event_type, COUNT(*) AS n FROM e GROUP BY event_type
), r1 AS (
  SELECT e.*, row_number() OVER (PARTITION BY event_type ORDER BY cents ASC, event_id ASC) AS rn FROM e
), med AS (
  SELECT r1.event_type,
         CAST(SUM(CASE WHEN c.n % 2 = 1 THEN cents * 2 ELSE cents END) AS BIGINT) AS median2x
  FROM r1 JOIN c USING (event_type)
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY r1.event_type
), dev AS (
  SELECT e.event_type, e.event_id, abs(e.cents * 2 - med.median2x) AS dev2x, med.median2x
  FROM e JOIN med USING (event_type)
), r2 AS (
  SELECT dev.*, row_number() OVER (PARTITION BY event_type ORDER BY dev2x ASC, event_id ASC) AS rn FROM dev
), mad AS (
  SELECT r2.event_type,
         CAST(SUM(CASE WHEN c.n % 2 = 1 THEN dev2x * 2 ELSE dev2x END) AS BIGINT) AS mad4x
  FROM r2 JOIN c USING (event_type)
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
  GROUP BY r2.event_type
)
SELECT dev.event_type, COUNT(*) AS n,
       CAST(MAX(dev.median2x) AS BIGINT) AS median2x,
       CAST(MAX(mad.mad4x) AS BIGINT) AS mad4x,
       COUNT(*) FILTER (WHERE dev2x * 2 > 3 * mad4x) AS n_outliers
FROM dev JOIN mad USING (event_type)
GROUP BY dev.event_type
"""


VALUE_MEDIAN_SQL = """
WITH e AS (
  SELECT event_type, event_id, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events
), c AS (
  SELECT event_type, COUNT(*) AS n FROM e GROUP BY event_type
), r AS (
  SELECT e.*, row_number() OVER (PARTITION BY event_type ORDER BY cents ASC, event_id ASC) AS rn FROM e
), m AS (
  SELECT r.event_type, r.cents, c.n FROM r JOIN c USING (event_type)
  WHERE rn = (n + 1) // 2 OR rn = (n + 2) // 2
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       CAST(SUM(CASE WHEN n % 2 = 1 THEN cents * 2 ELSE cents END) AS BIGINT) AS median2x
FROM m GROUP BY event_type
"""


EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def pivot_type_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: per-user event counts spread into one column per event type.

    The pivot value list is EXPLICIT — with an inferred list Spark runs an
    extra distinct job and the output schema depends on the data; the
    explicit list keeps the plan one-pass and the schema stable (and the
    oracle's FILTER columns provably aligned)."""
    e = load_table(spark, sf_dir, "events")
    p = e.groupBy("user_id").pivot("event_type", list(EVENT_TYPES)).count()
    out = p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES],
    )
    return out


PIVOT_SQL = """
SELECT user_id,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY user_id
"""


def salted_type_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-mitigated aggregation under the correctness gate: event totals
    per event_type — a 5-value key, i.e. a genuinely skewed aggregation key
    at scale — via ``operators.skew.salted_aggregate`` (two-phase: partials
    on (key, content-salt), final on key).  Must equal the plain GROUP BY
    the oracle runs; salting is a physical rewrite, never a semantic one.
    """
    from ..operators.skew import salted_aggregate

    e = load_table(spark, sf_dir, "events").select(
        "event_type", "event_id", _cents(_dec("value")).alias("cents")
    )
    out = salted_aggregate(e, ["event_type"], {"cents": "sum", "event_id": "max"}, salt_factor=8)
    return out.select(
        "event_type",
        F.col("sum_cents").cast("long").alias("total_cents"),
        F.col("max_event_id").alias("max_event_id"),
    )


SALTED_TOTALS_SQL = """
SELECT event_type,
       CAST(SUM(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)) AS BIGINT) AS total_cents,
       MAX(event_id) AS max_event_id
FROM events GROUP BY event_type
"""


QUERIES = {
    "evt_classify_route": (classify_route, CLASSIFY_SQL),
    "evt_salted_type_totals": (salted_type_totals, SALTED_TOTALS_SQL),
    "evt_value_rank": (value_rank, VALUE_RANK_SQL),
    "evt_value_median": (value_median, VALUE_MEDIAN_SQL),
    "evt_outliers_mad": (outliers_mad, OUTLIERS_MAD_SQL),
    "evt_pivot_type_counts": (pivot_type_counts, PIVOT_SQL),
    "join_asof_last_signup": (asof_last_signup, ASOF_SQL),
    "evt_token_state_fold": (token_state_fold, TOKEN_STATE_SQL),
    "evt_latest_by_version": (latest_by_version, LATEST_SQL),
    "evt_json_balances": (json_balances, JSON_BALANCES_SQL),
    "evt_window_hourly": (window_hourly, WINDOW_SQL),
    "evt_full_outer_reconcile": (full_outer_reconcile, RECONCILE_SQL),
    "evt_sessionize": (sessionize, SESSIONIZE_SQL),
}


# ---------------------------------------------------------------------------
# Exact multi-rank percentiles (round 5) — quantile family, scale-safe form
# ---------------------------------------------------------------------------

_PCTS = (25, 50, 75, 90, 99)


def value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank percentiles per event type: value at rank
    ``ceil(n·p/100)`` for p ∈ {25, 50, 75, 90, 99}, in BIGINT cents.  All
    five ranks are selected in ONE run of :func:`_exact_rank_values` —
    shared bucket histogram, one candidate-row pass — so the cost of five
    quantiles ≈ the cost of one.  Nearest-rank (no interpolation) keeps
    both engines bit-identical; the scale story is the bucketed selection's
    (no per-type full sort)."""
    e = load_table(spark, sf_dir, "events").select(
        "event_type", _cents(_dec("value")).alias("cents")
    )
    ranks = {f"p{p}_cents": f"(n * {p} + 99) div 100" for p in _PCTS}
    return _exact_rank_values(e, "cents", ranks)


def _percentiles_sql() -> str:
    picks = ",\n       ".join(
        f"MAX(CASE WHEN rn = (n * {p} + 99) // 100 THEN cents END) AS p{p}_cents"
        for p in _PCTS
    )
    return f"""
WITH e AS (
  SELECT event_type, CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents FROM events
), c AS (
  SELECT event_type, COUNT(*) AS n FROM e GROUP BY event_type
), r AS (
  SELECT e.event_type, e.cents, c.n,
         row_number() OVER (PARTITION BY e.event_type ORDER BY e.cents) AS rn
  FROM e JOIN c USING (event_type)
)
SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
       {picks}
FROM r GROUP BY event_type
"""


QUERIES["evt_value_percentiles"] = (value_percentiles, _percentiles_sql())
# place the new quantile query beside its median/MAD siblings in insertion
# order: prefix samplers (the driver checks the first 50 registry entries)
# should certify the never-sampled newcomer rather than a long-green query
_order = list(QUERIES)
_order.insert(_order.index("evt_outliers_mad") + 1, _order.pop(_order.index("evt_value_percentiles")))
QUERIES = {k: QUERIES[k] for k in _order}


SKEW_TOPK = 20


def key_skew_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew audit over the events stream: the top-20 heaviest
    user_id keys with their row counts and per-key share of all events
    (ppm).  This is the measurement that DECIDES the skew treatment — the
    two-phase salted aggregation (operators/skew.py) and AQE skew-join
    splitting only pay for themselves when a few keys actually dominate;
    run this first, salt second (the reference has no such surface; public
    Spark skew practice, e.g. AQE's skewJoin thresholds, is the model).

    Scale shape: one hash-agg shuffle on the key (map-side partials), the
    top-20 via orderBy().limit() → TakeOrderedAndProject, a rank window
    over only those ≤20 survivors, and a 1-row total broadcast.  All
    emitted numerics BIGINT."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("user_id").agg(F.count("*").cast("long").alias("n_events"))
    top = per.orderBy(F.desc("n_events"), F.asc("user_id")).limit(SKEW_TOPK)
    w = Window.orderBy(F.desc("n_events"), F.asc("user_id"))  # ≤20 rows post-limit
    total = ev.agg(F.count("*").cast("long").alias("total_events"))
    return (
        top.withColumn("rank", F.row_number().over(w))
        .crossJoin(F.broadcast(total))
        .select(
            "rank",
            "user_id",
            "n_events",
            F.expr("CAST(n_events * 1000000 DIV total_events AS BIGINT)").alias("share_ppm"),
        )
    )


KEY_SKEW_SQL = f"""
WITH per AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_events FROM events GROUP BY user_id
), top AS (
  SELECT user_id, n_events FROM per ORDER BY n_events DESC, user_id ASC LIMIT {SKEW_TOPK}
), tot AS (SELECT CAST(count(*) AS BIGINT) AS total_events FROM events)
SELECT row_number() OVER (ORDER BY n_events DESC, user_id ASC) AS rank,
       user_id, n_events,
       CAST(n_events * 1000000 // total_events AS BIGINT) AS share_ppm
FROM top, tot
"""


QUERIES["evt_key_skew_topk"] = (key_skew_topk, KEY_SKEW_SQL)


def funnel_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel analysis — signup → view → purchase, each stage
    strictly AFTER the previous one in the user's event sequence (event_id
    is the sequence key, as in ``evt_sessionize``): per-stage user counts
    and the conversion rate from the previous stage (ppm).  The classic
    product-analytics operator the events surface was missing.

    Scale shape: three user_id hash-aggs chained by two user_id equi-joins
    — ONE key partitioning reused end-to-end (no window over the event
    stream, no per-user collect); output is 3 rows."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_id", "event_type")
    # r14 (guide §1.2): s feeds both the v-chain and its own count branch,
    # v feeds both the p-chain and its count — without a materialization
    # point each branch re-ran the upstream filter+agg (events scanned 6×
    # per invocation, measured 4.8 s vs 2.3 at sf0.1).  localCheckpoint —
    # not cache() — so the per-user frames are ContextCleaner-collectable
    # and nothing pins per invocation (the funnel_latency lat precedent).
    s = e.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("event_id").alias("s_id")
    ).localCheckpoint()
    v = (
        e.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("event_id") > F.col("s_id"))
        .groupBy("user_id")
        .agg(F.min("event_id").alias("v_id"))
    ).localCheckpoint()
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("event_id") > F.col("v_id"))
        .groupBy("user_id")
        .agg(F.min("event_id").alias("p_id"))
    )
    counts = (
        s.agg(F.count("*").alias("n")).select(F.lit(1).alias("stage"), F.lit("signup").alias("funnel_stage"), "n")
        .unionByName(v.agg(F.count("*").alias("n")).select(F.lit(2).alias("stage"), F.lit("signup>view").alias("funnel_stage"), "n"))
        .unionByName(p.agg(F.count("*").alias("n")).select(F.lit(3).alias("stage"), F.lit("signup>view>purchase").alias("funnel_stage"), "n"))
    )
    # lag window over 3 rows — bounded by construction
    return counts.select(
        F.col("stage").cast("long").alias("stage"),
        "funnel_stage",
        F.col("n").cast("long").alias("n_users"),
        F.expr("CAST(n * 1000000 DIV lag(n, 1, n) OVER (ORDER BY stage) AS BIGINT)").alias("conv_ppm"),
    )


FUNNEL_SQL = """
WITH s AS (
  SELECT user_id, MIN(event_id) AS s_id FROM events WHERE event_type = 'signup' GROUP BY user_id
), v AS (
  SELECT e.user_id, MIN(e.event_id) AS v_id
  FROM events e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.event_id > s.s_id
  GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.event_id) AS p_id
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.event_id > v.v_id
  GROUP BY e.user_id
), counts AS (
  SELECT 1 AS stage, 'signup' AS funnel_stage, CAST(count(*) AS BIGINT) AS n FROM s
  UNION ALL SELECT 2, 'signup>view', CAST(count(*) AS BIGINT) FROM v
  UNION ALL SELECT 3, 'signup>view>purchase', CAST(count(*) AS BIGINT) FROM p
)
SELECT CAST(stage AS BIGINT) AS stage, funnel_stage, n AS n_users,
       CAST(n * 1000000 // lag(n, 1, n) OVER (ORDER BY stage) AS BIGINT) AS conv_ppm
FROM counts
"""


QUERIES["evt_funnel_counts"] = (funnel_counts, FUNNEL_SQL)


def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day (their
    cohort), counted on each later activity day as an offset from the
    cohort day — the analytics table behind every retention curve.

    Scale shape: per-user min-day agg (one user_id shuffle) joined back to
    the distinct (user, day) activity set (same key), then a bounded
    (cohort, offset) hash-agg — days² keys at most.  Dates emit as strings
    (the driver hash contract)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    )
    first = e.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = e.distinct()
    return (
        active.join(first, "user_id")
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            F.datediff(F.col("day"), F.col("cohort_day")).cast("long").alias("day_offset"),
        )
        .agg(F.count("*").cast("long").alias("n_users"))
    )


RETENTION_SQL = """
WITH e AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day FROM events
), first AS (
  SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY user_id
), active AS (
  SELECT DISTINCT user_id, day FROM e
)
SELECT CAST(cohort_day AS VARCHAR) AS cohort_day,
       CAST(day - cohort_day AS BIGINT) AS day_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM active JOIN first USING (user_id)
GROUP BY 1, 2
"""


QUERIES["evt_retention_cohorts"] = (retention_cohorts, RETENTION_SQL)


# ---------------------------------------------------------------------------
# Funnel latency percentiles (time-to-convert per transition)
# ---------------------------------------------------------------------------

_LAT_PCTS = (50, 90, 99)


def funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert percentiles per funnel transition: for each user the
    first signup, the first view strictly AFTER it, and the first purchase
    strictly after that (second-granularity ordering — both engines floor
    the ns timestamp to epoch seconds, so the µs-vs-ns storage gap can't
    bite), then exact nearest-rank p50/p90/p99 of the three latencies.
    Answers the question ``evt_funnel_counts`` (volumes) can't: not how
    many convert, but how LONG conversion takes at the tail.

    Scale shape: three user_id hash-aggs chained by same-key equi-joins
    (the funnel shape), then the shared scale-safe bucketed rank selection
    (:func:`_exact_rank_values`) — per-transition counts never funnel
    through one task's sort."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("ts_s")
    )
    # r14 (guide §1.2): same re-execution fix as funnel_counts — s and v
    # each feed two branches, and p fed TWO union arms; checkpoint the
    # per-user frames and emit p's two transitions from ONE pass via
    # explode (verified row-identical at sf0.1)
    s = e.filter(F.col("event_type") == "signup").groupBy("user_id").agg(
        F.min("ts_s").alias("s_ts")
    ).localCheckpoint()
    v = (
        e.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts_s") > F.col("s_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("v_ts"), F.first("s_ts").alias("s_ts"))
    ).localCheckpoint()
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts_s") > F.col("v_ts"))
        .groupBy("user_id")
        .agg(F.min("ts_s").alias("p_ts"), F.first("v_ts").alias("v_ts"), F.first("s_ts").alias("s_ts"))
    )
    p_lat = p.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("view>purchase").alias("transition"),
                    (F.col("p_ts") - F.col("v_ts")).cast("long").alias("lat_s"),
                ),
                F.struct(
                    F.lit("signup>purchase").alias("transition"),
                    (F.col("p_ts") - F.col("s_ts")).cast("long").alias("lat_s"),
                ),
            )
        ).alias("t")
    ).select("t.transition", "t.lat_s")
    lat = (
        v.select(F.lit("signup>view").alias("transition"), (F.col("v_ts") - F.col("s_ts")).cast("long").alias("lat_s"))
        .unionByName(p_lat)
    )
    # the rank selection scans its input three times (stats, buckets,
    # candidates); without a materialization point each scan would re-run
    # the whole funnel join chain (51 exchanges captured vs the expected
    # ~9).  localCheckpoint — not cache() — so the block is ContextCleaner-
    # collectable and nothing pins per invocation (the repo's leak rule).
    lat = lat.localCheckpoint()
    ranks = {f"p{pp}_s": f"(n * {pp} + 99) div 100" for pp in _LAT_PCTS}
    return _exact_rank_values(lat, "lat_s", ranks, group_col="transition").select(
        "transition", "n", *[f"p{pp}_s" for pp in _LAT_PCTS]
    )


def _funnel_latency_sql() -> str:
    picks = ",\n       ".join(
        f"CAST(MAX(CASE WHEN rn = (n * {p} + 99) // 100 THEN lat_s END) AS BIGINT) AS p{p}_s"
        for p in _LAT_PCTS
    )
    return f"""
WITH ev AS (
  SELECT user_id, event_type, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s FROM events
), s AS (
  SELECT user_id, MIN(ts_s) AS s_ts FROM ev WHERE event_type = 'signup' GROUP BY user_id
), v AS (
  SELECT e.user_id, MIN(e.ts_s) AS v_ts, MIN(s.s_ts) AS s_ts
  FROM ev e JOIN s ON s.user_id = e.user_id
  WHERE e.event_type = 'view' AND e.ts_s > s.s_ts GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts_s) AS p_ts, MIN(v.v_ts) AS v_ts, MIN(v.s_ts) AS s_ts
  FROM ev e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts_s > v.v_ts GROUP BY e.user_id
), lat AS (
  SELECT 'signup>view' AS transition, v_ts - s_ts AS lat_s FROM v
  UNION ALL SELECT 'view>purchase', p_ts - v_ts FROM p
  UNION ALL SELECT 'signup>purchase', p_ts - s_ts FROM p
), c AS (
  SELECT transition, COUNT(*) AS n FROM lat GROUP BY transition
), r AS (
  SELECT lat.transition, lat.lat_s, c.n,
         row_number() OVER (PARTITION BY lat.transition ORDER BY lat.lat_s) AS rn
  FROM lat JOIN c USING (transition)
)
SELECT transition, CAST(MAX(n) AS BIGINT) AS n,
       {picks}
FROM r GROUP BY transition
"""


QUERIES["evt_funnel_latency"] = (funnel_latency, _funnel_latency_sql())


# ---------------------------------------------------------------------------
# Sliding (overlapping) windows — the tumbling query's hopping sibling
# ---------------------------------------------------------------------------

def window_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping 2-hour windows sliding by 1 hour via Spark's native
    ``F.window`` (each event lands in exactly two windows) — the overlap
    form the tumbling ``evt_window_hourly`` can't express, and the same
    expression a streaming plan would use with a watermark in front.
    The oracle replays the hop by double-emitting each row at its hour
    floor and the hour before (the definition of a 2h/1h hop for
    epoch-aligned windows).

    Scale shape: one hash-agg whose input is exactly 2× the scan (the hop
    factor, a constant) — keys bounded by hours × event types."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            _cents(F.sum(_dec("value")).cast("decimal(38,2)")).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )


WINDOW_SLIDING_SQL = """
WITH hopped AS (
  SELECT date_trunc('hour', ts) - k * INTERVAL 1 HOUR AS window_start, event_type, value
  FROM events, unnest([0, 1]) AS t(k)
)
SELECT window_start, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value
FROM hopped GROUP BY 1, 2
"""


QUERIES["evt_window_sliding"] = (window_sliding, WINDOW_SLIDING_SQL)


# ---------------------------------------------------------------------------
# Event-type Markov transition matrix (sequence modeling over user streams)
# ---------------------------------------------------------------------------

def markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition counts over each user's event-type
    sequence (ordered by the ``event_id`` total order): for every
    consecutive (prev_type → type) pair, the count and the transition
    probability in ppm of all transitions LEAVING prev_type — the
    sequence-model view of user behavior (what follows what) that the
    per-type aggregates can't express.

    Scale shape: one user-partitioned lag window (shuffle on user_id — the
    partition carries one user's events, never a global sort), then a
    ≤|types|²-key hash-agg and a ≤|types|-row marginal re-join."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("event_id")
    steps = (
        e.select("user_id", "event_id", "event_type")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .filter(F.col("prev_type").isNotNull())
    )
    cm = steps.groupBy("prev_type", F.col("event_type").alias("next_type")).agg(
        F.count("*").cast("long").alias("n")
    )
    out_tot = cm.groupBy("prev_type").agg(F.sum("n").alias("out_total"))
    return cm.join(out_tot, "prev_type").select(
        "prev_type",
        "next_type",
        "n",
        F.col("out_total").cast("long").alias("out_total"),
        F.expr("CAST(n * 1000000 DIV out_total AS BIGINT)").alias("prob_ppm"),
    )


MARKOV_SQL = """
WITH steps AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id ORDER BY event_id) AS prev_type
  FROM events
), cm AS (
  SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
  FROM steps WHERE prev_type IS NOT NULL GROUP BY prev_type, event_type
), tot AS (
  SELECT prev_type, CAST(sum(n) AS BIGINT) AS out_total FROM cm GROUP BY prev_type
)
SELECT cm.prev_type, cm.next_type, cm.n, tot.out_total,
       CAST(cm.n * 1000000 // tot.out_total AS BIGINT) AS prob_ppm
FROM cm JOIN tot USING (prev_type)
"""


QUERIES["evt_markov_transitions"] = (markov_transitions, MARKOV_SQL)


# ---------------------------------------------------------------------------
# CUBE aggregation (all grouping-set combinations in one pass)
# ---------------------------------------------------------------------------

def cube_type_day(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, weekday): counts and value totals at ALL four
    grouping levels — (type, day), (type), (day), grand total — in one scan
    (the grouping-sets capability `agg_rollup_region_nation` only exercises
    as a hierarchy).  Subtotals surface via '<ALL>' sentinels; weekday is
    an integer-exact derivation (epoch-day mod 7) identical on both
    engines, sidestepping locale-dependent day-name functions.

    Scale shape: Spark expands CUBE to a 4× row replication feeding ONE
    hash-agg (constant fan-out, map-side partials) — keys bounded by
    (types+1) × 8."""
    e = load_table(spark, sf_dir, "events")
    # epoch-day mod 7 (1970-01-01 was a Thursday; the label is just a bucket)
    wd = F.expr("CAST(floor(unix_timestamp(ts) / 86400) % 7 AS BIGINT)")
    return (
        e.select("event_type", wd.alias("wd"), F.col("value"))
        .cube("event_type", "wd")
        .agg(
            F.count("*").alias("n"),
            _cents(F.sum(_dec("value")).cast("decimal(38,2)")).alias("total_value"),
        )
        .select(
            F.coalesce(F.col("event_type"), F.lit("<ALL>")).alias("event_type"),
            F.coalesce(F.col("wd").cast("string"), F.lit("<ALL>")).alias("weekday"),
            "n",
            "total_value",
        )
    )


CUBE_SQL = """
SELECT COALESCE(event_type, '<ALL>') AS event_type,
       COALESCE(CAST(wd AS VARCHAR), '<ALL>') AS weekday,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) * 100 AS BIGINT) AS total_value
FROM (
  SELECT event_type,
         CAST(floor(floor(epoch(ts)) / 86400) % 7 AS BIGINT) AS wd,
         value
  FROM events
)
GROUP BY CUBE (event_type, wd)
"""


QUERIES["evt_cube_type_day"] = (cube_type_day, CUBE_SQL)


# ---------------------------------------------------------------------------
# Event-rate spike detection: trailing-baseline anomaly screen (round 10)
# ---------------------------------------------------------------------------

SPIKE_TRAIL = 24  # trailing OBSERVED hours in the baseline frame
SPIKE_WARMUP = 12  # minimum trailing hours before a spike can be called
SPIKE_MULT = 3  # spike: count > MULT × trailing mean


def rate_spikes_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-rate SPIKE screen: per (event_type, hour), the count against a
    trailing baseline of the previous ``SPIKE_TRAIL`` observed hourly
    buckets — flagged when the hour runs ``SPIKE_MULT``× over the trailing
    mean with at least ``SPIKE_WARMUP`` hours of history (no flag during
    cold start).  The monitoring query an ingest pipeline runs over its
    own event stream: a bot burst, a replayed feed, or a collector bug
    shows up as a spike long before it distorts downstream aggregates.
    The comparison is the integer cross-multiplication
    ``n · trail_n > MULT · trail_sum`` — exact, no mean rounding at all.

    ROWS (not RANGE) framing is deliberate: the baseline is the previous
    24 OBSERVED buckets, so a silent gap doesn't thin the baseline —
    identical semantics on both engines.

    Scale shape: one (type, hour)-keyed hash agg (map-side partials) —
    output \\|types\\|·\\|hours\\| rows, tiny next to the event stream — then a
    per-type ordered window over that bounded frame (partitionBy type ⇒
    hash exchange on the type key, never a single-partition sort)."""
    e = load_table(spark, sf_dir, "events")
    hourly = e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"), F.col("event_type")
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("hour").rowsBetween(-SPIKE_TRAIL, -1)
    return hourly.select(
        "event_type",
        "hour",
        "n",
        F.coalesce(F.sum("n").over(w), F.lit(0)).cast("long").alias("trail_sum"),
        F.count("n").over(w).cast("long").alias("trail_n"),
    ).withColumn(
        "is_spike",
        F.expr(f"trail_n >= {SPIKE_WARMUP} AND n * trail_n > {SPIKE_MULT} * trail_sum"),
    )


RATE_SPIKES_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', ts) AS hour, event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, hour, CAST(n AS BIGINT) AS n,
       CAST(COALESCE(SUM(n) OVER w, 0) AS BIGINT) AS trail_sum,
       CAST(COUNT(n) OVER w AS BIGINT) AS trail_n,
       (COUNT(n) OVER w >= {SPIKE_WARMUP}
        AND n * COUNT(n) OVER w > {SPIKE_MULT} * COALESCE(SUM(n) OVER w, 0)) AS is_spike
FROM hourly
WINDOW w AS (PARTITION BY event_type ORDER BY hour ROWS BETWEEN {SPIKE_TRAIL} PRECEDING AND 1 PRECEDING)
"""


QUERIES["evt_rate_spikes"] = (rate_spikes_query, RATE_SPIKES_SQL)


# ONE source of truth for the attribution window (ADVICE r12): the Spark
# interval string is DERIVED from the seconds constant the oracle embeds,
# so editing the window can never desynchronize query and oracle
ATTRIB_INTERVAL_S = 21_600  # 6 hours
ATTRIB_INTERVAL = f"{ATTRIB_INTERVAL_S} seconds"


def attribution_interval_join_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH twin of ``streaming.windows.stream_interval_join`` — the same
    function on batch frames (the fn skips watermarks off-stream), so the
    oracle-checked batch result IS the semantics the watermarked
    stream-stream join is equality-tested against in
    tests/test_streaming.py: every purchase joined to the same user's
    clicks from the preceding ``ATTRIB_INTERVAL``.  Emits ids + the lag in
    whole seconds (BIGINT — raw timestamps never cross the driver's hash
    contract).

    Scale shape (batch): an equi-join on user_id with the interval
    predicate as a residual filter — collision-priced by the per-user
    purchase×click product inside the window, never a cross join; on a
    stream the same predicate is what bounds the join state
    (O(rate × (interval + watermark)))."""
    from ..streaming.windows import stream_interval_join

    events = load_table(spark, sf_dir, "events")
    joined = stream_interval_join(
        events.filter(F.col("event_type") == "purchase"),
        events.filter(F.col("event_type") == "click"),
        interval=ATTRIB_INTERVAL,
    )
    return joined.select(
        "user_id",
        F.col("l_id").alias("purchase_id"),
        F.col("r_id").alias("click_id"),
        F.expr("CAST(unix_timestamp(l_ts) - unix_timestamp(r_ts) AS BIGINT)").alias("lag_s"),
    )


ATTRIB_SQL = f"""
SELECT p.user_id,
       p.event_id AS purchase_id,
       c.event_id AS click_id,
       CAST(floor(epoch(p.ts)) - floor(epoch(c.ts)) AS BIGINT) AS lag_s
FROM events p
JOIN events c
  ON c.user_id = p.user_id
 AND p.event_type = 'purchase' AND c.event_type = 'click'
 AND c.ts >= p.ts - INTERVAL {ATTRIB_INTERVAL_S} SECOND
 AND c.ts <= p.ts
 AND c.event_id <> p.event_id
"""


QUERIES["evt_attribution_interval_join"] = (attribution_interval_join_query, ATTRIB_SQL)
