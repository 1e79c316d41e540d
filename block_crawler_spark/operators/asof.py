"""As-of join — attach the most recent right-side row at-or-before each left row.

Spark has no native ASOF join; the idiomatic single-shuffle construction is
the union + windowed ``last(ignorenulls)`` sort-merge:

1. union both sides tagged, right payload packed into one struct column
   (NULL on left rows);
2. one window partitioned by the equi-keys, ordered by (order value, side)
   with right rows first on ties ("at-or-before" semantics);
3. ``last(payload, ignorenulls=True)`` up to the current row carries the
   latest right payload forward; keep left rows.

One shuffle on the equi-keys, no range explosion, no skew beyond the keys
themselves — at 100 TB this is the plan you want (a naive range join is
quadratic per key).  DuckDB's native ``ASOF JOIN`` serves as the oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    order_col: str,
    payload_cols: Sequence[str],
    payload_prefix: str = "asof_",
) -> DataFrame:
    """For each left row, the latest right row with ``right.order <= left.order``.

    ``on`` — equi-keys present on both sides; ``order_col`` — ordering column
    present on both sides; ``payload_cols`` — right-side columns to attach
    (emitted as ``{payload_prefix}{col}``, NULL when no right row precedes).
    """
    payload = F.struct(*[F.col(c).alias(c) for c in payload_cols])
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn("_payload", F.lit(None).cast(
        right.select(payload.alias("p")).schema["p"].dataType
    ))
    r_tagged = (
        right.withColumn("_side", F.lit(0))
        .withColumn("_payload", payload)
        .select(*on, order_col, "_side", "_payload")
    )
    # align columns: left keeps its full row; right contributes keys+order only
    for c in left.columns:
        if c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    # Final xxhash64(_payload) tiebreaker (ADVICE r1, asof.py:58): when the
    # right side has several rows at the same (on, order_col), `last()` must
    # not depend on shuffle arrival order — right-side ties resolve to the
    # max-hash payload, deterministically.  Left rows sort AFTER right rows
    # at an equal order_col (_side 1 > 0 — that ordering is what gives the
    # join its asof-≤ semantics), and their NULL payloads can never be
    # carried because ``last(..., ignorenulls=True)`` skips them — not
    # because of any sort position of NULL hashes.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col(order_col).asc(), F.col("_side").asc(), F.xxhash64(F.col("_payload")).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = unioned.withColumn("_carried", F.last("_payload", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1).drop("_side", "_payload")
    for c in payload_cols:
        out = out.withColumn(f"{payload_prefix}{c}", F.col(f"_carried.{c}"))
    return out.drop("_carried")
