"""Skew mitigation: salted joins for pathological hot keys.

AQE's skew-join splitting (enabled in ``session.get_spark``) handles most
skew at runtime, but an *extreme* hot key — one NFT collection receiving
half of all transfers, one zero-address account in a balance join — can
still bottleneck a single task when AQE's split granularity runs out, or
when the join is hash- rather than sort-merge-based.  Classic fix: salt.

``salted_join`` replicates the *small/right* side ``salt_factor`` times and
adds a uniform salt to the big side's key, turning one hot partition into
``salt_factor`` even ones.  The salt is derived from stable row content
(xxhash64 of all left columns), not ``rand()``, so plans stay deterministic
and retry-safe — the same property the engine's version-guarded sinks rely
on.

``salted_aggregate`` is two-phase group-by for skewed aggregation keys:
partial aggregate on (key, salt), final on key.  (For algebraic aggregates
Spark's map-side partial aggregation already does this; the explicit form
exists for aggregation via ``collect_list``/UDAF-ish shapes where partials
don't apply automatically.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _content_salt(df: DataFrame, salt_factor: int) -> Column:
    return F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_factor)).cast("int")


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big side salted and the small side replicated.

    Equivalent to ``big.join(small, on, how)`` for how ∈ {inner, left} but
    with hot keys spread over ``salt_factor`` partitions.  The small side
    grows ×salt_factor — keep it dimension-sized.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    salted_big = big.withColumn("_salt", _content_salt(big, salt_factor))
    replicated = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_factor)]))
    )
    out = salted_big.join(replicated, [*on, "_salt"], how)
    return out.drop("_salt")


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, str],
    salt_factor: int = 8,
) -> DataFrame:
    """Two-phase aggregation over a salted key: (key, salt) partials → final.

    ``aggs`` maps column → one of sum/count/min/max (the algebraic set that
    composes across phases).
    """
    fns = {"sum": F.sum, "min": F.min, "max": F.max}
    salted = df.withColumn("_salt", _content_salt(df, salt_factor))
    partial_exprs = []
    final_exprs = []
    for col, fn in aggs.items():
        if fn == "count":
            partial_exprs.append(F.count(col).alias(f"_p_{col}"))
            final_exprs.append(F.sum(f"_p_{col}").alias(f"{fn}_{col}"))
        elif fn in fns:
            partial_exprs.append(fns[fn](col).alias(f"_p_{col}"))
            final_exprs.append(fns[fn](f"_p_{col}").alias(f"{fn}_{col}"))
        else:
            raise ValueError(f"unsupported aggregate {fn}")
    partial = salted.groupBy(*keys, "_salt").agg(*partial_exprs)
    return partial.groupBy(*keys).agg(*final_exprs)
