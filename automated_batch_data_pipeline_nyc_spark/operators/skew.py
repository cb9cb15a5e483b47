"""Skew mitigation: salted joins and two-stage aggregation.

AQE's skew-join splitting (on by default in the engine session) handles
most runtime skew; these operators are the *explicit* tools for the
cases AQE can't see — a known-hot key in a broadcast-ineligible join,
or a high-cardinality distinct-style aggregation landing on few keys.

Scale notes:
- ``salted_join`` spreads one hot key over ``salt_buckets`` reducer
  partitions: the big side gets a per-row salt in [0, B), the small
  side is replicated B times (explode of a B-element literal array —
  B x |small| rows, which is the explicit cost of the technique), and
  the join key becomes (key, salt).  Result is exactly the plain equi
  join, independent of the salt values.
- ``salted_two_stage_agg`` pre-aggregates on (key, salt) — bounding any
  single reducer's input to ~1/B of the hot key — then combines the
  partials.  Only decomposable aggregates (count/sum/min/max) qualify;
  the API takes them by name so a non-decomposable request fails
  loudly instead of silently double-counting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["salted_join", "salted_two_stage_agg"]


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    how: str = "inner",
    salt_buckets: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Equi join with the key salted over ``salt_buckets`` partitions.

    Supported ``how``: inner / left (the big side drives row
    multiplicity; right/full would need the salt on the other side).
    """
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salts = F.array(*[F.lit(i) for i in range(salt_buckets)])
    b = big.withColumn("__salt", F.floor(F.rand(seed) * salt_buckets).cast("int"))
    s = small.withColumn("__salt", F.explode(salts))
    out = b.join(s, on=[on, "__salt"], how=how)
    return out.drop("__salt")


def salted_two_stage_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, str]],
    salt_buckets: int = 16,
    seed: int = 42,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``aggs`` maps output column -> (fn, input column) with fn in
    {count, sum, min, max}.  Stage 1 aggregates on (keys + salt);
    stage 2 combines partials (count -> sum of partial counts, sum ->
    sum, min -> min, max -> max).
    """
    combiners = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    firsts = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    for name, (fn, _) in aggs.items():
        if fn not in combiners:
            raise ValueError(
                f"{name}: {fn!r} is not decomposable across salt partitions "
                "(supported: count/sum/min/max)"
            )
    salted = df.withColumn(
        "__salt", F.floor(F.rand(seed) * salt_buckets).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[firsts[fn](col).alias(f"__p_{name}") for name, (fn, col) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            combiners[fn](f"__p_{name}").alias(name)
            for name, (fn, _) in aggs.items()
        ]
    )
