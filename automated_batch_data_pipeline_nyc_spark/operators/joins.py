"""Join surface (SURVEY.md §2.6).

The reference never executes a join — its zone-lookup dimension is
co-loaded but the enrichment is latent.  The engine makes the full
surface first-class, with the physical strategy chosen for scale:

- ``broadcast_enrich``: the 265-row zone-lookup case.  Broadcasting the
  dim eliminates the fact-side shuffle entirely — at 100 TB this is the
  difference between a map-only stage and a full exchange of the fact
  table.
- ``equi_join``: sort-merge by default for two large inputs; AQE
  converts to broadcast at runtime if one side turns out small, and
  splits skewed partitions.
- semi/anti joins feed the quality gates ("rows lacking a zone").
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["equi_join", "broadcast_enrich", "semi_join", "anti_join", "range_join"]


def equi_join(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "inner",
) -> DataFrame:
    return left.join(right, on=on, how=how)


def broadcast_enrich(
    fact: DataFrame,
    dim: DataFrame,
    on: str | Sequence[str] | Column,
    how: str = "left",
) -> DataFrame:
    """Small-dimension enrichment with an explicit broadcast hint —
    the taxi-zone join the reference implies (README.md:3)."""
    return fact.join(F.broadcast(dim), on=on, how=how)


def semi_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """EXISTS — rows of *left* with a match."""
    return left.join(right, on=on, how="left_semi")


def anti_join(left: DataFrame, right: DataFrame, on: str | Sequence[str] | Column) -> DataFrame:
    """NOT EXISTS — quality-gate shape: facts lacking a dimension row."""
    return left.join(right, on=on, how="left_anti")


def range_join(
    left: DataFrame,
    right: DataFrame,
    condition: Column,
    broadcast_right: bool = True,
) -> DataFrame:
    """Theta/interval join (time-bucket-style matching).  Non-equi
    conditions execute as BNLJ; keep the bucket side broadcast-small so
    the big side never shuffles (SURVEY.md §2.6)."""
    r = F.broadcast(right) if broadcast_right else right
    return left.join(r, on=condition)
