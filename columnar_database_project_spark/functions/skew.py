"""Skew mitigation: salted joins.

AQE's skew-join handles most cases (enabled in session.py); explicit
salting is the manual fallback when one join key dominates (the
classic 100 TB failure mode: one hot key lands an entire shuffle
partition on one task). The hot-side rows are split across
``n_salts`` synthetic sub-keys; the small side is replicated once per
salt — turning 1 giant task into ``n_salts`` even ones at the cost of
replicating the small side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "_salt"


def salt_large_side(df: DataFrame, n_salts: int = 8) -> DataFrame:
    """Add a deterministic salt derived from the whole row (spreads a
    hot key's rows across n_salts sub-partitions)."""
    return df.withColumn(
        SALT_COL, F.pmod(F.hash(*[F.col(c) for c in df.columns]), F.lit(n_salts))
    )


def explode_small_side(df: DataFrame, n_salts: int = 8) -> DataFrame:
    """Replicate each row once per salt value."""
    salts = F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    return df.withColumn(SALT_COL, salts)


def salted_join(
    large: DataFrame,
    small: DataFrame,
    on: list[str] | str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join with the hot side salted: equivalent rows to
    ``large.join(small, on, how)`` but the shuffle spreads each join
    key over ``n_salts`` tasks.

    Join types that emit UNMATCHED rows of the replicated side
    (right/full outer) are refused: the small side exists ``n_salts``
    times in the salted plan, so its unmatched rows would duplicate
    — silently wrong output, not a performance question. Salt the
    other side instead, or use AQE's skew join for those shapes."""
    if how.replace("_", "").lower() in {
        "right", "rightouter", "full", "fullouter", "outer"
    }:
        raise ValueError(
            f"salted_join: how={how!r} would duplicate unmatched rows "
            "of the replicated small side; salt the other side or use "
            "AQE skew-join"
        )
    keys = [on] if isinstance(on, str) else list(on)
    big = salt_large_side(large, n_salts)
    rep = explode_small_side(small, n_salts)
    joined = big.join(rep, keys + [SALT_COL], how)
    return joined.drop(SALT_COL)
