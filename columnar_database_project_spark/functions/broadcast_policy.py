"""The broadcast-hint size-guard mechanism (DEPLOY.md policy).

Spark honors an explicit ``F.broadcast`` hint regardless of the
frame's actual size — AQE never demotes a hinted broadcast — so a
hint on a corpus-proportional frame is an executor/driver OOM at
100 TB even when it is correct and fast at test scale. The round-5
review's remaining gap was that nothing *mechanical* kept that class
of bug from regrowing: the policy lived in prose and per-site tests
only.

``bounded_broadcast`` is that mechanism. Every pipeline-operator hint
site routes through it and must STATE its bound (rows) and why the
frame cannot exceed it. In normal runs it is exactly ``F.broadcast``
— zero overhead. With ``SPARK_GRAFT_CHECK_BROADCAST_BOUNDS=1`` (set
in the policy test) it additionally COUNTS the frame and fails loudly
if the stated bound is violated, so a refactor that silently turns a
bounded frame corpus-proportional breaks the suite instead of
shipping.

Relational dimension-table hints (nation/region/supplier/1-row
scalar-subquery aggregates in ``operators/relational.py``) stay on
plain ``F.broadcast``: their bounds come from the TPC-H schema, not
from operator construction, which is the distinction DEPLOY.md draws.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CHECK_ENV = "SPARK_GRAFT_CHECK_BROADCAST_BOUNDS"


class BroadcastBoundExceeded(AssertionError):
    pass


def bounded_broadcast(df: DataFrame, bound: int, reason: str) -> DataFrame:
    """``F.broadcast(df)`` plus a declared row bound.

    ``bound``: the maximum row count this frame can have BY
    CONSTRUCTION (1 for global aggregates, a capacity constant, a
    signature-space size, ...). ``reason`` documents why — it is part
    of the call site's self-audit and appears in the failure message.

    The count check only runs under ``SPARK_GRAFT_CHECK_BROADCAST_
    BOUNDS=1``: it costs one extra job per call site, which the policy
    test pays once per operator and production never does.
    """
    if os.environ.get(CHECK_ENV) == "1":
        n = df.count()
        if n > bound:
            raise BroadcastBoundExceeded(
                f"broadcast bound violated: {n} rows > declared {bound} "
                f"({reason})"
            )
    return F.broadcast(df)
