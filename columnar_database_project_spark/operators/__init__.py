"""Operator library: every query surface the engine supports.

Each submodule exposes ``QUERIES: dict[str, (spark, sf_dir) -> DataFrame]``
and ``ORACLES: dict[str, str]`` (ANSI SQL for DuckDB); the driver
contract in ``__spark_entry__.py`` merges them all.
"""

from __future__ import annotations


def all_queries():
    from columnar_database_project_spark.operators import (
        dedup,
        events,
        multimodal,
        relational,
        similarity,
        text,
    )

    q: dict = {}
    o: dict = {}
    # Order matters: the driver's correctness run checks entries in
    # registry order and may truncate on a time budget — put the
    # modules with the fewest proven-green rows first so every query
    # earns a hard-signal row before the long-proven relational tail.
    for mod in (dedup, similarity, multimodal, text, events, relational):
        dupes = set(q) & set(mod.QUERIES)
        if dupes:
            raise ValueError(f"duplicate query names: {dupes}")
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    return q, o
