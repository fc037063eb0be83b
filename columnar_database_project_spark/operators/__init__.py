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
        selection,
        similarity,
        sketch,
        text,
    )

    q: dict = {}
    o: dict = {}
    for mod in (
        dedup,
        events,
        multimodal,
        relational,
        selection,
        similarity,
        sketch,
        text,
    ):
        dupes = set(q) & set(mod.QUERIES)
        if dupes:
            raise ValueError(f"duplicate query names: {dupes}")
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    return q, o
