"""Generate a larger scale factor by k-fold replication of an existing
testdata directory — the third point for the bench scaling curve.

Each copy i offsets every entity-key column by ``(max(key)+1) * i``,
with one shared offset per key DOMAIN (custkey/orderkey/partkey/
suppkey/user_id/...) so foreign keys keep referencing the copy they
came from: copy-2 orders point at copy-2 customers, and per-key
cardinalities (orders per customer, lineitems per order, events per
user) match the source distribution exactly. Fixed-size dimensions
(nation, region) are copied once — they do not scale with SF in TPC-H
either.

Usage:  python tools/make_scale_replica.py SRC_DIR DST_DIR K
        (idempotent: skips when DST_DIR already has a lineitem file)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key-domain → (table that owns the domain, column holding it there)
KEY_DOMAINS = {
    "custkey": ("customer", "c_custkey"),
    "orderkey": ("orders", "o_orderkey"),
    "partkey": ("part", "p_partkey"),
    "suppkey": ("supplier", "s_suppkey"),
    "user": ("events", "user_id"),
    "event": ("events", "event_id"),
    "doc": ("documents", "doc_id"),
    "vec": ("embeddings", "vec_id"),
}

# table → {column: key-domain}; every listed column is offset per copy
OFFSET_COLUMNS = {
    "customer": {"c_custkey": "custkey"},
    "supplier": {"s_suppkey": "suppkey"},
    "part": {"p_partkey": "partkey"},
    "orders": {"o_orderkey": "orderkey", "o_custkey": "custkey"},
    "lineitem": {
        "l_orderkey": "orderkey",
        "l_partkey": "partkey",
        "l_suppkey": "suppkey",
    },
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "vec"},
}

COPY_ONCE = ("nation", "region")


def _domain_bases(src: str) -> dict[str, int]:
    bases: dict[str, int] = {}
    for dom, (table, col) in KEY_DOMAINS.items():
        path = os.path.join(src, f"{table}.parquet")
        t = pq.read_table(path, columns=[col])
        bases[dom] = int(pc.max(t[col]).as_py()) + 1
    return bases


def replicate(src: str, dst: str, k: int) -> None:
    if os.path.exists(os.path.join(dst, "lineitem.parquet")):
        return
    os.makedirs(dst, exist_ok=True)
    bases = _domain_bases(src)
    for name in COPY_ONCE:
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        pq.write_table(t, os.path.join(dst, f"{name}.parquet"))
    for name, cols in OFFSET_COLUMNS.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        copies = [t]
        for i in range(1, k):
            arrays = []
            for field in t.schema:
                col = t[field.name]
                if field.name in cols:
                    off = bases[cols[field.name]] * i
                    col = pc.add(col, pa.scalar(off, type=field.type))
                arrays.append(col)
            copies.append(pa.table(arrays, schema=t.schema))
        pq.write_table(
            pa.concat_tables(copies), os.path.join(dst, f"{name}.parquet")
        )


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".bench_data",
        "sf0.5",
    )
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    replicate(src, dst, k)
    print(dst)


if __name__ == "__main__":
    main()
