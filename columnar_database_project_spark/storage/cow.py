"""Block-granular copy-on-write DML over a ManifestStore.

The engine's directory-granular DML verbs (engine.delete_where /
update_where / merge_into) rewrite the WHOLE table per op — correct,
but the cost scales with table size. These verbs scale with CHANGE
size: the zone-map index (plus the Bloom sidecar when attached) triages
every block of the current manifest into

- **carried** — the predicate PROVABLY matches no row (three-valued
  may_match == False): the block file enters the next manifest by
  reference, zero bytes moved;
- **touched** — everything else: read, rewritten without/with the
  change, the new files replace them in the manifest.

Soundness is inherited from the pruning layer: may_match == False is a
proof (tests/test_differential_fuzz.py fuzzes it; the Bloom layer's
no-false-negative property is tests/test_bloom.py), so a carried block
is byte-identical to what a full rewrite would have produced for it.
A predicate outside the WHERE grammar parses to TruePred → every block
is touched → behavior degrades to the full rewrite, never to a wrong
answer.

At 100 TB this is the difference between moving 100 TB per DELETE and
moving the few blocks a selective predicate lands on — the reason
Iceberg/Delta exist. Measured in bench.py::bench_cow_dml.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

from columnar_database_project_spark.plans.predicate import (
    InList,
    Pred,
    TruePred,
)
from columnar_database_project_spark.plans.sql_where import (
    WhereParseError,
    parse_where,
)
from columnar_database_project_spark.sources.index import MicroBlockIndex
from columnar_database_project_spark.sources.microblock import MicroBlockWriter
from columnar_database_project_spark.storage.manifests import (
    ManifestStore,
    list_block_files,
)

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql import DataFrame, SparkSession

# MERGE key-triage guard: above this many distinct update keys the
# IN-list predicate (and its driver-side collect) stops being control-
# plane sized and the op is a backfill — rewrite everything instead.
MERGE_POINT_KEYS_MAX = 100_000

# Merge-on-read guard: a version's TOTAL deletion-vector size stays
# under this many positions (the read path's bounded anti-join frame);
# a MoR delete that would exceed it falls back to copy-on-write, which
# also resets the DV debt for the touched files.
MOR_DV_MAX_ROWS = 1_048_576


def _carried_dvs(store: ManifestStore, carried: list[str]) -> dict:
    """The current version's deletion vectors restricted to the files a
    new commit carries forward — rewritten files physically drop their
    deleted rows, so their vectors are consumed, but a carried file's
    vector must survive or its deleted rows would resurrect."""
    dvs = store.dvs_for()
    rel = {os.path.relpath(f, store.root) for f in carried}
    return {f: p for f, p in dvs.items() if f in rel}


def _pred_of(predicate) -> Pred:
    """Boolean SQL string → Pred; outside the grammar → TruePred
    (sound: every block becomes touched)."""
    if isinstance(predicate, Pred):
        return predicate
    try:
        return parse_where(str(predicate))
    except WhereParseError:
        return TruePred()


def _triage(
    files: list[str], pred: Pred, table_id: str, blooms=None
) -> tuple[list[str], list[str], int]:
    """(touched_files, carried_files, blocks_total): a FILE is touched
    if any of its blocks may match (multi-row-group files are
    file-granular here — the rewrite unit is the file)."""
    idx = MicroBlockIndex.build_from_files(files, table_id=table_id)
    if blooms is not None:
        idx.attach_blooms(blooms)
    touched = {idx.block_file(b) for b in idx.candidate_blocks(pred)}
    carried = [f for f in files if f not in touched]
    return sorted(touched), carried, idx.num_blocks


def _cond(predicate):
    from pyspark.sql import functions as F

    return F.expr(predicate) if isinstance(predicate, str) else predicate


def delete_where_cow(
    spark: "SparkSession",
    store: ManifestStore,
    predicate: str,
    block_rows: int | None = None,
    blooms=None,
) -> dict:
    """DELETE with block-granular rewrite. SQL semantics: only
    predicate-TRUE rows are removed (NULL keeps). Returns the op
    report incl. the IO-proportionality facts (files_rewritten /
    files_carried) the at-scale claim rests on."""
    from pyspark.sql import functions as F

    pred = _pred_of(predicate)
    files = store.files_for()
    touched, carried, n_blocks = _triage(files, pred, "cow_delete", blooms)
    v, stage = store.stage_next()
    new_files: list[str] = []
    deleted = 0
    if touched:
        before = store.read_subset(spark, touched)
        cond = F.coalesce(_cond(predicate), F.lit(False))
        kept = before.filter(~cond)
        deleted = before.count() - kept.count()
        writer = (
            MicroBlockWriter(block_rows=block_rows)
            if block_rows
            else MicroBlockWriter()
        )
        writer.write(kept, stage)
        new_files = list_block_files(stage)
    store.commit(
        v, new_files, carried, store.schema_json(),
        dvs=_carried_dvs(store, carried),
    )
    return {
        "version": v,
        "deleted": deleted,
        "blocks_total": n_blocks,
        "files_rewritten": len(touched),
        "files_carried": len(carried),
    }


def _mor_merge_positions(
    spark: "SparkSession",
    store: ManifestStore,
    files: list[str],
    touched: list[str],
    cond_col,
    max_dv_rows: int,
):
    """Collect the ``(file, row_index)`` positions matching ``cond_col``
    in the touched files and merge them into the current version's
    deletion vectors. Returns ``(merged_dvs, n_new)`` or ``None`` when
    the result would exceed ``max_dv_rows`` (caller falls back to
    CoW). Already-deleted positions merge idempotently."""
    from pyspark.sql import functions as F

    import json as _json

    from pyspark.sql import types as T

    existing = store.dvs_for()
    existing_total = sum(len(p) for p in existing.values())
    base_of = {os.path.basename(f): os.path.relpath(f, store.root) for f in files}
    merged: dict[str, set] = {f: set(p) for f, p in existing.items()}
    n_new = 0
    if touched:
        raw = (
            spark.read.option("mergeSchema", "true")
            .parquet(*touched)
            .withColumn(
                "_file",
                F.element_at(F.split(F.col("_metadata.file_path"), "/"), -1),
            )
            .withColumn("_pos", F.col("_metadata.row_index"))
        )
        # NULL-fill manifest-schema columns pre-evolution blocks lack,
        # or a predicate on a metadata-added column fails analysis
        schema = T.StructType.fromJson(_json.loads(store.schema_json()))
        for field in schema.fields:
            if field.name not in raw.columns:
                raw = raw.withColumn(
                    field.name, F.lit(None).cast(field.dataType)
                )
        raw = raw.filter(F.coalesce(cond_col, F.lit(False))).select(
            "_file", "_pos"
        )
        if raw.limit(max_dv_rows + 1).count() > max_dv_rows:
            return None
        for r in raw.collect():
            rel = base_of[r["_file"]]
            s = merged.setdefault(rel, set())
            if int(r["_pos"]) not in s:
                s.add(int(r["_pos"]))
                n_new += 1
        if existing_total + n_new > max_dv_rows:
            return None
    return {f: sorted(p) for f, p in merged.items()}, n_new


def delete_where_mor(
    spark: "SparkSession",
    store: ManifestStore,
    predicate: str,
    blooms=None,
    max_dv_rows: int = MOR_DV_MAX_ROWS,
) -> dict:
    """DELETE merge-on-read: commit a deletion VECTOR, not data files —
    the Delta-DV / Iceberg-position-delete design. The new version
    names exactly the current files plus per-file lists of deleted
    ``_metadata.row_index`` positions; the store's read path
    anti-joins them out. Write cost: one manifest JSON — zero data IO
    even for a one-row delete, where CoW still rewrites a whole block.

    The triage layer bounds the position SCAN too: only may-match
    blocks are read to find matching positions (carried blocks can't
    contain a match). Positions are found among LIVE rows (existing
    DVs applied), so double-deleting is idempotent.

    Guard: if the version's total DV size would exceed
    ``max_dv_rows``, the op falls back to ``delete_where_cow``
    (report["mode"] says which ran) — big deletes belong to CoW, and
    the bound is what keeps the read path's anti-join frame
    broadcastable. Compaction materializes DVs away
    (``compact_manifest`` treats any DV'd file as debt)."""
    pred = _pred_of(predicate)
    files = store.files_for()
    touched, carried, n_blocks = _triage(files, pred, "mor_delete", blooms)
    got = _mor_merge_positions(
        spark, store, files, touched, _cond(predicate), max_dv_rows
    )
    if got is None:
        rep = delete_where_cow(spark, store, predicate, blooms=blooms)
        rep["mode"] = "cow_fallback"
        return rep
    merged, deleted = got
    v, _stage = store.stage_next()
    store.commit(v, [], files, store.schema_json(), dvs=merged)
    return {
        "version": v,
        "mode": "mor",
        "deleted": deleted,
        "dv_rows_total": sum(len(p) for p in merged.values()),
        "blocks_total": n_blocks,
        "files_scanned": len(touched),
        "files_rewritten": 0,
        "files_carried": len(files),
    }


def update_where_mor(
    spark: "SparkSession",
    store: ManifestStore,
    predicate: str,
    assignments: dict,
    block_rows: int | None = None,
    blooms=None,
    max_dv_rows: int = MOR_DV_MAX_ROWS,
) -> dict:
    """UPDATE merge-on-read: deletion-vector the matching rows OUT and
    append their updated versions as a NEW block — write cost = the
    changed rows, not the blocks that contain them (a one-row update
    writes one tiny file + a manifest, where CoW rewrites the whole
    block). Same hybrid Delta runs when deletion vectors are enabled.

    The updated rows are computed from LIVE matching rows (existing
    DVs applied), assignments cast back to column types (schema must
    not fork), and both sides land in ONE commit — no version ever
    shows the delete without the insert. Falls back to
    ``update_where_cow`` above the DV budget."""
    from pyspark.sql import functions as F

    pred = _pred_of(predicate)
    files = store.files_for()
    touched, carried, n_blocks = _triage(files, pred, "mor_update", blooms)
    target_cols = [
        f["name"] for f in json.loads(store.schema_json())["fields"]
    ]
    unknown = set(assignments) - set(target_cols)
    if unknown:
        raise ValueError(f"update_where_mor: unknown columns {sorted(unknown)}")
    got = _mor_merge_positions(
        spark, store, files, touched, _cond(predicate), max_dv_rows
    )
    if got is None:
        rep = update_where_cow(
            spark, store, predicate, assignments,
            block_rows=block_rows, blooms=blooms,
        )
        rep["mode"] = "cow_fallback"
        return rep
    merged, n_hit = got
    v, stage = store.stage_next()
    new_files: list[str] = []
    if touched and n_hit:
        live = store.read_subset(spark, touched).filter(
            F.coalesce(_cond(predicate), F.lit(False))
        )
        types = dict(live.dtypes)
        cols = []
        for c in live.columns:
            if c in assignments:
                a = assignments[c]
                expr = F.expr(a) if isinstance(a, str) else a
                cols.append(expr.cast(types[c]).alias(c))
            else:
                cols.append(F.col(c))
        writer = (
            MicroBlockWriter(block_rows=block_rows)
            if block_rows
            else MicroBlockWriter()
        )
        # n_hit is DV-budget-bounded, so right-sizing the append to
        # ⌈n_hit/block⌉ tasks never concentrates more than the budget
        br = block_rows or writer.block_rows
        writer.write(
            live.select(*cols).coalesce(max(1, n_hit // br or 1)), stage
        )
        new_files = list_block_files(stage)
    store.commit(v, new_files, files, store.schema_json(), dvs=merged)
    return {
        "version": v,
        "mode": "mor",
        "updated": n_hit,
        "dv_rows_total": sum(len(p) for p in merged.values()),
        "blocks_total": n_blocks,
        "files_new": len(new_files),
        "files_rewritten": 0,
        "files_carried": len(files),
    }


def merge_mor(
    spark: "SparkSession",
    store: ManifestStore,
    updates: "DataFrame",
    key: str,
    block_rows: int | None = None,
    blooms=None,
    max_dv_rows: int = MOR_DV_MAX_ROWS,
    max_point_keys: int = MERGE_POINT_KEYS_MAX,
) -> dict:
    """MERGE merge-on-read: deletion-vector the matched keys' old rows
    and append ALL update rows as new blocks, one commit — upsert cost
    = the update batch, never the blocks it lands in. Falls back to
    ``merge_cow`` when the key batch is backfill-sized or the DV
    budget would overflow."""
    target_cols = {
        f["name"] for f in json.loads(store.schema_json())["fields"]
    }
    if set(updates.columns) != target_cols:
        raise ValueError(
            f"merge_mor: updates columns {sorted(updates.columns)} "
            f"!= target columns {sorted(target_cols)}"
        )
    n_keys = updates.select(key).distinct().count()
    if n_keys > max_point_keys:
        rep = merge_cow(
            spark, store, updates, key,
            block_rows=block_rows, blooms=blooms,
        )
        rep["mode"] = "cow_fallback"
        return rep
    keys = [
        r[0] for r in updates.select(key).distinct().collect()
        if r[0] is not None
    ]
    files = store.files_for()
    if not keys:
        # SQL equality with NULL matches no target row, so a batch
        # with no non-NULL merge keys has NOTHING to deletion-vector.
        # Never substitute TruePred here: as a match predicate it
        # would DV every live row and a no-op MERGE would wipe the
        # table. Empty batch → full no-op (no commit); NULL-keyed
        # rows → append-only commit.
        if updates.isEmpty():
            return {
                "version": store.latest(),
                "mode": "mor_noop",
                "update_rows": 0,
                "update_keys": 0,
                "matched_rows": 0,
                "dv_rows_total": 0,
                "blocks_total": 0,
                "files_new": 0,
                "files_rewritten": 0,
                "files_carried": len(files),
            }
        rep = append_cow(spark, store, updates, block_rows=block_rows)
        return {
            "version": rep["version"],
            "mode": "mor_append_only",
            "update_rows": rep["appended_rows"],
            "update_keys": 0,
            "matched_rows": 0,
            "dv_rows_total": 0,
            "blocks_total": 0,
            "files_new": rep["files_new"],
            "files_rewritten": 0,
            "files_carried": rep["files_carried"],
        }
    pred: Pred = InList(key, tuple(keys))
    touched, carried, n_blocks = _triage(files, pred, "mor_merge", blooms)
    got = _mor_merge_positions(
        spark, store, files, touched, pred.to_column(), max_dv_rows
    )
    if got is None:
        rep = merge_cow(
            spark, store, updates, key,
            block_rows=block_rows, blooms=blooms,
        )
        rep["mode"] = "cow_fallback"
        return rep
    merged, n_matched = got
    v, stage = store.stage_next()
    writer = (
        MicroBlockWriter(block_rows=block_rows)
        if block_rows
        else MicroBlockWriter()
    )
    writer.write(updates, stage)
    new_files = list_block_files(stage)
    store.commit(v, new_files, files, store.schema_json(), dvs=merged)
    return {
        "version": v,
        "mode": "mor",
        "update_rows": updates.count(),
        "update_keys": n_keys,
        "matched_rows": n_matched,
        "dv_rows_total": sum(len(p) for p in merged.values()),
        "blocks_total": n_blocks,
        "files_new": len(new_files),
        "files_rewritten": 0,
        "files_carried": len(files),
    }


def update_where_cow(
    spark: "SparkSession",
    store: ManifestStore,
    predicate: str,
    assignments: dict,
    block_rows: int | None = None,
    blooms=None,
) -> dict:
    """UPDATE ... SET with block-granular rewrite. Assignment results
    are CAST back to the column's current type: carried blocks keep
    the old schema by construction, so a type-widening assignment must
    not fork the manifest's schema across files."""
    from pyspark.sql import functions as F

    pred = _pred_of(predicate)
    files = store.files_for()
    touched, carried, n_blocks = _triage(files, pred, "cow_update", blooms)
    v, stage = store.stage_next()
    new_files: list[str] = []
    updated = 0
    if touched:
        target = store.read_subset(spark, touched)
        unknown = set(assignments) - set(target.columns)
        if unknown:
            raise ValueError(f"update_where_cow: unknown columns {sorted(unknown)}")
        cond = F.coalesce(_cond(predicate), F.lit(False))
        types = dict(target.dtypes)
        cols = []
        for c in target.columns:
            if c in assignments:
                a = assignments[c]
                expr = F.expr(a) if isinstance(a, str) else a
                cols.append(
                    F.when(cond, expr.cast(types[c]))
                    .otherwise(F.col(c))
                    .alias(c)
                )
            else:
                cols.append(F.col(c))
        updated = target.filter(cond).count()
        writer = (
            MicroBlockWriter(block_rows=block_rows)
            if block_rows
            else MicroBlockWriter()
        )
        writer.write(target.select(*cols), stage)
        new_files = list_block_files(stage)
    store.commit(
        v, new_files, carried, store.schema_json(),
        dvs=_carried_dvs(store, carried),
    )
    return {
        "version": v,
        "updated": updated,
        "blocks_total": n_blocks,
        "files_rewritten": len(touched),
        "files_carried": len(carried),
    }


def merge_cow(
    spark: "SparkSession",
    store: ManifestStore,
    updates: "DataFrame",
    key: str,
    block_rows: int | None = None,
    blooms=None,
    max_point_keys: int = MERGE_POINT_KEYS_MAX,
) -> dict:
    """MERGE/upsert with block-granular rewrite: only blocks whose
    key zone range (∧ Bloom, when attached) can contain an update key
    are anti-joined; the update rows land as NEW blocks; everything
    else is carried by reference.

    Key triage is an IN-list over the updates' distinct keys —
    control-plane sized up to ``max_point_keys``; above that the op is
    a backfill and every block is touched (TruePred), which is also
    the sound fallback for a key batch too large to enumerate."""
    target_cols = {
        f["name"] for f in json.loads(store.schema_json())["fields"]
    }
    if set(updates.columns) != target_cols:
        raise ValueError(
            f"merge_cow: updates columns {sorted(updates.columns)} "
            f"!= target columns {sorted(target_cols)}"
        )
    n_keys = updates.select(key).distinct().count()
    if n_keys > max_point_keys:
        pred: Pred = TruePred()
    else:
        keys = [
            r[0] for r in updates.select(key).distinct().collect()
            if r[0] is not None
        ]
        if not keys:
            # No non-NULL merge keys → no target row can match (SQL
            # equality with NULL is never true). Empty batch: full
            # no-op, no commit. NULL-keyed rows: append-only commit.
            # TruePred here would rewrite the whole table for nothing.
            if updates.isEmpty():
                return {
                    "version": store.latest(),
                    "mode": "cow_noop",
                    "update_rows": 0,
                    "update_keys": 0,
                    "blocks_total": 0,
                    "files_rewritten": 0,
                    "files_carried": len(store.files_for()),
                }
            rep = append_cow(spark, store, updates, block_rows=block_rows)
            return {
                "version": rep["version"],
                "mode": "cow_append_only",
                "update_rows": rep["appended_rows"],
                "update_keys": 0,
                "blocks_total": 0,
                "files_rewritten": 0,
                "files_carried": rep["files_carried"],
            }
        pred = InList(key, tuple(keys))
    files = store.files_for()
    touched, carried, n_blocks = _triage(files, pred, "cow_merge", blooms)
    v, stage = store.stage_next()
    if touched:
        # reconciled read: touched blocks may predate a metadata-only
        # add_column — missing columns surface as typed NULL, exactly
        # what store.read serves for them
        survivors = store.read_subset(spark, touched).join(
            updates.select(key), on=key, how="left_anti"
        )
        out = survivors.unionByName(updates)
    else:
        out = updates
    writer = (
        MicroBlockWriter(block_rows=block_rows)
        if block_rows
        else MicroBlockWriter()
    )
    writer.write(out, stage)
    new_files = list_block_files(stage)
    store.commit(
        v, new_files, carried, store.schema_json(),
        dvs=_carried_dvs(store, carried),
    )
    return {
        "version": v,
        "update_rows": updates.count(),
        "update_keys": n_keys,
        "blocks_total": n_blocks,
        "files_rewritten": len(touched),
        "files_carried": len(carried),
    }


def append_cow(
    spark: "SparkSession",
    store: ManifestStore,
    df: "DataFrame",
    block_rows: int | None = None,
    meta: dict | None = None,
) -> dict:
    """INSERT/append: the new rows land as new blocks, every existing
    block is carried by reference — the cheapest verb (zero reads of
    existing data, IO = the appended rows). Missing manifest-schema
    columns in ``df`` (e.g. after a metadata-only add_column) are
    allowed — they read as NULL; extra columns are an error."""
    target_cols = {
        f["name"] for f in json.loads(store.schema_json())["fields"]
    }
    extra = set(df.columns) - target_cols
    if extra:
        raise ValueError(f"append_cow: unknown columns {sorted(extra)}")
    v, stage = store.stage_next()
    writer = (
        MicroBlockWriter(block_rows=block_rows)
        if block_rows
        else MicroBlockWriter()
    )
    writer.write(df, stage)
    new_files = list_block_files(stage)
    carried = store.files_for()
    store.commit(
        v, new_files, carried, store.schema_json(), meta=meta,
        dvs=_carried_dvs(store, carried),
    )
    return {
        "version": v,
        "appended_rows": df.count(),
        "files_new": len(new_files),
        "files_carried": len(carried),
    }


def compact_manifest(
    spark: "SparkSession",
    store: ManifestStore,
    block_rows: int | None = None,
    min_fill: float = 0.5,
    sort_by: list[str] | None = None,
    zorder: bool = False,
) -> dict:
    """Compaction as a manifest commit — the CoW twin of
    ``sources.microblock.compact_blocks``, with two structural
    advantages the directory form can't have: (1) WITHOUT ``sort_by``
    it is itself copy-on-write — only the undersized blocks (every
    incrementally-ingested table's tail-block debris, e.g. from
    ``append_stream_manifest``) are coalesced and rewritten, full
    blocks are carried by reference; (2) the swap is the head-log
    commit, genuinely atomic, so there is no crash window needing a
    ``recover_compaction`` procedure at all — a crash mid-compaction
    leaves the previous version current and orphan files for vacuum.

    ``sort_by`` re-clusters to restore zone-map locality (see
    compact_blocks' rationale): that is a GLOBAL property, so every
    block is rewritten through one range shuffle — the opt-in
    full-rewrite case. With ``zorder=True`` and exactly two numeric
    ``sort_by`` columns, the re-cluster orders on the Morton key
    (``sources.microblock.zorder_key``) instead — OPTIMIZE ZORDER as a
    manifest commit, for tables box-filtered on both dimensions.

    Idempotent: ≤1 undersized block and no ``sort_by`` → no new
    version. Row-count-verified before commit."""
    import pyarrow.parquet as pq

    from pyspark.sql import functions as F

    from columnar_database_project_spark.sources.microblock import (
        DEFAULT_BLOCK_ROWS,
    )

    block_rows = block_rows or DEFAULT_BLOCK_ROWS
    files = store.files_for()
    rows_of = {f: pq.ParquetFile(f).metadata.num_rows for f in files}
    dvs = store.dvs_for()
    dv_rows = {
        f: len(dvs.get(os.path.relpath(f, store.root), [])) for f in files
    }
    # live rows drive the fill test, and ANY file with a deletion
    # vector is compactable debt — compaction is the DV-materialization
    # point (rewritten files physically drop their deleted rows)
    small = [
        f
        for f in files
        if rows_of[f] - dv_rows[f] < block_rows * min_fill or dv_rows[f]
    ]
    if sort_by:
        touched, carried = files, []
    else:
        if len(small) <= 1 and not any(dv_rows.values()):
            return {  # a single tail block is the expected remainder
                "compacted": False,
                "blocks_before": len(files),
                "blocks_after": len(files),
            }
        if not small:
            return {
                "compacted": False,
                "blocks_before": len(files),
                "blocks_after": len(files),
            }
        touched, carried = small, [f for f in files if f not in set(small)]
    v, stage = store.stage_next()
    new_files: list[str] = []
    if touched:
        df = store.read_subset(spark, touched)
        n_expect = sum(rows_of[f] - dv_rows[f] for f in touched)
        if sort_by and zorder:
            if len(sort_by) != 2:
                raise ValueError("zorder=True requires exactly 2 sort_by columns")
            from columnar_database_project_spark.sources.microblock import (
                zorder_key,
            )

            a, b = sort_by
            r = df.agg(
                F.min(a).alias("la"), F.max(a).alias("ha"),
                F.min(b).alias("lb"), F.max(b).alias("hb"),
            ).first()
            z = zorder_key(F.col(a), F.col(b), (r["la"], r["ha"], r["lb"], r["hb"]))
            n_parts = max(1, sum(rows_of.values()) // block_rows)
            df = (
                df.withColumn("_z", z)
                .repartitionByRange(n_parts, F.col("_z"))
                .sortWithinPartitions("_z")
                .drop("_z")
            )
        elif sort_by:
            n_parts = max(1, sum(rows_of.values()) // block_rows)
            df = df.repartitionByRange(n_parts, *[F.col(c) for c in sort_by])
            df = df.sortWithinPartitions(*sort_by)
        else:
            df = df.coalesce(max(1, n_expect // block_rows or 1))
        MicroBlockWriter(block_rows=block_rows).write(df, stage)
        new_files = list_block_files(stage)
        n_got = sum(pq.ParquetFile(f).metadata.num_rows for f in new_files)
        if n_got != n_expect:
            raise RuntimeError(
                f"compact_manifest: rewrite lost rows ({n_got} != {n_expect});"
                " nothing committed — previous version remains current"
            )
    store.commit(
        v, new_files, carried, store.schema_json(),
        dvs=_carried_dvs(store, carried),
    )
    return {
        "compacted": True,
        "version": v,
        "blocks_before": len(files),
        "blocks_after": len(new_files) + len(carried),
        "files_rewritten": len(touched),
        "files_carried": len(carried),
    }


# --------------------------------------------------------------------
# Merge-on-read auto-compaction policy (VERDICT r7 #3). The measured
# MoR read tax (BENCH.json cow_dml.read_tax: 1.55x) is driven by the
# fraction of rows that must scan through the per-row _metadata +
# DV-filter path — 4 point-deleted rows tainting ~6% of the table's
# rows already cost 1.55x — with the logically-deleted-row fraction a
# secondary (wasted-IO) term. The defaults therefore trigger at 5%
# row taint or 2% logical deletes: below that the steady-state tax
# stays near 1.0, above it compaction buys the tax back (1.55 -> 1.0
# measured) for one bounded rewrite of only the DV'd files.
MOR_COMPACT_TAINT_RATIO = 0.05
MOR_COMPACT_DV_ROWS_RATIO = 0.02


def mor_compaction_debt(store: ManifestStore) -> dict:
    """Control-plane measurement of the live version's MoR read-tax
    drivers: rows in DV-carrying files (the per-row scan-path taint)
    and logically-deleted rows. O(files) driver-side footer reads —
    the same bounded metadata pass ``compact_manifest`` makes."""
    import pyarrow.parquet as pq

    files = store.files_for()
    dvs = store.dvs_for()
    rows_total = rows_tainted = dv_rows = dv_files = 0
    for f in files:
        n = pq.ParquetFile(f).metadata.num_rows
        rows_total += n
        d = dvs.get(os.path.relpath(f, store.root))
        if d:
            dv_files += 1
            rows_tainted += n
            dv_rows += len(d)
    return {
        "files": len(files),
        "dv_files": dv_files,
        "rows_total": rows_total,
        "rows_tainted": rows_tainted,
        "dv_rows": dv_rows,
        "taint_ratio": rows_tainted / rows_total if rows_total else 0.0,
        "dv_rows_ratio": dv_rows / rows_total if rows_total else 0.0,
    }


def maybe_compact_mor(
    spark: "SparkSession",
    store: ManifestStore,
    block_rows: int | None = None,
    taint_ratio: float = MOR_COMPACT_TAINT_RATIO,
    dv_rows_ratio: float = MOR_COMPACT_DV_ROWS_RATIO,
) -> dict:
    """Mechanized DV compaction: fire ``compact_manifest`` (the DV
    materialization point) exactly when the live manifest's measured
    debt exceeds a threshold — the policy an operator previously had
    to remember to run by hand (DEPLOY.md). The engine's MoR DML verbs
    call this after every commit, so the read tax is BOUNDED by
    construction: taint can exceed the threshold for at most the one
    commit that crossed it. Returns {"fired", "debt"} and, when fired,
    the compaction report."""
    debt = mor_compaction_debt(store)
    if not (
        debt["taint_ratio"] > taint_ratio
        or debt["dv_rows_ratio"] > dv_rows_ratio
    ):
        return {"fired": False, "debt": debt}
    rep = compact_manifest(spark, store, block_rows=block_rows)
    return {"fired": True, "debt": debt, "compaction": rep}


def init_manifest_table(
    spark: "SparkSession",
    store: ManifestStore,
    df: "DataFrame",
    block_rows: int | None = None,
    meta: dict | None = None,
) -> dict:
    """Version 1: materialize ``df`` as the store's initial manifest.
    ``meta`` is carried in the commit (the streaming sink's first
    batch needs its ``txn.batch_id`` witness here too)."""
    v, stage = store.stage_next()
    writer = (
        MicroBlockWriter(block_rows=block_rows)
        if block_rows
        else MicroBlockWriter()
    )
    writer.write(df, stage)
    store.commit(v, list_block_files(stage), [], df.schema.json(), meta=meta)
    return {"version": v, "files": len(store.files_for(v))}
