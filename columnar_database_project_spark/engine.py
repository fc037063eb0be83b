"""MicroBlockEngine — the engine façade.

Spark-first restatement of the reference's ``StorageEngineV5``
(reference query_enginev5.py:18-305). The reference's query lifecycle
is parse → zone-map prune → log access → cache probe → read row groups
→ concat → register → delegate SQL to DuckDB. On Spark, stages
parse/prune/read/execute are Catalyst + the vectorized Parquet reader
(filter pushdown does row-group pruning natively); what remains OURS is
the observability + caching + prefetch layer:

- ``MicroBlockIndex``: explicit per-(block × column) zone-map metadata
  (reference microblock_index.py:107-171) used to *predict* pruning and
  to drive the cache/prefetch subsystems.
- ``AccessLogger`` + ``GlobalHistory``: which blocks each query touched
  (reference access_logger.py:29-58) — the training-data tap.
- ``BlockCache``: LRU of persisted per-block DataFrames (reference
  block_cache.py:5-44).
- ``PrefetchService``: background predictor loop (reference
  prefetch_service.py:35-96).

All components are optional — the plain SQL surface works with none of
them attached.
"""

from __future__ import annotations

import time
import uuid
from collections import OrderedDict
from typing import TYPE_CHECKING, Any

from pyspark.sql import DataFrame, SparkSession

from columnar_database_project_spark.catalog import register_dir

if TYPE_CHECKING:  # pragma: no cover
    from columnar_database_project_spark.sources.index import MicroBlockIndex
    from columnar_database_project_spark.storage.access_logger import (
        AccessLogger,
        GlobalHistory,
    )
    from columnar_database_project_spark.storage.block_cache import BlockCache


class MicroBlockEngine:
    """Catalog + SQL surface + storage-optimization hooks.

    Parameters
    ----------
    spark : the session.
    table_dir : directory of ``<name>.parquet`` tables to register.
    index : optional MicroBlockIndex for pruning prediction / logging.
    cache : optional BlockCache (LRU over persisted block DataFrames).
    logger : optional AccessLogger (JSONL access log).
    history : optional GlobalHistory (rolling deque of block ids).
    """

    def __init__(
        self,
        spark: SparkSession,
        table_dir: str | None = None,
        index: "MicroBlockIndex | None" = None,
        cache: "BlockCache | None" = None,
        logger: "AccessLogger | None" = None,
        history: "GlobalHistory | None" = None,
        bucketed_facts: "dict[str, str] | bool | None" = None,
        layout_path: str | None = None,
    ) -> None:
        self.spark = spark
        self.tables: dict[str, DataFrame] = {}
        self.index = index
        self.cache = cache
        self.logger = logger
        self.history = history
        self._table_dir = table_dir
        self._catalog_version = 0
        self._result_cache: "OrderedDict[tuple, Any]" = OrderedDict()
        self._result_cache_stats = {"hits": 0, "misses": 0, "bypassed": 0}
        if table_dir:
            self.tables = register_dir(spark, table_dir)
            if bucketed_facts:
                self.use_bucketed_facts(
                    None if bucketed_facts is True else bucketed_facts,
                    layout_path,
                )

    # ------------------------------------------------------------- catalog
    def register(self, name: str, df: DataFrame) -> None:
        df.createOrReplaceTempView(name)
        self.tables[name] = df
        # any catalog change invalidates cached results (conservative:
        # correctness over retention — see query_cached). The version
        # bump already makes stale keys unreachable; clearing as well
        # releases their driver memory immediately instead of waiting
        # for LRU aging.
        self._catalog_version += 1
        self._result_cache.clear()

    def table(self, name: str) -> DataFrame:
        return self.tables[name]

    def use_bucketed_facts(
        self,
        keys: dict[str, str] | None = None,
        path: str | None = None,
        n_buckets: int | None = None,
    ) -> dict[str, str]:
        """Prefer the bucketed/sorted materialization for the fact
        tables (default lineitem/orders on the orderkey): builds or
        reuses the layout under ``path`` (default: a dir next to the
        Spark warehouse keyed by the table dir) and re-registers the
        bucketed relations under the plain table names — the engine's
        SQL surface AND every ``catalog.load_table`` consumer then
        read the layout whose fact-to-fact joins plan with zero
        Exchange (see sources/bucketed.py). Returns the table-name
        map."""
        import os

        from columnar_database_project_spark.sources.bucketed import (
            FACT_BUCKETS,
            materialize_fact_layout,
        )

        if self._table_dir is None:
            raise ValueError("engine has no table_dir to materialize")
        if path is None:
            from urllib.parse import urlparse

            raw = self.spark.conf.get(
                "spark.sql.warehouse.dir", "spark-warehouse"
            )
            parsed = urlparse(raw)
            # file:///x and bare /x (or relative) both yield a local
            # path; removeprefix("file:") would turn file:///x into
            # ///x and os.path.join would mangle hdfs:/s3a: URIs —
            # the layout dir is written with local-filesystem APIs,
            # so a remote warehouse scheme needs an explicit ``path``.
            if parsed.scheme in ("", "file"):
                wh = parsed.path or raw
            else:
                raise ValueError(
                    f"use_bucketed_facts needs an explicit path= when "
                    f"the warehouse is non-local ({raw!r}): the layout "
                    f"manifest is written with local file APIs"
                )
            digest = os.path.basename(
                os.path.realpath(self._table_dir)
            ).replace(".", "_")
            path = os.path.join(wh, f"bucketed_layout_{digest}")
        named = materialize_fact_layout(
            self.spark,
            self._table_dir,
            path,
            keys=keys,
            n_buckets=FACT_BUCKETS if n_buckets is None else n_buckets,
        )
        for name, tbl in named.items():
            self.register(name, self.spark.table(tbl))
        return named

    # ---------------------------------------------------------- lifecycle
    def ingest_jsonl(self, src: str, name: str, dst: str) -> dict:
        """Ingest a raw JSONL document drop (staged parse + quarantine,
        see ``sources.ingest``) into microblocks at ``dst`` and register
        the result as table ``name``. Returns the ingestion report."""
        from columnar_database_project_spark.sources.ingest import (
            ingest_documents_jsonl,
        )

        report = ingest_documents_jsonl(self.spark, src, dst)
        self.register(name, self.spark.read.parquet(dst))
        return report

    def ingest_stream_dedup(
        self,
        src: str,
        name: str,
        out_path: str,
        store_path: str,
        checkpoint: str,
    ) -> dict:
        """Continuous-corpus ingestion through the façade: drain the
        parquet drops currently in ``src`` through the store-backed
        streaming dedup (``streaming.text.dedup_stream_against_store``
        — availableNow trigger, so each call processes exactly the
        files present), then register the deduplicated table as
        ``name``. Repeated calls are the incremental-drop cadence: the
        fingerprint store carries survivors across calls, so a doc
        seen in ANY earlier drop never re-enters the table. Returns
        {"rows": n, "store_fingerprints": m}."""
        from columnar_database_project_spark.streaming.text import (
            dedup_stream_against_store,
            read_document_stream,
        )

        q = dedup_stream_against_store(
            read_document_stream(self.spark, src),
            out_path,
            store_path,
            checkpoint,
        )
        q.awaitTermination()
        self.spark.catalog.refreshByPath(out_path)
        self.register(name, self.spark.read.parquet(out_path))
        return {
            "rows": self.tables[name].count(),
            "store_fingerprints": self.spark.read.parquet(store_path).count(),
        }

    def ingest_stream_upsert(
        self,
        src: str,
        name: str,
        table_path: str,
        checkpoint: str,
        key: str,
        order_col: str,
        schema,
    ) -> dict:
        """Continuous CDC MERGE through the façade: drain the change
        drops in ``src`` (parquet files matching ``schema``) through
        ``streaming.dml.upsert_stream`` into the snapshot at
        ``table_path`` (per-key last-writer-wins on ``order_col``),
        then register the merged table as ``name``. Repeated calls are
        the incremental-feed cadence; replayed or out-of-order drops
        are idempotent under LWW. Returns {"rows": n}."""
        from columnar_database_project_spark.streaming.dml import (
            upsert_stream,
        )

        changes = (
            self.spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = upsert_stream(changes, table_path, key, order_col, checkpoint)
        q.awaitTermination()
        self.spark.catalog.refreshByPath(table_path)
        self.register(name, self.spark.read.parquet(table_path))
        return {"rows": self.tables[name].count()}

    def stream_heavy_hitters(
        self,
        src: str,
        store_path: str,
        checkpoint: str,
        capacity: int = 30,
    ) -> DataFrame:
        """Drain the drops in ``src`` through the streaming Misra-Gries
        summary (``streaming.text.heavy_hitters_stream``) and return
        the bounded (<= ``capacity``-entry) term-frequency summary as a
        DataFrame — the façade's continuous-statistics surface."""
        from columnar_database_project_spark.streaming.text import (
            heavy_hitters_stream,
            read_document_stream,
        )

        q = heavy_hitters_stream(
            read_document_stream(self.spark, src),
            store_path,
            checkpoint,
            capacity=capacity,
        )
        q.awaitTermination()
        self.spark.catalog.refreshByPath(store_path)
        return self.spark.read.parquet(store_path)

    def merge_into(
        self,
        name: str,
        updates: DataFrame,
        key: str,
        dst: str,
    ) -> dict:
        """MERGE/upsert — the DML surface the lifecycle was missing:
        rows of ``updates`` replace same-``key`` rows of registered
        table ``name`` (WHEN MATCHED THEN UPDATE SET *), unmatched
        update rows are appended (WHEN NOT MATCHED THEN INSERT *).

        Plan shape: ONE key-equi ``left_anti`` shuffle against the
        updates' keys plus a zero-shuffle union — the standard
        copy-on-write merge (what Delta/Iceberg do per touched file,
        here per table since microblock stores are snapshot-granular
        like ``compact``/``snapshot_diff``). No broadcast hints:
        ``updates`` is corpus-proportional in a backfill, so AQE
        size-gates the join strategy (see DEPLOY.md broadcast policy).

        Writes the merged snapshot as microblocks at ``dst`` (a NEW
        directory — the source snapshot stays intact, same recovery
        story as ``compact``'s staging), re-registers ``name`` at it,
        and returns {"target_rows", "update_rows", "merged_rows",
        "inserted"} (updated = update_rows - inserted).
        """
        from columnar_database_project_spark.sources.microblock import (
            MicroBlockWriter,
        )

        target = self.table(name)
        if set(updates.columns) != set(target.columns):
            raise ValueError(
                f"merge_into: updates columns {sorted(updates.columns)} "
                f"!= target columns {sorted(target.columns)}"
            )
        self._check_not_current_snapshot(name, dst, "merge_into")
        survivors = target.join(updates.select(key), on=key, how="left_anti")
        merged = survivors.unionByName(updates)
        MicroBlockWriter().write(merged, dst)
        self.spark.catalog.refreshByPath(dst)
        self.register(name, self.spark.read.parquet(dst))
        n_target = target.count()
        n_updates = updates.count()
        n_merged = self.tables[name].count()
        return {
            "target_rows": n_target,
            "update_rows": n_updates,
            "merged_rows": n_merged,
            "inserted": n_merged - n_target,
        }

    def merge_versioned(
        self, name: str, updates: DataFrame, key: str, store
    ) -> dict:
        """``merge_into`` with the dst chosen by a ``SnapshotStore``
        commit log: the rewrite stages in the next version dir and
        only becomes visible on commit — crash mid-write leaves an
        orphan no reader resolves. Returns the merge report plus
        {"version": v}."""
        v, dst = store.stage_next()
        report = self.merge_into(name, updates, key, dst)
        store.commit(v)
        report["version"] = v
        return report

    def delete_versioned(self, name: str, predicate, store) -> dict:
        """``delete_where`` under the same commit-log discipline."""
        v, dst = store.stage_next()
        report = self.delete_where(name, predicate, dst)
        store.commit(v)
        report["version"] = v
        return report

    def time_travel(self, name: str, store, version: int | None = None) -> DataFrame:
        """Register (and return) table ``name`` as of ``version``
        (default: latest committed). Reading an old version is just a
        scan of its immutable snapshot dir — no log replay."""
        v = store.latest() if version is None else version
        if v is None or v not in store.versions():
            raise ValueError(f"time_travel: version {version!r} not committed")
        df = self.spark.read.parquet(store.path_for(v))
        self.register(name, df)
        return df

    def _check_not_current_snapshot(self, name: str, dst: str, op: str) -> None:
        """Refuse a DML rewrite whose output dir is the table's CURRENT
        snapshot: Spark's overwrite would be deleting the very files
        the rewrite plan is still scanning (self-overwrite corruption).
        Chained DML must alternate snapshot dirs (a/b or versioned),
        exactly like ``compact``'s staging-then-swap discipline."""
        import os as _os

        dst_real = _os.path.realpath(dst)
        for f in self.tables[name].inputFiles():
            p = _os.path.realpath(f.replace("file:", "", 1))
            if _os.path.dirname(p) == dst_real:
                raise ValueError(
                    f"{op}: dst {dst!r} is table {name!r}'s current "
                    "snapshot directory — write to a new dir "
                    "(alternate/versioned snapshots), the source must "
                    "outlive the rewrite"
                )

    def delete_where(self, name: str, predicate, dst: str) -> dict:
        """DELETE — the third DML verb: rewrite registered table
        ``name`` without the rows matching ``predicate`` (a Column or
        a SQL boolean string), as a copy-on-write snapshot at ``dst``
        (same recovery story as ``merge_into``). SQL DELETE semantics:
        rows where the predicate is NULL are KEPT (only TRUE deletes).

        Plan shape: one pushdown-eligible scan + filter + block-sized
        write — no shuffle at all; at 100 TB this is the cheapest of
        the DML verbs and partition pruning applies when the predicate
        covers the partition column."""
        from pyspark.sql import functions as F

        from columnar_database_project_spark.sources.microblock import (
            MicroBlockWriter,
        )

        self._check_not_current_snapshot(name, dst, "delete_where")
        target = self.table(name)
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        kept = target.filter(~F.coalesce(cond, F.lit(False)))
        MicroBlockWriter().write(kept, dst)
        self.spark.catalog.refreshByPath(dst)
        self.register(name, self.spark.read.parquet(dst))
        n_target = target.count()
        n_kept = self.tables[name].count()
        return {
            "target_rows": n_target,
            "deleted": n_target - n_kept,
            "remaining": n_kept,
        }

    def update_where(
        self, name: str, predicate, assignments: dict, dst: str
    ) -> dict:
        """UPDATE ... SET — the fourth DML verb (INSERT via register/
        ingest, MERGE, DELETE, now UPDATE): rewrite registered table
        ``name`` with each column in ``assignments`` (col name →
        Column expression or SQL string) replaced on rows matching
        ``predicate``, as a copy-on-write snapshot at ``dst``. SQL
        UPDATE semantics: rows where the predicate is NULL keep their
        old values (only TRUE updates). Column order and names are
        preserved; assigning an unknown column is an error.

        Plan shape: one pushdown-ineligible scan (every row is
        rewritten) + per-row CASE projection + block-sized write —
        zero shuffles, same cost class as DELETE. At 100 TB a
        partition-pruned variant would rewrite only matching
        partitions; snapshot-granular stores rewrite the table, which
        is why production UPDATE batches route through
        ``merge_into`` when the touched fraction is small."""
        from pyspark.sql import functions as F

        from columnar_database_project_spark.sources.microblock import (
            MicroBlockWriter,
        )

        self._check_not_current_snapshot(name, dst, "update_where")
        target = self.table(name)
        unknown = set(assignments) - set(target.columns)
        if unknown:
            raise ValueError(
                f"update_where: unknown columns {sorted(unknown)}"
            )
        cond = F.expr(predicate) if isinstance(predicate, str) else predicate
        cond = F.coalesce(cond, F.lit(False))
        cols = []
        for c in target.columns:
            if c in assignments:
                a = assignments[c]
                expr = F.expr(a) if isinstance(a, str) else a
                cols.append(F.when(cond, expr).otherwise(F.col(c)).alias(c))
            else:
                cols.append(F.col(c))
        n_updated = target.filter(cond).count()
        MicroBlockWriter().write(target.select(*cols), dst)
        self.spark.catalog.refreshByPath(dst)
        self.register(name, self.spark.read.parquet(dst))
        return {
            "target_rows": self.tables[name].count(),
            "updated": n_updated,
        }

    def update_versioned(
        self, name: str, predicate, assignments: dict, store
    ) -> dict:
        """``update_where`` under the commit-log discipline (see
        ``merge_versioned``)."""
        v, dst = store.stage_next()
        report = self.update_where(name, predicate, assignments, dst)
        store.commit(v)
        report["version"] = v
        return report

    # --------------------------------------------- block-granular CoW DML
    # The versioned verbs above rewrite the WHOLE table per op
    # (directory-granular snapshots). These rewrite only the blocks the
    # zone-map/Bloom triage cannot prove untouched — change-
    # proportional IO, the at-scale DML path (storage/cow.py).

    def delete_where_cow(self, name: str, predicate, mstore, **kw) -> dict:
        from columnar_database_project_spark.storage.cow import (
            delete_where_cow,
        )

        report = delete_where_cow(self.spark, mstore, predicate, **kw)
        self.register(name, mstore.read(self.spark))
        return report

    def _auto_compact_mor(self, mstore, report: dict, kw: dict) -> dict:
        """Threshold-triggered DV materialization after a MoR commit
        (storage/cow.maybe_compact_mor) — the read tax is bounded by
        the engine, not by an operator remembering DEPLOY.md."""
        from columnar_database_project_spark.storage.cow import (
            maybe_compact_mor,
        )

        report["auto_compact"] = maybe_compact_mor(
            self.spark, mstore, block_rows=kw.get("block_rows")
        )
        return report

    def delete_where_mor(
        self, name: str, predicate, mstore, auto_compact: bool = True, **kw
    ) -> dict:
        """Merge-on-read DELETE: commits a deletion vector, zero data
        files written (storage/cow.delete_where_mor); falls back to
        CoW above the DV budget. ``auto_compact`` (default on) runs
        the threshold policy afterwards so accumulated DV read tax is
        bounded without manual compaction."""
        from columnar_database_project_spark.storage.cow import (
            delete_where_mor,
        )

        report = delete_where_mor(self.spark, mstore, predicate, **kw)
        if auto_compact:
            self._auto_compact_mor(mstore, report, kw)
        self.register(name, mstore.read(self.spark))
        return report

    def update_where_mor(
        self,
        name: str,
        predicate,
        assignments: dict,
        mstore,
        auto_compact: bool = True,
        **kw,
    ) -> dict:
        """Merge-on-read UPDATE: DV the matching rows, append their
        updated versions (storage/cow.update_where_mor)."""
        from columnar_database_project_spark.storage.cow import (
            update_where_mor,
        )

        report = update_where_mor(
            self.spark, mstore, predicate, assignments, **kw
        )
        if auto_compact:
            self._auto_compact_mor(mstore, report, kw)
        self.register(name, mstore.read(self.spark))
        return report

    def merge_mor(
        self,
        name: str,
        updates,
        key: str,
        mstore,
        auto_compact: bool = True,
        **kw,
    ) -> dict:
        """Merge-on-read MERGE/upsert (storage/cow.merge_mor)."""
        from columnar_database_project_spark.storage.cow import merge_mor

        report = merge_mor(self.spark, mstore, updates, key, **kw)
        if auto_compact:
            self._auto_compact_mor(mstore, report, kw)
        self.register(name, mstore.read(self.spark))
        return report

    def update_where_cow(
        self, name: str, predicate, assignments: dict, mstore, **kw
    ) -> dict:
        from columnar_database_project_spark.storage.cow import (
            update_where_cow,
        )

        report = update_where_cow(
            self.spark, mstore, predicate, assignments, **kw
        )
        self.register(name, mstore.read(self.spark))
        return report

    def merge_cow(self, name: str, updates, key: str, mstore, **kw) -> dict:
        from columnar_database_project_spark.storage.cow import merge_cow

        report = merge_cow(self.spark, mstore, updates, key, **kw)
        self.register(name, mstore.read(self.spark))
        return report

    def time_travel_cow(self, name: str, mstore, version: int | None = None):
        """Register (and return) ``name`` as of a manifest version —
        resolving a manifest is metadata-only, like ``time_travel``."""
        df = mstore.read(self.spark, version)
        self.register(name, df)
        return df

    def compact_manifest(self, name: str, mstore, **kw) -> dict:
        """Compact a manifest table (storage/cow.compact_manifest) and
        refresh registration + index — block identity changes with the
        manifest, same rebuild rule as ``compact``."""
        from columnar_database_project_spark.storage.cow import (
            compact_manifest,
        )

        report = compact_manifest(self.spark, mstore, **kw)
        if report["compacted"]:
            self.register_manifest(name, mstore, with_index=self.index is not None)
        return report

    def register_manifest(
        self, name: str, mstore, with_index: bool = True, blooms=None
    ) -> None:
        """Register a manifest table AND rebuild the zone-map index
        from its current file list, so the observability stack
        (explain / access log / prefetch) keys on the live snapshot's
        blocks. Call again after any CoW verb or compaction — block
        identity changes with the manifest, the same rebuild rule as
        ``compact``. ``blooms``: optional Bloom sidecar to attach for
        point-lookup prediction."""
        from columnar_database_project_spark.sources.index import (
            MicroBlockIndex,
        )

        self.register(name, mstore.read(self.spark))
        if with_index:
            idx = MicroBlockIndex.build_from_files(
                mstore.files_for(), table_id=name
            )
            if blooms is not None:
                idx.attach_blooms(blooms)
            self.index = idx

    def compact(self, name: str, path: str, **kw) -> dict:
        """Compact a registered table's microblock directory (see
        ``sources.microblock.compact_blocks``) and refresh the
        registration — block identity changes, so an attached index
        for this table must be rebuilt by the caller."""
        from columnar_database_project_spark.sources.microblock import (
            compact_blocks,
            recover_compaction,
        )

        # heal any crash leftovers of a PREVIOUS compaction first —
        # restores the backup if the last swap died between renames,
        # clears stale staging dirs otherwise (no-op on healthy state)
        recovery = recover_compaction(path)
        report = compact_blocks(self.spark, path, **kw)
        report["recovery"] = recovery["state"]
        if report["compacted"]:
            self.spark.catalog.refreshByPath(path)
            self.register(name, self.spark.read.parquet(path))
        return report

    # ------------------------------------------------------------- queries
    def query(self, sql: str) -> DataFrame:
        """Run SQL against the registered catalog.

        Catalyst does everything the reference hand-rolled (parse:
        query_enginev5.py:74-85, prune: :87-95, execute via DuckDB:
        :302-305). Our added value is the observation hook: when an
        index is attached we predict the touched blocks from the WHERE
        clause and feed the access log / history / prefetch stack —
        exactly the reference's stage-3 side effects
        (query_enginev5.py:251-261), but append-only and locked.
        """
        df = self.spark.sql(sql)
        self._observe(sql)
        return df

    def explain(self, sql: str) -> dict:
        """Inspect a query WITHOUT running it: one dict covering both
        planning layers. The reference sketches an explain/metrics
        verifier around its engine (SURVEY §4.3); ours reports the
        zone-map layer (which blocks the prediction says the query
        touches — what the cache/prefetch stack keys on) and
        Catalyst's physical facts (what will actually execute:
        exchanges, broadcast joins, pushed filters, codegen spans).

        Plan-only and side-effect-free: no job is submitted, and —
        unlike ``query`` — ``_observe`` is NOT tapped, so explaining a
        query does not pollute the access log the prefetcher trains
        on."""
        from columnar_database_project_spark.plans.verify import (
            count_shuffles,
            formatted_plan,
            has_broadcast_join,
            pushed_filters,
            whole_stage_codegen_spans,
        )

        df = self.spark.sql(sql)
        out: dict = {
            "physical": {
                "exchanges": count_shuffles(df),
                "broadcast_join": has_broadcast_join(df),
                "pushed_filters": pushed_filters(df),
                "codegen_spans": whole_stage_codegen_spans(df),
                "plan": formatted_plan(df),
            }
        }
        if self.index is not None:
            predicted = self.index.predict_blocks_for_sql(sql)
            total = self.index.num_blocks
            zone: dict = {
                "blocks_total": total,
                "blocks_predicted": len(predicted),
                "selectivity": round(len(predicted) / max(total, 1), 4),
                # bounded: ids are for inspection, not enumeration
                "predicted_ids": sorted(predicted)[:64],
            }
            if self.index.blooms is not None:
                # breakdown: how much of the pruning is the Bloom
                # sidecar's (point lookups) vs the zone maps' (ranges)
                from columnar_database_project_spark.plans.sql_where import (
                    extract_where,
                )

                zone_only = self.index.candidate_blocks(
                    extract_where(sql), use_blooms=False
                )
                zone["blocks_predicted_zone_only"] = len(zone_only)
            if self.cache is not None:
                cached = set(self.cache.cached_ids())
                zone["predicted_cached"] = sum(
                    1 for b in predicted if b in cached
                )
            out["zone_map"] = zone
        elif "scan orc" in out["physical"]["plan"].lower():
            # Guard (VERDICT r7 #6): no index is attached and pyarrow
            # exposes no ORC stripe statistics for a footer build, so
            # an ORC-backed query must say WHY the predicted-pruning
            # section is absent instead of silently reading as
            # "nothing pruned". Spark's native ORC predicate pushdown
            # still applies (physical.pushed_filters), and a scan-built
            # index restores the full report.
            out["zone_map"] = {
                "unavailable": (
                    "zone-map index unavailable (ORC backend, no index "
                    "attached) — native ORC predicate pushdown only; "
                    "attach MicroBlockIndex.build_from_scan(spark, path,"
                    " format='orc') for the predicted-pruning report"
                )
            }
        return out

    # The result cache is for dashboard-sized outputs (aggregates,
    # top-k); anything bigger belongs to the block cache / parquet
    # layer below, not driver memory.
    RESULT_CACHE_MAX_ROWS = 10_000
    RESULT_CACHE_CAPACITY = 64

    def _catalog_token(self) -> tuple:
        """Change-detection token for the WHOLE catalog: the
        registration version (every register() bump — all DML paths
        re-register) plus the table directory's file-freshness token,
        so out-of-band file changes invalidate too. Whole-catalog
        granularity is deliberate: parsing SQL for referenced tables
        would let an unrelated register() keep entries alive, but a
        missed reference would serve STALE results — conservative
        invalidation is the correct default for a cache whose misses
        merely recompute."""
        from columnar_database_project_spark.catalog import file_freshness

        dir_tok = file_freshness(self._table_dir) if self._table_dir else ()
        return (self._catalog_version, dir_tok)

    def query_cached(self, sql: str, max_rows: int | None = None):
        """``query(sql)`` materialized to pandas, memoized under
        (normalized SQL, catalog token) — the layer ABOVE the block
        cache: blocks amortize scans across different queries, this
        amortizes the repeated IDENTICAL query (dashboards, polling
        clients). LRU-bounded; results larger than ``max_rows`` are
        returned but never stored (driver-memory guard); any catalog
        change or on-disk table change invalidates by key. Returns a
        COPY so callers cannot mutate the cached frame.

        Observability decision (pinned by test_engine_and_prefetch):
        a cache HIT deliberately does NOT tap ``_observe`` — the
        access log / history / prefetch stack model BLOCK reads, and
        a hit reads no blocks; logging phantom accesses would train
        the prefetcher to warm blocks the result cache already made
        irrelevant. The reference logs every query because it has no
        result cache to skip the read (query_enginev5.py:251-261);
        ``result_cache_stats()`` carries the hit-side telemetry
        instead."""
        limit = self.RESULT_CACHE_MAX_ROWS if max_rows is None else max_rows
        key = (" ".join(sql.split()), self._catalog_token())
        hit = self._result_cache.get(key)
        if hit is not None:
            self._result_cache.move_to_end(key)
            self._result_cache_stats["hits"] += 1
            return hit.copy()
        result = self.query(sql).toPandas()
        if len(result) > limit:
            self._result_cache_stats["bypassed"] += 1
            return result
        self._result_cache_stats["misses"] += 1
        self._result_cache[key] = result.copy()
        while len(self._result_cache) > self.RESULT_CACHE_CAPACITY:
            self._result_cache.popitem(last=False)  # evict LRU
        return result

    def result_cache_stats(self) -> dict:
        return dict(self._result_cache_stats, size=len(self._result_cache))

    def _observe(self, sql: str) -> None:
        if self.index is None and self.logger is None and self.history is None:
            return
        query_id = uuid.uuid4().hex[:12]
        blocks: list[int] = []
        if self.index is not None:
            try:
                blocks = self.index.predict_blocks_for_sql(sql)
            except Exception:
                blocks = []
        if not blocks:
            return
        ts = time.time()
        if self.logger is not None:
            self.logger.log(blocks, ts=ts, query_id=query_id)
        if self.history is not None:
            self.history.record_many(blocks)
        if self.cache is not None:
            for b in blocks:
                self.cache.touch(b)


def build_full_stack(
    spark: SparkSession,
    block_table_path: str,
    table_name: str = "mytable",
    log_path: str = "access_log.jsonl",
    cache_capacity: int = 128,
    history_len: int = 500,
    prefetch_interval: float = 60.0,
    scheduler=None,
):
    """Wire the complete engine the way the reference's working entry
    point does (run_with_prefetch_loop.py:12-44): cache(128) +
    history(500) + logger + index + engine, plus — when a trained
    scheduler is supplied — the background PrefetchService.

    Returns (engine, service); ``service`` is None without a scheduler
    and is NOT started — call ``service.start()`` to launch the loop.
    """
    from columnar_database_project_spark.ml.prefetch import (
        Prefetcher,
        PrefetchService,
    )
    from columnar_database_project_spark.sources.index import MicroBlockIndex
    from columnar_database_project_spark.storage.access_logger import (
        AccessLogger,
        GlobalHistory,
    )
    from columnar_database_project_spark.storage.block_cache import BlockCache

    index = MicroBlockIndex.build(block_table_path, table_id=table_name)
    cache = BlockCache(capacity=cache_capacity)
    logger = AccessLogger(log_path)
    history = GlobalHistory(maxlen=history_len)
    engine = MicroBlockEngine(
        spark, index=index, cache=cache, logger=logger, history=history
    )
    engine.register(table_name, spark.read.parquet(block_table_path))
    service = None
    if scheduler is not None:
        service = PrefetchService(
            scheduler,
            Prefetcher(spark, index, cache),
            history,
            cache,
            interval=prefetch_interval,
            history_len=min(history_len, 100),
        )
    return engine, service
