"""Round-12 regression tests for the r11 ADVICE defects:

- ``_region_nation_keys`` must serve an ORC-only table dir (it
  previously hard-required ``nation.parquet``/``region.parquet``).
- The denorm layout-leg manifest must round-trip directory-source
  freshness tokens through JSON (previously the tuple-vs-list
  mismatch silently rebuilt the orders⋈customer leg on every call).
- ``catalog.get_layout_override`` is check-and-fetch in one call: a
  leg whose parent regenerated between plan builds degrades q5/q3 to
  the flat plan instead of raising FileNotFoundError.
- ``streaming.vectors._store_relation`` invalidates on an IN-PLACE
  part-file overwrite inside a cell dir (dir-stat token missed it).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from columnar_database_project_spark.catalog import (
    clear_layout_overrides,
    get_layout_override,
    load_table,
)


class TestRegionNationOrcFallback:
    def test_orc_only_dir(self, spark, sf_dir, tmp_path):
        from columnar_database_project_spark.operators.relational import (
            _region_nation_keys,
        )

        d = str(tmp_path / "orc_dims")
        os.makedirs(d)
        for name in ("nation", "region"):
            load_table(spark, sf_dir, name).coalesce(1).write.mode(
                "overwrite"
            ).orc(os.path.join(d, f"{name}.orc"))
        want_keys, want_names = _region_nation_keys(sf_dir, "ASIA")
        keys, names = _region_nation_keys(d, "ASIA")
        assert sorted(keys) == sorted(want_keys)
        assert names == want_names

    def test_q5_runs_on_orc_only_dir(self, spark, sf_dir, tmp_path):
        from columnar_database_project_spark.operators.relational import (
            q5_local_supplier_volume,
        )

        d = str(tmp_path / "orc_sf")
        os.makedirs(d)
        for name in ("nation", "region", "customer", "supplier", "orders",
                     "lineitem"):
            load_table(spark, sf_dir, name).coalesce(1).write.mode(
                "overwrite"
            ).orc(os.path.join(d, f"{name}.orc"))
        got = sorted(
            tuple(r) for r in q5_local_supplier_volume(spark, d).collect()
        )
        want = sorted(
            tuple(r)
            for r in q5_local_supplier_volume(spark, sf_dir).collect()
        )
        assert got == want


class TestDenormManifestDirSources:
    def test_no_rebuild_on_directory_sources(self, spark, sf_dir, tmp_path):
        """Spark-written (directory) orders/customer sources: the
        second materialize call must REUSE the denorm leg — the r11
        bug rebuilt it every time because the manifest held tuples of
        tuples that never compared equal to json.load's lists."""
        from columnar_database_project_spark.sources.bucketed import (
            DENORM_NAME,
            materialize_fact_layout,
        )

        d = str(tmp_path / "dir_sf")
        os.makedirs(d)
        for name in ("orders", "customer", "lineitem"):
            load_table(spark, sf_dir, name).repartition(2).write.mode(
                "overwrite"
            ).parquet(os.path.join(d, f"{name}.parquet"))
        base = str(tmp_path / "layout")
        named: dict = {}
        try:
            named = materialize_fact_layout(spark, d, base, n_buckets=4)
            assert DENORM_NAME in named
            manifest = os.path.join(
                base, f"{DENORM_NAME}_layout_manifest.json"
            )
            t0 = os.path.getmtime(manifest)
            materialize_fact_layout(spark, d, base, n_buckets=4)
            assert os.path.getmtime(manifest) == t0, (
                "denorm leg rebuilt despite fresh directory sources"
            )
            # fact tables with directory sources reuse too
            fact_manifest = os.path.join(
                base, "lineitem_layout_manifest.json"
            )
            t1 = os.path.getmtime(fact_manifest)
            materialize_fact_layout(spark, d, base, n_buckets=4)
            assert os.path.getmtime(fact_manifest) == t1
        finally:
            clear_layout_overrides(spark)
            for tbl in named.values():
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")


class TestGetLayoutOverrideSingleCall:
    def test_stale_leg_degrades_to_flat_plan(self, spark, sf_dir, tmp_path):
        """Parent regeneration between the rewrite decision and the
        leg fetch: q5 must fall back to the flat plan (same rows), not
        raise — the old has_layout_override + load_table pair raced
        exactly here."""
        from columnar_database_project_spark.operators.relational import (
            q5_local_supplier_volume,
        )
        from columnar_database_project_spark.sources.bucketed import (
            DENORM_NAME,
            materialize_fact_layout,
        )

        d = str(tmp_path / "race_sf")
        os.makedirs(d)
        for name in ("nation", "region", "customer", "supplier", "orders",
                     "lineitem"):
            load_table(spark, sf_dir, name).coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(d, f"{name}.parquet"))
        base = str(tmp_path / "layout")
        named: dict = {}
        try:
            named = materialize_fact_layout(spark, d, base, n_buckets=4)
            assert get_layout_override(spark, d, DENORM_NAME) is not None
            want = sorted(
                tuple(r)
                for r in q5_local_supplier_volume(spark, d).collect()
            )
            # regenerate a parent in place → leg goes stale
            load_table(spark, sf_dir, "customer").coalesce(1).write.mode(
                "overwrite"
            ).parquet(os.path.join(d, "customer.parquet"))
            assert get_layout_override(spark, d, DENORM_NAME) is None
            got = sorted(
                tuple(r)
                for r in q5_local_supplier_volume(spark, d).collect()
            )
            assert got == want  # same source rows → same result, flat plan
        finally:
            clear_layout_overrides(spark)
            for tbl in named.values():
                spark.sql(f"DROP TABLE IF EXISTS {tbl}")


class TestStoreRelationInPlaceOverwrite:
    def test_token_sees_part_file_rewrite(self, spark, tmp_path):
        from columnar_database_project_spark.streaming.vectors import (
            _store_relation,
        )

        p = str(tmp_path / "store")
        df = spark.range(4).select(
            F.col("id").alias("vec_id"), (F.col("id") % 2).alias("cell")
        )
        df.coalesce(1).write.partitionBy("cell").parquet(p)
        n0 = _store_relation(spark, p).count()
        assert n0 == 4
        # In-place overwrite of one cell's part file: same file NAME,
        # same cell-dir stat — only the part file's mtime/size move.
        cell0 = os.path.join(p, "cell=0")
        part = next(
            f for f in os.listdir(cell0) if f.endswith(".parquet")
        )
        tmp_out = str(tmp_path / "one")
        spark.range(10, 13).select(
            F.col("id").alias("vec_id")
        ).coalesce(1).write.mode("overwrite").parquet(tmp_out)
        new_part = next(
            f for f in os.listdir(tmp_out) if f.endswith(".parquet")
        )
        import shutil

        shutil.copyfile(
            os.path.join(tmp_out, new_part), os.path.join(cell0, part)
        )
        # drop Hadoop local-FS checksum sidecar — stale after the
        # out-of-band rewrite (the overwrite this test simulates is
        # from a non-Hadoop writer)
        crc = os.path.join(cell0, f".{part}.crc")
        if os.path.exists(crc):
            os.remove(crc)
        n1 = _store_relation(spark, p).count()
        assert n1 == 5  # 3 rewritten rows in cell 0 + 2 in cell 1
