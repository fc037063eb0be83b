"""load_table must be self-sufficient under a vanilla SparkSession.

The verification driver builds its OWN SparkSession without
``spark.sql.legacy.parquet.nanosAsLong``; round 1 proved that relying on
the repo's session factory (session.py:46) makes every ``events`` query
throw PARQUET_TYPE_ILLEGAL. These tests simulate that driver session via
``newSession()`` + explicitly resetting the conf to its default.
"""

from __future__ import annotations

from columnar_database_project_spark.catalog import load_table


def _vanilla(spark):
    """A session sharing the JVM but WITHOUT the nanos conf."""
    s = spark.newSession()
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
    return s


def test_load_events_without_nanos_conf(spark, sf_dir):
    s = _vanilla(spark)
    df = load_table(s, sf_dir, "events")
    assert df.count() > 0
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_events_values_match_between_sessions(spark, sf_dir):
    """Same rows whichever session loads the table."""
    s = _vanilla(spark)
    a = load_table(spark, sf_dir, "events").agg({"ts": "max"}).collect()[0][0]
    b = load_table(s, sf_dir, "events").agg({"ts": "max"}).collect()[0][0]
    assert a == b


def test_load_non_nanos_table_unaffected(spark, sf_dir):
    s = _vanilla(spark)
    df = load_table(s, sf_dir, "nation")
    assert df.count() == 25


def test_pyarrow_fallback_path(spark, sf_dir, tmp_path):
    """The fallback loader produces µs timestamps from a ns file."""
    import os

    from columnar_database_project_spark.catalog import _load_via_pyarrow

    path = os.path.join(sf_dir, "events.parquet")
    df = _load_via_pyarrow(spark, path)
    assert df.count() > 0
    assert dict(df.dtypes)["ts"] == "timestamp"


def test_conf_restored_after_load(spark, sf_dir):
    """load_table must not leave nanosAsLong set on the caller's
    session (it is scoped to the read; actions on the returned
    DataFrame still work after restore)."""
    s = _vanilla(spark)
    key = "spark.sql.legacy.parquet.nanosAsLong"
    before = s.conf.get(key, None)     # built-in default reads as "false"
    df = load_table(s, sf_dir, "events")
    assert s.conf.get(key, None) == before
    assert df.count() > 0          # action succeeds post-restore
    # and an explicit pre-set value is restored, not clobbered
    s.conf.set(key, "false")
    load_table(s, sf_dir, "events").count()
    assert s.conf.get(key) == "false"
    s.conf.unset(key)


def test_pyarrow_fallback_schema_matches_native(spark, sf_dir):
    """Arrow-direct fallback must produce the same schema as the
    native reader (no pandas float64 drift on int columns)."""
    import os

    from columnar_database_project_spark.catalog import _load_via_pyarrow

    native = load_table(spark, sf_dir, "events")
    fallback = _load_via_pyarrow(spark, os.path.join(sf_dir, "events.parquet"))
    assert dict(fallback.dtypes) == dict(native.dtypes)


def test_orc_fallback_under_vanilla_session(spark, sf_dir, tmp_path):
    """The ORC fallback must work under the driver's vanilla session
    too (no engine confs involved — spark.read.orc is conf-free), and
    an orc-written events table must come back with the same stable
    timestamp type the parquet path guarantees."""
    import os

    from columnar_database_project_spark.sources.microblock import MicroBlockWriter

    s = _vanilla(spark)
    d = str(tmp_path / "orc_tables")
    os.makedirs(d)
    ev = load_table(spark, sf_dir, "events")
    MicroBlockWriter(block_rows=5000, format="orc").write(
        ev, os.path.join(d, "events.orc")
    )
    df = load_table(s, d, "events")
    assert df.count() == ev.count()
    assert dict(df.dtypes)["ts"] == "timestamp"
