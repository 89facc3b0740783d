from __future__ import annotations

import pytest

from udacitycapstonedataengineer_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    # 6g heap: the whole suite shares this one JVM, and the registry's
    # persist/localCheckpoint blocks accumulate across ~450 tests —
    # at the 1g default the session OOMs ("Task serialization failed:
    # Java heap space") deep into the run (first seen round 8 when the
    # registry grew past ~220 queries). The per-module sweeper below
    # keeps the steady-state footprint bounded; the headroom makes the
    # suite robust to ordering.
    s = get_spark(
        app_name="tests",
        master="local[4]",
        shuffle_partitions=4,
        extra_conf={"spark.driver.memory": "6g"},
    )
    yield s
    s.stop()


@pytest.fixture(autouse=True, scope="module")
def _sweep_persisted_blocks():
    """Between test MODULES, drop every cached DataFrame and persisted
    RDD (incl. localCheckpoint blocks, which spark.catalog.clearCache
    does NOT touch). Registered queries persist intermediates they can
    never unpersist (the result is lazy), so without this sweep the
    session-scoped JVM accumulates blocks for the whole suite."""
    yield
    # the fixture may run for modules that never started Spark
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is None:
        return
    try:
        active.catalog.clearCache()
        jmap = active.sparkContext._jsc.getPersistentRDDs()
        for jrdd in list(jmap.values()):
            jrdd.unpersist()
    except Exception:  # noqa: BLE001
        pass  # sweeping is best-effort; never fail a module over it


@pytest.fixture(scope="session")
def sf_dir():
    return SF_DIR
