"""Checkpoint/resume: a killed run resumes from the last committed snapshot
without reprocessing; lineage rows exist per stage (north rule)."""

import json
import os
import shutil

import pytest

from kgraphmemory_spark import datagen
from kgraphmemory_spark.io.snapshots import SnapshotCatalog
from kgraphmemory_spark.pipeline import run_pipeline


@pytest.fixture()
def workdir(tmp_path):
    return str(tmp_path / "kg_snapshots")


def _rel_set(kg):
    return {(r.subj, r.pred, r.obj, r.weight, r.ndocs)
            for r in kg.relations.collect()}


def test_full_resume_identical(spark, workdir):
    pages = datagen.generate_pages(spark, 30, seed=31)
    kg1 = run_pipeline(spark, pages, workdir=workdir)
    first = _rel_set(kg1)
    assert kg1.stages_resumed == []

    kg2 = run_pipeline(spark, pages, workdir=workdir)
    assert "docs_clean" in kg2.stages_resumed
    assert "relations" in kg2.stages_resumed
    assert _rel_set(kg2) == first


def test_partial_resume_after_kill(spark, workdir):
    """Simulate a kill after stage 3: later-stage snapshots missing →
    earlier stages must be reused, later recomputed, results identical."""
    pages = datagen.generate_pages(spark, 30, seed=31)
    kg1 = run_pipeline(spark, pages, workdir=workdir)
    want = _rel_set(kg1)

    # "kill" after linked: wipe everything downstream of linking
    for stage in ("canonical_map", "entities", "relations", "frames",
                  "slots", "triples", "provenance"):
        shutil.rmtree(os.path.join(workdir, stage))

    kg2 = run_pipeline(spark, pages, workdir=workdir)
    assert set(kg2.stages_resumed) == {"docs_clean", "mentions",
                                       "raw_triples", "alias_table", "linked"}
    assert _rel_set(kg2) == want


def test_uncommitted_stage_not_trusted(spark, workdir):
    """Data dir without a manifest (crash mid-write) is rebuilt."""
    pages = datagen.generate_pages(spark, 10, seed=7)
    run_pipeline(spark, pages, workdir=workdir)
    # remove just the manifest of 'mentions' — simulates torn write
    os.remove(os.path.join(workdir, "mentions", "_MANIFEST.json"))
    kg2 = run_pipeline(spark, pages, workdir=workdir)
    assert "mentions" not in kg2.stages_resumed
    assert "docs_clean" in kg2.stages_resumed
    cat = SnapshotCatalog(workdir)
    assert cat.committed("mentions")  # recommitted


def test_lineage_rows_written(spark, workdir):
    pages = datagen.generate_pages(spark, 25, seed=13)
    run_pipeline(spark, pages, workdir=workdir)
    cat = SnapshotCatalog(workdir)
    lin = cat.read_lineage(spark, "linked")
    rows = lin.collect()
    assert {c for c in lin.columns} >= {"bucket", "out_count", "stage"}
    assert sum(r.out_count for r in rows) == cat.manifest("linked")["rows"]
    # link-score histogram metric present on the linked stage
    assert "score_histogram" in lin.columns
    man = json.load(open(os.path.join(workdir, "linked", "_MANIFEST.json")))
    assert man["rows"] > 0 and man["schema"]


def test_snapshot_backend_recorded(spark, tmp_path):
    """Round 4 (SURVEY §7.1): the manifest records which backend holds
    the stage data.  This sandbox ships no Iceberg jars, so detection
    must return False and commits must take (and record) the
    parquet+manifest path; with jars + a configured catalog the same
    interface commits Iceberg snapshots (skip-gated below)."""
    from kgraphmemory_spark.io.snapshots import (
        SnapshotCatalog,
        _iceberg_catalog,
        iceberg_available,
    )
    assert iceberg_available(spark) is False
    assert _iceberg_catalog(spark) is None
    cat = SnapshotCatalog(str(tmp_path / "snap"))
    out = cat.stage(spark, "s1",
                    lambda: spark.range(3).selectExpr("id", "id*2 AS v"))
    assert out.count() == 3
    man = cat.manifest("s1")
    assert man["backend"] == "parquet+manifest"
    assert "table" not in man
    # catalog configured but no jars → still the parquet fallback (the
    # opt-in alone must not redirect data the cluster cannot read)
    spark.conf.set("spark.kgm.iceberg.catalog", "icecat")
    try:
        assert _iceberg_catalog(spark) is None
    finally:
        spark.conf.unset("spark.kgm.iceberg.catalog")


def test_snapshot_iceberg_commit(spark, tmp_path):
    """Real Iceberg snapshot commit — runs only on a cluster whose
    classpath carries the Iceberg Spark runtime AND a configured
    catalog."""
    import pytest as _pytest

    from kgraphmemory_spark.io.snapshots import (
        SnapshotCatalog,
        _iceberg_catalog,
    )
    spark.conf.set("spark.kgm.iceberg.catalog", "icecat")
    try:
        if _iceberg_catalog(spark) is None:
            _pytest.skip("no Iceberg runtime on the classpath")
        cat = SnapshotCatalog(str(tmp_path / "snap_ice"))
        out = cat.stage(spark, "s1", lambda: spark.range(3))
        assert out.count() == 3
        assert cat.manifest("s1")["backend"] == "iceberg"
        # resume path reads the table back through the manifest
        assert cat.read(spark, "s1").count() == 3
    finally:
        spark.conf.unset("spark.kgm.iceberg.catalog")
