"""Structured Streaming incremental construction: micro-batched ingest +
finalize must reproduce the batch pipeline exactly, survive replays
(idempotent dedup), and record per-batch lineage."""

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark import datagen
from kgraphmemory_spark.pipeline import run_pipeline
from kgraphmemory_spark.streaming.incremental import (
    _stream_dir,
    finalize,
    ingest_stream,
)


@pytest.fixture(scope="module")
def streamed(spark, tmp_path_factory):
    tmp = tmp_path_factory.mktemp("stream")
    input_dir = str(tmp / "pages_in")
    workdir = str(tmp / "work")

    rows = datagen.generate_pages_rows(60, seed=7)
    # three separate files → maxFilesPerTrigger=1 forces 3 micro-batches
    for i in range(3):
        chunk = rows[i * 20:(i + 1) * 20]
        spark.createDataFrame(chunk, schema=datagen.PAGE_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(input_dir)

    n_batches = ingest_stream(spark, input_dir, workdir,
                              max_files_per_trigger=1)
    kg_stream = finalize(spark, workdir)
    pages = spark.createDataFrame(rows, schema=datagen.PAGE_SCHEMA)
    kg_batch = run_pipeline(spark, pages)
    return n_batches, workdir, kg_stream, kg_batch


def test_multiple_microbatches(streamed):
    n_batches, workdir, _, _ = streamed
    assert n_batches >= 3


def test_stream_equals_batch(streamed):
    _, _, kg_stream, kg_batch = streamed
    for name in ("relations", "entities", "triples"):
        s = {tuple(r) for r in getattr(kg_stream, name).collect()}
        b = {tuple(r) for r in getattr(kg_batch, name).collect()}
        assert s == b, name


def test_replay_is_idempotent(spark, streamed):
    _, workdir, kg_stream, _ = streamed
    before = {tuple(r) for r in kg_stream.relations.collect()}
    # simulate a replayed micro-batch: re-append one epoch's rows verbatim
    docs_dir = _stream_dir(workdir, "docs_clean")
    dup = spark.read.parquet(docs_dir).where(F.col("_epoch") == 0)
    dup.write.mode("append").parquet(docs_dir)
    men_dir = _stream_dir(workdir, "mentions")
    spark.read.parquet(men_dir).where(F.col("_epoch") == 0) \
        .write.mode("append").parquet(men_dir)

    import shutil
    shutil.rmtree(f"{workdir}/final")  # drop finalize snapshots, recompute
    again = finalize(spark, workdir)
    after = {tuple(r) for r in again.relations.collect()}
    assert after == before


def test_lineage_rows(spark, streamed):
    _, workdir, _, _ = streamed
    lin = spark.read.parquet(_stream_dir(workdir, "lineage"))
    rows = lin.orderBy("epoch").collect()
    assert len(rows) >= 3
    assert sum(r.n_docs for r in rows) == 60
    for r in rows:
        assert r.url_min <= r.url_max


def test_incremental_new_files(spark, streamed):
    """New files landing after the first pass are picked up by a second
    ingest (checkpoint skips consumed ones) and appear in finalize."""
    _, workdir, _, _ = streamed
    input_dir = workdir.replace("/work", "/pages_in")
    extra = datagen.generate_pages_rows(10, seed=99)
    spark.createDataFrame(extra, schema=datagen.PAGE_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(input_dir)
    n2 = ingest_stream(spark, input_dir, workdir, max_files_per_trigger=1)
    assert n2 >= 1
    docs = spark.read.parquet(_stream_dir(workdir, "docs_clean"))
    assert docs.select("url").distinct().count() == 70


def test_incremental_finalize_equals_batch_over_three_batches(
        spark, tmp_path):
    """finalize_incremental after EACH micro-batch: generation k's
    canonical map is generation k-1's merged via delta-CC (marker
    asserted), and the final tables equal the batch pipeline over all
    pages accumulated so far — at every generation."""
    from kgraphmemory_spark.streaming.incremental import finalize_incremental

    input_dir = str(tmp_path / "pages_in")
    workdir = str(tmp_path / "work")
    rows = datagen.generate_pages_rows(45, seed=11)

    seen = []
    for k in range(3):
        chunk = rows[k * 15:(k + 1) * 15]
        seen += chunk
        spark.createDataFrame(chunk, schema=datagen.PAGE_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(input_dir)
        assert ingest_stream(spark, input_dir, workdir,
                             max_files_per_trigger=1) >= 1
        kg_inc = finalize_incremental(spark, workdir)
        if k == 0:
            assert kg_inc.stages_resumed == []
        else:
            assert "canonical_map:delta" in kg_inc.stages_resumed
        kg_batch = run_pipeline(
            spark, spark.createDataFrame(seen, schema=datagen.PAGE_SCHEMA))
        for name in ("relations", "entities", "triples"):
            s = {tuple(r) for r in getattr(kg_inc, name).collect()}
            b = {tuple(r) for r in getattr(kg_batch, name).collect()}
            assert s == b, (k, name)
