"""Pluggable embedding models (kgraph_vector_db.py:18-49 EmbeddingModel
seam): the broadcast-weights + per-executor lazy-load + batch-slice
pattern, proven end-to-end by swapping a model into the vector write path
and asserting exact parity with a driver-side vectorize call."""

import numpy as np
from pyspark.sql import functions as F

from kgraphmemory_spark.functions.embedding_models import (
    LinearHashModel,
    linear_model_factory,
    make_embed_udf,
    sentence_transformer_factory,
)
from kgraphmemory_spark.operators.vectors import build_vector_records


def test_linear_model_is_deterministic_and_normalized():
    m = LinearHashModel(LinearHashModel.init_weights(dim=8))
    a, b = m.vectorize(["hash join scan", "hash join scan"])
    assert a == b and len(a) == 8
    assert abs(sum(x * x for x in a) - 1.0) < 1e-5
    assert m.vectorize([""]) == [[0.0] * 8]
    # different text → different direction
    assert m.vectorize(["sort merge"])[0] != a


def test_udf_matches_driver_side_vectorize(spark):
    factory = linear_model_factory(spark, dim=8, buckets=64)
    udf = make_embed_udf(factory, batch_size=3)  # forces batch re-slicing
    texts = [f"tok{i} tok{i % 3} shared" for i in range(10)] + ["", "solo"]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    got = {r.text: [round(float(x), 5) for x in r.v]
           for r in df.select("text", udf(F.col("text")).alias("v")).collect()}
    want = dict(zip(texts, factory().vectorize(texts)))
    for t in texts:
        assert got[t] == [round(float(x), 5) for x in want[t]], t


def test_swapped_model_in_vector_write_path(spark):
    """build_vector_records(embed_udf=...) swaps the model without
    touching the engine; record ids / metadata stay identical, vectors
    come from the plugged model."""
    factory = linear_model_factory(spark, dim=8, buckets=64)
    objs = spark.createDataFrame(
        [("ent:a", "alpha", "urn:kg:Token"), ("ent:b", "beta", "urn:kg:Token")],
        "entity_id string, name string, entity_type string")
    default = build_vector_records(objs).select("record_id", "vector_id").collect()
    swapped = build_vector_records(
        objs, embed_udf=make_embed_udf(factory)).collect()
    assert {(r.record_id, r.vector_id) for r in swapped} == {
        (r.record_id, r.vector_id) for r in default}
    m = factory()
    by_key = {(r.uri, r.vector_id): r for r in swapped}
    v = by_key[("ent:a", "entity_value")]
    assert [round(float(x), 5) for x in v.vector] == [
        round(float(x), 5) for x in m.vectorize([v.text])[0]]


def test_missing_library_raises_helpfully():
    import pytest
    with pytest.raises(ImportError, match="sentence-transformers"):
        sentence_transformer_factory()()
