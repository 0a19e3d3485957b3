"""Pluggable embedding models behind the engine's batched-UDF interface —
the worked example for swapping a REAL model in for the deterministic
hash embedder (functions/vector.embed_text_udf).

The reference's contract is ``EmbeddingModel.vectorize(list[str]) ->
list[vector]`` (kgraph_vector_db.py:18-49), called once per batch
(kgraph_vector_db.py:123-170).  The Spark-side translation of that
contract, and the three things every real integration must get right:

1. **One model per executor process, not per batch.**  ``make_embed_udf``
   closes over a factory and instantiates lazily inside the UDF on first
   call; Spark reuses the Python worker across batches/tasks, so the
   (expensive) model load is paid once per executor core, never per row.
2. **Weights ship by broadcast, not by closure pickling.**  A factory
   that captures a ``spark.sparkContext.broadcast(weights)`` handle sends
   the weights to each executor once over the torrent broadcast channel;
   capturing a raw numpy array instead would re-pickle it into EVERY task
   binary.  See ``linear_model_factory``.
3. **Arrow batch size bounds peak memory.**  The UDF receives
   ``spark.sql.execution.arrow.maxRecordsPerBatch`` rows (default 10k)
   and re-slices them to the model's own ``batch_size`` — GPU/encoder
   batch limits are the model's business, Arrow's batching is Spark's.

``LinearHashModel`` below is the in-repo stand-in with the exact shape
of a real encoder (weight matrix lookup → pool → normalize) so the whole
pattern is executable and oracle-testable in this environment;
``sentence_transformer_factory`` shows the identical wiring for a real
transformer checkpoint and degrades to a clear ImportError where the
library isn't installed.
"""

from __future__ import annotations

import zlib
from collections.abc import Callable

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T


class LinearHashModel:
    """A minimal "real-model-shaped" encoder: a (vocab_buckets × dim)
    weight matrix, token → bucket by a stable hash, mean-pool the bucket
    rows, L2-normalize.  ``vectorize`` is the reference's batch contract
    (kgraph_vector_db.py:143).  Deterministic given the weights, so tests
    can assert exact parity with a driver-side call."""

    def __init__(self, weights: np.ndarray):
        self.weights = np.asarray(weights, dtype=np.float32)
        self.buckets, self.dim = self.weights.shape

    @staticmethod
    def init_weights(buckets: int = 1024, dim: int = 16,
                     seed: int = 7) -> np.ndarray:
        rng = np.random.RandomState(seed)
        return rng.standard_normal((buckets, dim)).astype(np.float32)

    def _bucket(self, token: str) -> int:
        return zlib.crc32(token.encode("utf-8")) % self.buckets

    def vectorize(self, texts: list[str]) -> list[list[float]]:
        out: list[list[float]] = []
        for text in texts:
            toks = text.split() if text else []
            if not toks:
                out.append([0.0] * self.dim)
                continue
            rows = self.weights[[self._bucket(t) for t in toks]]
            v = rows.mean(axis=0)
            n = float(np.linalg.norm(v))
            out.append((v / n).tolist() if n > 0 else [0.0] * self.dim)
        return out


def make_embed_udf(model_factory: Callable[[], object],
                   batch_size: int = 256):
    """Wrap ANY ``vectorize(list[str])`` model as the engine's batched
    embedding UDF.  The returned UDF is a drop-in for
    ``build_vector_records(..., embed_udf=...)`` — swapping models never
    touches the engine.

    ``model_factory`` runs on the executor, once per Python worker (see
    module docstring #1); it must be picklable, so capture broadcast
    handles, names, or paths — not live models.
    """
    state: dict[str, object] = {}

    @F.pandas_udf(T.ArrayType(T.FloatType()))
    def embed(texts: pd.Series) -> pd.Series:
        if "model" not in state:
            state["model"] = model_factory()
        model = state["model"]
        vals = texts.fillna("").tolist()
        out: list[list[float]] = []
        for i in range(0, len(vals), batch_size):
            out.extend(model.vectorize(vals[i:i + batch_size]))
        return pd.Series(out)

    return embed


def linear_model_factory(spark, weights: np.ndarray | None = None,
                         **init_kw) -> Callable[[], LinearHashModel]:
    """The broadcast-weights pattern, end to end: weights are broadcast
    ONCE from the driver; the factory captures only the (tiny, picklable)
    broadcast handle and materializes the model executor-side."""
    w = weights if weights is not None else LinearHashModel.init_weights(
        **init_kw)
    bc = spark.sparkContext.broadcast(w)
    return lambda: LinearHashModel(bc.value)


def sentence_transformer_factory(
        model_name: str = "all-MiniLM-L6-v2",
        batch_size: int = 64) -> Callable[[], object]:
    """Identical wiring for a real transformer encoder.  The checkpoint
    loads from the executor-local cache by NAME (weights do not transit
    the driver — for multi-GB models that beats broadcast); the adapter
    narrows the library's API to the ``vectorize`` contract.

    Not installable in this environment — the factory raises a clear
    ImportError at executor model-load time if the library is missing.
    """
    def factory():
        try:
            from sentence_transformers import SentenceTransformer
        except ImportError as e:  # pragma: no cover - library not shipped
            raise ImportError(
                "sentence-transformers is not installed; pip install it on "
                "the executors (or bake it into the image) to use "
                "sentence_transformer_factory") from e

        class _Adapter:  # pragma: no cover - requires the library
            def __init__(self):
                self.m = SentenceTransformer(model_name)

            def vectorize(self, texts: list[str]) -> list[list[float]]:
                return self.m.encode(
                    texts, batch_size=batch_size,
                    normalize_embeddings=True).tolist()

        return _Adapter()

    return factory
