"""Vector functions: cosine similarity (JVM-side), deterministic test
embedder (pandas UDF, Arrow-batched).

Mirrors the reference's vector store semantics: cosine distance
(kgraph_vector_db.py:20, Distance.COSINE), pluggable EmbeddingModel
(kgraph_vector_db.py:18-49) — here a hash-based unit-vector stub so tests
are model-free and reproducible (FIXTURES.md §2.7).
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

EMBED_DIM = 16


def dot(a: Column, b: Column) -> Column:
    """JVM-side dot product over two array<float|double> columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda s, x: s + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda s, x: s + x * x))


def cosine(a: Column, b: Column) -> Column:
    """Cosine similarity, null-safe for zero vectors (→ 0.0)."""
    d = norm(a) * norm(b)
    return F.when(d == 0.0, F.lit(0.0)).otherwise(dot(a, b) / d).cast("double")


def cosine_to_literal(a: Column, qvec: list[float]) -> Column:
    """Cosine of a column against a fixed query vector (driver-side constant
    folded into the plan; the scan stays distributed — SURVEY.md §3.2)."""
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return cosine(a, q)


def embed_text(text: str, dim: int = EMBED_DIM) -> list[float]:
    """Deterministic hash embedder: sha256-seeded pseudo-random unit vector
    per token, mean-pooled, L2-normalized.  Pure function (oracle-shared)."""
    toks = text.split() if text else []
    if not toks:
        return [0.0] * dim
    acc = np.zeros(dim, dtype=np.float64)
    for t in toks:
        h = hashlib.sha256(t.encode("utf-8")).digest()
        # 16 signed bytes → deterministic direction for this token
        v = np.frombuffer(h[:dim], dtype=np.int8).astype(np.float64)
        n = math.sqrt(float((v * v).sum()))
        if n > 0:
            acc += v / n
    n = math.sqrt(float((acc * acc).sum()))
    if n == 0:
        return [0.0] * dim
    return [float(x) for x in (acc / n)]


@F.pandas_udf(T.ArrayType(T.FloatType()))
def embed_text_udf(text: pd.Series) -> pd.Series:
    """Batched embedding UDF — the Spark analog of the reference's
    `vectorize(list[str])` batch API (kgraph_vector_db.py:143)."""
    return text.map(lambda s: embed_text(s or ""))
