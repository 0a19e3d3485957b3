"""Similarity search over embedding columns (array<float>).

- ``brute_force_topk`` — exact cosine top-k: distributed scan + JVM-side
  fold (F.aggregate/zip_with) + TakeOrderedAndProject.  The reference's
  vector search (kgraph_vector_db.py:190-229) is also exact; this is its
  scale-out twin.
- ``lsh_topk`` — random-hyperplane LSH (sign bits of dot products against
  broadcast hyperplanes) → probe only matching buckets → exact re-rank.
  The scale path: the scan touches 1/2^bits of the data in expectation.
- ``ivf_topk`` — IVF-style: deterministic seed centroids, assign each
  vector to nearest centroid (cluster id materialized once), probe nprobe
  nearest clusters at query time.

Hyperplanes/centroids are derived deterministically from a seed (hash of
index), never from wall clock or RNG state — resumable by construction.
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.vector import cosine, dot


def _seeded_unit_vectors(n: int, dim: int, seed: str) -> list[list[float]]:
    out = []
    for i in range(n):
        vals = []
        j = 0
        while len(vals) < dim:
            h = hashlib.sha256(f"{seed}|{i}|{j}".encode()).digest()
            for k in range(0, 32, 4):
                (u,) = struct.unpack(">i", h[k:k + 4])
                vals.append(float(u) / 2147483648.0)
                if len(vals) == dim:
                    break
            j += 1
        norm = sum(v * v for v in vals) ** 0.5 or 1.0
        out.append([v / norm for v in vals])
    return out


def brute_force_topk(embeddings: DataFrame, qvec: list[float], k: int = 10,
                     id_col: str = "vec_id",
                     vec_col: str = "embedding") -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        embeddings.select(
            F.col(id_col),
            cosine(F.col(vec_col).cast("array<double>"), q).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def _bucket_expr(vec_col: str, planes: list[list[float]]):
    """LSH bucket id = sign bits of dot(vec, plane_i), packed into a long."""
    b = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        pl = F.array(*[F.lit(float(x)) for x in p])
        bit = F.when(dot(F.col(vec_col).cast("array<double>"), pl) >= 0,
                     F.lit(1 << i)).otherwise(F.lit(0))
        b = b + bit.cast("long")
    return b


def lsh_index(embeddings: DataFrame, dim: int, bits: int = 8,
              vec_col: str = "embedding",
              seed: str = "kgm-lsh-v1") -> tuple[DataFrame, list[list[float]]]:
    """Materialize (…, bucket) — at scale, write partitioned by bucket so
    queries prune partitions."""
    planes = _seeded_unit_vectors(bits, dim, seed)
    return embeddings.withColumn("bucket", _bucket_expr(vec_col, planes)), planes


def lsh_topk(indexed: DataFrame, planes: list[list[float]],
             qvec: list[float], k: int = 10, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
    """Probe the query's bucket (exact re-rank inside).  Recall < 1 by
    design; tests compare against brute force for overlap, not equality."""
    qb = 0
    for i, p in enumerate(planes):
        if sum(a * b for a, b in zip(qvec, p)) >= 0:
            qb |= 1 << i
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        indexed.where(F.col("bucket") == qb)
        .select(F.col(id_col),
                cosine(F.col(vec_col).cast("array<double>"), q).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )


def ivf_index(embeddings: DataFrame, dim: int, n_centroids: int = 16,
              vec_col: str = "embedding",
              seed: str = "kgm-ivf-v1") -> tuple[DataFrame, list[list[float]]]:
    """Assign every vector to its nearest seeded centroid (one pass,
    JVM-side; a k-means refinement loop could reuse the same shape).

    argmax as ONE array_max over (score, -index) structs — ties pick the
    smallest index, identical to a strict-> fold.  The previous chained
    F.when fold nested the whole running expression twice per step
    (O(2^n_centroids) cosine sub-expressions — 17 s for 8 centroids at
    sf0.1); this shape evaluates each centroid's cosine exactly once
    (17 s → 0.9 s, same rows)."""
    cents = _seeded_unit_vectors(n_centroids, dim, seed)
    v = F.col(vec_col).cast("array<double>")
    scored = F.array(*[
        F.struct(
            cosine(v, F.array(*[F.lit(float(x)) for x in c])).alias("s"),
            F.lit(-ci).alias("negci"),
        )
        for ci, c in enumerate(cents)
    ])
    best = F.array_max(scored)
    return (
        embeddings.withColumn("cluster", (-best["negci"]).cast("int")),
        cents,
    )


def ivf_topk(indexed: DataFrame, centroids: list[list[float]],
             qvec: list[float], k: int = 10, nprobe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    sims = []
    for ci, c in enumerate(centroids):
        num = sum(a * b for a, b in zip(qvec, c))
        na = sum(a * a for a in qvec) ** 0.5 or 1.0
        nb = sum(b * b for b in c) ** 0.5 or 1.0
        sims.append((num / (na * nb), ci))
    probe = [ci for _, ci in sorted(sims, reverse=True)[:nprobe]]
    q = F.array(*[F.lit(float(x)) for x in qvec])
    return (
        indexed.where(F.col("cluster").isin(probe))
        .select(F.col(id_col),
                cosine(F.col(vec_col).cast("array<double>"), q).alias("score"))
        .orderBy(F.desc("score"), F.asc(id_col))
        .limit(k)
    )
