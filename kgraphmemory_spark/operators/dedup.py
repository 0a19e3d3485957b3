"""Deduplication family — first-class training-data-pipeline operators.

- exact: hash-groupBy (one shuffle on the hash, map-side combine)
- MinHash + LSH: shingle → K minhashes → B bands → bucket join; candidate
  pairs verified by exact Jaccard.  At 100 TB the band-bucket join is the
  only pairwise step and touches near-dup pairs only — never O(n²).
- SimHash: 64-bit fingerprints; near-dups share the exact fingerprint or a
  band of it.
- embedding cosine near-dup lives in queries.py (d5) / similarity.py.

All hashes are Spark-native xxhash64 (JVM, codegen); shingling is
`functions.text.shingles` (built-ins only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.text import minhash_signature, shingles, simhash64


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (text_md5, keep_id, n_copies); keep = min id per identical text."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """→ candidate near-dup pairs (id_a, id_b, n_bands) via banded LSH.

    rows/band = num_hashes/bands; two docs collide in a band iff that slice
    of their signatures is identical.  Scale shape: explode to (band,
    band_hash) keys → groupBy-join on the key → pairs, so cost follows the
    number of colliding pairs, not n².
    """
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature(shingles(F.col(text_col), k_shingle), num_hashes).alias("sig"),
    ).where(F.col("sig")[0].isNotNull())

    banded = sig.select(
        "id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band"),
                    F.xxhash64(
                        F.to_json(F.struct(
                            F.slice("sig", b * rows_per_band + 1, rows_per_band)
                        ))
                    ).alias("band_hash"),
                )
                for b in range(bands)
            ])
        ).alias("bh"),
    ).select("id", F.col("bh.band").alias("band"), F.col("bh.band_hash").alias("band_hash"))

    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def simhash_buckets(df: DataFrame, id_col: str, text_col: str,
                    k_shingle: int = 3) -> DataFrame:
    """→ (id, simhash) 64-bit fingerprints; exact-match buckets = near-dups."""
    return df.select(
        F.col(id_col).alias("id"),
        simhash64(shingles(F.col(text_col), k_shingle)).alias("simhash"),
    )


def jaccard_verify(candidates: DataFrame, df: DataFrame, id_col: str,
                   text_col: str, k_shingle: int = 3,
                   threshold: float = 0.8) -> DataFrame:
    """Exact-Jaccard verification of LSH candidate pairs (the 2nd stage)."""
    sh = (
        df.select(F.col(id_col).alias("id"),
                  F.explode(shingles(F.col(text_col), k_shingle)).alias("sh"))
        .distinct()
    )
    sz = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    a_sh = candidates.select("id_a", "id_b").join(
        sh.withColumnRenamed("id", "id_a"), "id_a")
    inter = (
        a_sh.join(sh.select(F.col("id").alias("id_b"), "sh"), ["id_b", "sh"])
        .groupBy("id_a", "id_b").agg(F.count(F.lit(1)).alias("inter"))
    )
    na = sz.select(F.col("id").alias("id_a"), F.col("n").alias("na"))
    nb = sz.select(F.col("id").alias("id_b"), F.col("n").alias("nb"))
    j = F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter"))
    return (
        inter.join(na, "id_a").join(nb, "id_b")
        .where(j >= threshold)
        .select("id_a", "id_b", j.alias("jaccard"))
    )
