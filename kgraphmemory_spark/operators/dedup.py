"""Deduplication family — first-class training-data-pipeline operators.

- exact: hash-groupBy (one shuffle on the hash, map-side combine)
- MinHash + LSH: shingle → K minhashes → B bands → bucket join; candidate
  pairs verified by exact Jaccard.  At 100 TB the band-bucket join is the
  only pairwise step and touches near-dup pairs only — never O(n²).
- SimHash: 64-bit fingerprints; near-dups share the exact fingerprint or a
  band of it.
- embedding cosine near-dup lives in queries.py (d5) / similarity.py.

Scale shape (round-2 rewrite): signatures are computed by ONE explode of
the shingle array followed by ONE hash aggregation with K (or 64) small
agg arms — a single pass over the shingle rows with map-side partial
aggregation, instead of K separate `array_min(transform(...))` passes
inside one giant codegen unit (the round-1 shape cost 23 s for 150 docs
because the fused expression tree fell out of JIT/codegen limits).

Two hash modes:
- ``hash_fn="xxhash64"`` (default): JVM xxhash64, fastest — the
  production path.
- ``hash_fn="md5"``: first-16-hex-chars-of-md5 string hashes.  Bit-for-bit
  reproducible in DuckDB (`substr(md5(..),1,16)`), so the driver's oracle
  gate can mirror the full signature/band pipeline in ANSI SQL.  Min over
  the uniformly-distributed hex strings is a valid minhash.

Duplicate-cluster safety: ``minhash_lsh_candidates`` emits all colliding
pairs (right for bounded verify queries); ``minhash_dedup_components``
emits per-bucket star edges (id → bucket-min id) — O(n) per bucket, not
O(n²) — and resolves dedup classes with connected components, so a
million-copy boilerplate cluster (Common-Crawl reality) costs one edge
per member instead of 10¹² pairs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import shingles
from .cc import connected_components


def exact_duplicates(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """→ (text_md5, keep_id, n_copies); keep = min id per identical text."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_md5"))
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def shingle_rows(df: DataFrame, id_col: str, text_col: str,
                 k_shingle: int = 3) -> DataFrame:
    """→ (id, sh): one row per shingle occurrence (single explode)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.explode(shingles(F.col(text_col), k_shingle)).alias("sh"),
    )


def _seed_hash(col: Column, seed: int, hash_fn: str) -> Column:
    if hash_fn == "md5":
        return F.substring(F.md5(F.concat_ws(":", F.lit(str(seed)), col)), 1, 16)
    return F.xxhash64(col, F.lit(seed))


def minhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       k_shingle: int = 3, num_hashes: int = 32,
                       hash_fn: str = "xxhash64") -> DataFrame:
    """→ (id, h0..h{K-1}) wide signature rows, one hash-agg pass.

    Docs whose text yields no shingles (< k tokens) emit no row — same
    contract as the reference's empty-doc skip.
    """
    rows = shingle_rows(df, id_col, text_col, k_shingle)
    return rows.groupBy("id").agg(*[
        F.min(_seed_hash(F.col("sh"), s, hash_fn)).alias(f"h{s}")
        for s in range(num_hashes)
    ])


def _banded(sig: DataFrame, num_hashes: int, bands: int,
            hash_fn: str) -> DataFrame:
    """Wide signatures → (id, band, band_hash) via one explode.

    The signature/banding pass is the dominant cost of both LSH
    operators and both consume the result twice (self-join / bucket-min
    + probe), so the output is lazily localCheckpointed — computed once
    on first action, reused from blocks after."""
    if bands < 1 or num_hashes % bands:
        raise ValueError(
            f"bands={bands} must divide num_hashes={num_hashes} "
            "(rows-per-band = num_hashes/bands; a non-divisor silently "
            "drops hashes, and bands > num_hashes would hash zero rows "
            "per band, collapsing every document into one bucket)")
    r = num_hashes // bands
    def band_hash(b: int) -> Column:
        joined = F.concat_ws("|", *[F.col(f"h{b * r + i}").cast("string")
                                    for i in range(r)])
        return F.md5(joined) if hash_fn == "md5" else F.xxhash64(joined).cast("string")
    arr = F.array(*[
        F.struct(F.lit(b).alias("band"), band_hash(b).alias("band_hash"))
        for b in range(bands)
    ])
    return (
        sig.select("id", F.explode(arr).alias("bh"))
        .select("id", F.col("bh.band").alias("band"),
                F.col("bh.band_hash").alias("band_hash"))
        .localCheckpoint(eager=False)
    )


def minhash_lsh_candidates(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """→ candidate near-dup pairs (id_a, id_b, n_bands) via banded LSH.

    rows/band = num_hashes/bands; two docs collide in a band iff that slice
    of their signatures is identical.  Pair output is O(collisions²) per
    bucket — use for bounded verify stages; the scale path for dedup
    classes is :func:`minhash_dedup_components`.
    """
    sig = minhash_signatures(df, id_col, text_col, k_shingle, num_hashes, hash_fn)
    banded = _banded(sig, num_hashes, bands, hash_fn)
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_hash") == F.col("b.band_hash"))
               & (F.col("a.id") < F.col("b.id")))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def minhash_dedup_components(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """→ (id, keep_id): dedup classes from banded LSH, cluster-safe.

    Within each (band, band_hash) bucket only star edges id → min(id) are
    emitted — one edge per member, never all pairs — then connected
    components (operators/cc.py) merges buckets that share members.  A
    10⁶-copy duplicate cluster costs 10⁶ edges instead of ~10¹² pairs.
    keep_id = lexicographic-min member id of the class; docs with no LSH
    collision (or no shingles) keep themselves.
    """
    sig = minhash_signatures(df, id_col, text_col, k_shingle, num_hashes, hash_fn)
    banded = _banded(sig, num_hashes, bands, hash_fn)
    bucket_min = banded.groupBy("band", "band_hash").agg(F.min("id").alias("min_id"))
    edges = (
        banded.join(bucket_min, ["band", "band_hash"])
        .where(F.col("id") != F.col("min_id"))
        .select(F.col("id").cast("string").alias("src"),
                F.col("min_id").cast("string").alias("dst"))
        .distinct()
    )
    comp = connected_components(edges)  # (node, component)
    base = df.select(F.col(id_col).cast("string").alias("id"))
    return (
        base.join(comp.withColumnRenamed("node", "id"), "id", "left")
        .select("id", F.coalesce("component", F.col("id")).alias("keep_id"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def _mask(b: int) -> int:
    return (1 << b) if b < 63 else -(1 << 63)


def simhash_signatures(df: DataFrame, id_col: str, text_col: str,
                       k_shingle: int = 3) -> DataFrame:
    """→ (id, simhash): 64-bit SimHash, explode + one 64-arm hash agg.

    Per bit b: sum over shingle occurrences of (+1 if bit set in
    xxhash64(shingle) else -1); result bit = 1 iff sum > 0.  Docs with no
    shingles get simhash 0 (left-join back), matching the round-1
    aggregate-over-empty-array behavior.
    """
    rows = shingle_rows(df, id_col, text_col, k_shingle).select(
        "id", F.xxhash64("sh").alias("h"))
    aggs = [
        F.sum(F.when(F.col("h").bitwiseAND(F.lit(_mask(b))) != 0, 1)
              .otherwise(-1)).alias(f"s{b}")
        for b in range(64)
    ]
    sums = rows.groupBy("id").agg(*aggs)
    fp = reduce(
        lambda acc, b: acc + F.when(F.col(f"s{b}") > 0, F.lit(_mask(b)))
        .otherwise(F.lit(0).cast("long")),
        range(64), F.lit(0).cast("long"))
    sig = sums.select("id", fp.alias("simhash"))
    base = df.select(F.col(id_col).alias("id"))
    return base.join(sig, "id", "left").select(
        "id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))


def simhash_buckets(df: DataFrame, id_col: str, text_col: str,
                    k_shingle: int = 3) -> DataFrame:
    """→ (id, simhash) 64-bit fingerprints; exact-match buckets = near-dups."""
    return simhash_signatures(df, id_col, text_col, k_shingle)


def simhash_md5(df: DataFrame, id_col: str, text_col: str,
                k_shingle: int = 3) -> DataFrame:
    """→ (id, simhash): SimHash whose per-shingle hash is the md5 hex
    digest — every step (hex digit → 4 bits → signed vote → bit assembly)
    is reproducible in ANSI SQL, so the driver's DuckDB oracle can verify
    the fingerprint bit-for-bit (VERDICT.md round-1 item 2).

    Bit convention: bit b (0-based, b=0 the least-significant output bit)
    comes from hex digit b//4 of the digest (1-indexed substr b//4+1),
    taking bit (3 - b%4) of the digit value — i.e. the digest's natural
    big-endian nibble order mapped onto ascending output bits.
    """
    rows = shingle_rows(df, id_col, text_col, k_shingle).select(
        "id", F.md5("sh").alias("hx"))
    digits = rows.select(
        "id", *[F.conv(F.substring("hx", j + 1, 1), 16, 10).cast("int").alias(f"d{j}")
                for j in range(16)])
    aggs = [
        F.sum(F.when(F.shiftright(F.col(f"d{b // 4}"), 3 - b % 4)
                     .bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)).alias(f"s{b}")
        for b in range(64)
    ]
    sums = digits.groupBy("id").agg(*aggs)
    fp = reduce(
        lambda acc, b: acc + F.when(F.col(f"s{b}") > 0, F.lit(_mask(b)))
        .otherwise(F.lit(0).cast("long")),
        range(64), F.lit(0).cast("long"))
    sig = sums.select("id", fp.alias("simhash"))
    base = df.select(F.col(id_col).alias("id"))
    return base.join(sig, "id", "left").select(
        "id", F.coalesce("simhash", F.lit(0).cast("long")).alias("simhash"))


def jaccard_verify(candidates: DataFrame, df: DataFrame, id_col: str,
                   text_col: str, k_shingle: int = 3,
                   threshold: float = 0.8) -> DataFrame:
    """Exact-Jaccard verification of LSH candidate pairs (the 2nd stage)."""
    sh = shingle_rows(df, id_col, text_col, k_shingle).distinct()
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
