"""Corpus-curation operators — the sampling / capping / packing stages of
a web-scale training-data pipeline (SURVEY.md §2, training-data family;
the reference stores documents, `kgraph_document_bridge.py:47-78`, but has
no corpus curation at all — these are the beyond-reference ops that make
the engine usable at Common-Crawl scale, alongside dedup/ANN/text-quality).

Three operators, all pure DataFrame algebra (no Python in the hot path),
each with an ANSI-SQL twin for the driver's DuckDB oracle:

- ``cap_per_domain`` — keep at most ``cap`` documents per domain,
  deterministic order.  The web corpus reality is a power law: most
  domains are under the cap, a few hubs hold millions of pages.  A naive
  ``row_number() OVER (PARTITION BY domain)`` sorts the *entire corpus*
  and stalls on the hub domains (a window partition cannot be skew-split
  by AQE).  This implementation splits: under-cap domains pass with no
  sort at all (anti-join against the tiny over-cap domain list); over-cap
  rows go through a SALTED two-phase top-k — phase one ranks within
  (domain, salt) buckets so no single sort exceeds ~rows/S per hub, phase
  two ranks the ≤ cap·S survivors per domain.  The final per-domain sort
  is bounded by cap·S rows no matter how large the hub.

- ``stratified_sample`` — deterministic per-stratum downsampling (e.g.
  "keep 25% of English, 100% of everything else").  Keep decision =
  ``substr(md5(id), 1, 8) < hex_threshold(rate)``: uniform, reproducible
  across engines (DuckDB md5 is bit-identical), re-runnable (resume-safe
  — no RNG state), and embarrassingly parallel (no shuffle at all; the
  rate map is a literal CASE/map lookup).

- ``pack_shards`` — assign documents to fixed-token-budget training
  shards.  Greedy streaming fill per writer partition: order docs within
  ``part_col``, running token sum, shard index = floor(tokens_before /
  budget).  One shuffle (the window partition); each writer partition
  packs independently — exactly how shard writers scale out.  A shard may
  overflow by at most one document (boundary doc belongs to the shard its
  first token falls in); documents larger than the budget get a shard to
  themselves plus the spillover, which downstream writers split.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_count


def rate_threshold_hex(rate: float) -> str:
    """Hex-string threshold t such that P[substr(md5(x),1,8) < t] == rate
    for uniform md5.  Comparing 8 lowercase hex chars lexicographically is
    a uniform [0, 16^8) draw; the same literal works verbatim in DuckDB.

    rate >= 1 → 'g' (greater than every hex string: keep all);
    rate <= 0 → ''  (nothing sorts below the empty string: keep none).
    """
    if rate >= 1.0:
        return "g"
    if rate <= 0.0:
        return ""
    return format(int(rate * 16 ** 8), "08x")


def stratified_sample(df: DataFrame, strata_col: str, id_col: str,
                      rates: dict[str, float],
                      default_rate: float = 1.0) -> DataFrame:
    """Deterministic hash sample: keep a row iff
    ``substr(md5(cast(id)), 1, 8) < threshold(rate[stratum])``.

    No shuffle, no RNG — the keep set is a pure function of (id, stratum),
    so a resumed or re-scaled run keeps exactly the same rows, and the
    DuckDB oracle can reproduce the selection bit-for-bit.
    """
    h = F.substring(F.md5(F.col(id_col).cast("string")), 1, 8)
    thr: Column = F.lit(rate_threshold_hex(default_rate))
    for stratum, rate in rates.items():
        thr = F.when(F.col(strata_col) == stratum,
                     F.lit(rate_threshold_hex(rate))).otherwise(thr)
    return df.where(h < thr)


def cap_per_domain(df: DataFrame, domain_col: str, id_col: str,
                   cap: int, salt_buckets: int = 16,
                   stats: dict | None = None) -> DataFrame:
    """Keep the ``cap`` lowest-``id_col`` rows per domain (deterministic).

    Split plan (see module docstring): rows in domains at-or-under the cap
    never enter a sort; over-cap rows take a salted two-phase top-k whose
    final per-domain sort is bounded by ``cap * salt_buckets`` rows, so a
    billion-page hub domain cannot stall a single task.

    Pass ``stats`` (bench/diagnostic use — it costs one extra count job
    over the tiny over-cap domain list) to record the skew evidence:
    ``over_cap_domains`` = how many domains took the salted path, and
    ``final_sort_bound_rows`` = the structural cap·S ceiling on any
    single final-phase sort regardless of hub size.
    """
    over = (
        df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n"))
        .where(F.col("__n") > cap)
        .select(domain_col)
    )
    if stats is not None:
        stats["over_cap_domains"] = over.count()
        stats["final_sort_bound_rows"] = cap * salt_buckets
    # Power law ⇒ the over-cap domain list is small; AQE broadcasts it in
    # both joins (plain joins here so a pathological list still shuffles).
    under = df.join(over, domain_col, "left_anti")
    heavy = df.join(over, domain_col, "left_semi")

    salt = F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt_buckets))
    w1 = (Window.partitionBy(F.col(domain_col), salt)
          .orderBy(F.col(id_col).asc()))
    survivors = (
        heavy.withColumn("__rn", F.row_number().over(w1))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
    w2 = Window.partitionBy(domain_col).orderBy(F.col(id_col).asc())
    kept_heavy = (
        survivors.withColumn("__rn", F.row_number().over(w2))
        .where(F.col("__rn") <= cap)
        .drop("__rn")
    )
    return under.unionByName(kept_heavy)


def pack_shards(df: DataFrame, part_col: str, order_col: str,
                text_col: str = "text",
                budget_tokens: int = 1024) -> DataFrame:
    """→ input columns + (n_tokens, shard_ix, shard_id).

    shard_ix = floor(tokens_before_this_doc / budget) within the
    ``part_col`` partition ordered by ``order_col``;
    shard_id = '<part>#<ix>'.  Contiguous greedy fill — one shuffle, each
    writer partition packs its own shards independently.
    """
    w = (Window.partitionBy(part_col).orderBy(F.col(order_col).asc())
         .rowsBetween(Window.unboundedPreceding, -1))
    n_tok = token_count(F.col(text_col))
    out = df.withColumn("n_tokens", n_tok)
    cum_before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    out = out.withColumn(
        "shard_ix", F.floor(cum_before / F.lit(budget_tokens)).cast("long"))
    return out.withColumn(
        "shard_id",
        F.concat_ws("#", F.col(part_col).cast("string"),
                    F.col("shard_ix").cast("string")))
