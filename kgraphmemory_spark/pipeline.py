"""The end-to-end KG-construction pipeline (north rule).

pages → docs_clean → mentions + raw_triples → linked → canonical_map →
entities / relations / frames+slots / triples / provenance

Two execution modes:
- in-memory (``workdir=None``): one lazy DAG, used by the driver-facing
  ``queries()`` and for small inputs;
- checkpointed (``workdir=...``): every stage commits an atomic snapshot +
  per-url-bucket lineage rows via SnapshotCatalog; a rerun resumes from the
  last committed stage (tests/test_resume.py kills between stages).

Every transform is a pure function of committed inputs and deterministic
ids, so resume is idempotent by construction.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .io.snapshots import SnapshotCatalog, lineage_by_url
from .operators.cc import canonical_mapping, canonical_mapping_local
from .operators.extraction import (
    extract_canonical_pair_counts,
    extract_docs,
    extract_entity_counts_docagg,
    extract_mentions,
    extract_provenance_docagg,
    extract_raw_triples,
)
from .operators.linking import (
    BROADCAST_MAX_ALIAS_ROWS,
    discovered_alias_from_docs,
    link_mentions,
    rank_candidates,
    resolve_strategy,
)
from .operators.materialize import (
    DEFAULT_GRAPH,
    build_entities_docagg,
    build_entities_preagg,
    build_frames_slots,
    build_provenance,
    build_relations,
    build_relations_docagg,
    build_triples,
)

# canonical-dict ceiling for the doc-aggregated fast paths (relations /
# entities / provenance): above this the map no longer belongs on the
# driver and each falls back to its pre-aggregated shuffle path.  The
# cutover is row- AND bytes-aware (same discipline as the CC driver
# cutover, operators/cc.py): entity ids are arbitrary URI strings, so a
# row cap alone could collect a multi-GB dict when ids are long — the
# ranked-count job also sums id bytes and the fast paths additionally
# require ≤ RELATIONS_DOCAGG_MAX_BYTES of raw id text (×2 for the
# canonical values; Python-object overhead on top is bounded by the
# same constant factor the CC cutover budgets for).
RELATIONS_DOCAGG_MAX_VOCAB = 1_000_000
RELATIONS_DOCAGG_MAX_BYTES = 256 << 20
from .semantics import SYNONYMS


@dataclass
class KGTables:
    docs_clean: DataFrame
    mentions: DataFrame
    raw_triples: DataFrame
    linked: DataFrame
    canonical: DataFrame
    entities: DataFrame
    relations: DataFrame
    frames: DataFrame
    slots: DataFrame
    triples: DataFrame
    provenance: DataFrame
    stages_resumed: list[str] = field(default_factory=list)

    def register_views(self, prefix: str = "kg_") -> None:
        for name in ("docs_clean", "mentions", "raw_triples", "linked",
                     "entities", "relations", "frames", "slots", "triples",
                     "provenance"):
            getattr(self, name).createOrReplaceTempView(prefix + name)


def same_as_edges(spark: SparkSession) -> DataFrame:
    """The canonicalization config (semantics.SYNONYMS) as an edge DF."""
    return spark.createDataFrame(
        [("ent:" + a, "ent:" + b) for a, b in SYNONYMS],
        "src string, dst string",
    )


def run_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    workdir: str | None = None,
    link_strategy: str = "auto",
    graph: str = DEFAULT_GRAPH,
    cache_intermediates: bool = True,
) -> KGTables:
    """``workdir`` set → every stage is an atomic parquet snapshot (the
    scale path: stage outputs are re-read from disk, lineage truncated).

    NOT fully lazy: construction always materializes the ranked alias
    table (cache/localCheckpoint + one count job at call time) — its
    cardinality drives both the auto link strategy and the vocab-broadcast
    gating, regardless of an explicit ``link_strategy``, so a pipeline
    cannot be built before its input data exists.

    ``workdir=None`` → everything else stays one lazy DAG;
    ``cache_intermediates`` then caches
    the SMALL stages only (docs_clean — the pandas-UDF product — the
    ranked alias table, and the aggregated graph tables).  The wide
    fan-out stages (mentions,
    raw_triples, linked: ~100 rows per doc) are deliberately NOT cached:
    they are cheap map-side derivations of cached docs_clean, and filling
    a columnar cache with 10^2×docs rows costs far more than the 1-2
    rescans that consume them (measured: 25-70 s fill vs 2 s scan at 250k
    docs / 19M mentions)."""
    cat = SnapshotCatalog(workdir) if workdir else None
    resumed: list[str] = []
    _no_cache = {"mentions", "raw_triples", "linked"}

    def stage(name: str, build, lineage_extra=None) -> DataFrame:
        if cat is None:
            df = build()
            if cache_intermediates and name not in _no_cache:
                df = df.cache()
            return df
        if cat.committed(name):
            resumed.append(name)
            return cat.read(spark, name)

        def _lineage(df: DataFrame) -> DataFrame | None:
            # url-keyed stages carry per-bucket lineage; global stages
            # (canonical map, entity/relation rollups) are audited by the
            # manifest row counts instead.
            if "url" not in df.columns:
                return None
            return lineage_by_url(df, name, extra_aggs=lineage_extra)

        return cat.stage(spark, name, build, lineage_of=_lineage)

    docs_clean = stage("docs_clean", lambda: extract_docs(pages))
    mentions = stage("mentions", lambda: extract_mentions(docs_clean))
    raw_triples = stage("raw_triples", lambda: extract_raw_triples(docs_clean))

    # alias table: vocabulary-sized — committed as its own snapshot /
    # cached, since both linking and canonicalization read it.  Discovered
    # from per-doc token vocabularies (array_distinct before the explode),
    # NOT from the 10^2×-wider per-occurrence mention rows; identical
    # result (linking.discovered_alias_from_docs docstring + test).
    alias = stage("alias_table", lambda: discovered_alias_from_docs(docs_clean))

    # rank ONCE (cached in-memory / localCheckpointed otherwise) and probe
    # its cardinality ONCE.  The cardinality drives two independent
    # decisions: the auto link strategy, and whether the vocabulary-sized
    # ranked/canonical tables may carry broadcast hints in the entity and
    # relation builds.  The latter must NOT be coupled to the chosen link
    # strategy: a salted linking run over a small vocabulary still wants
    # the vocab broadcasts (dropping the hint costs a shuffle write of the
    # big probe side even when AQE converts the join back to broadcast),
    # while an open-vocabulary web corpus past the broadcast ceiling must
    # drop them or the driver OOMs regardless of link strategy.
    ranked = rank_candidates(alias)
    if cat is None and cache_intermediates:
        ranked = ranked.cache()
    else:
        ranked = ranked.localCheckpoint(eager=True)
    size_row = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.length("entity_id")), F.lit(0)).alias("b"),
    ).collect()[0]
    n_alias, alias_id_bytes = int(size_row["n"]), int(size_row["b"])
    broadcast_vocab = n_alias <= BROADCAST_MAX_ALIAS_ROWS
    use_docagg = (n_alias <= RELATIONS_DOCAGG_MAX_VOCAB
                  and 2 * alias_id_bytes <= RELATIONS_DOCAGG_MAX_BYTES)
    strategy = link_strategy
    if strategy == "auto":
        strategy = resolve_strategy(n_alias)

    def _link():
        return link_mentions(mentions, alias, strategy=strategy, ranked=ranked)

    linked = stage(
        "linked", _link,
        lineage_extra={
            "score_histogram": F.to_json(
                F.map_from_entries(F.array(F.struct(
                    F.lit("ge_half"),
                    F.sum(F.when(F.col("link_score") >= 0.5, 1).otherwise(0)),
                ))),
            )
        },
    )

    def _canonical():
        # entity universe from the (vocabulary-sized) ranked alias table,
        # NOT from a distinct over per-mention rows.  n_alias is already
        # known (the count above), so a tiny vocabulary takes the driver
        # fast path — one collect over the cached ranked table instead of
        # the DataFrame CC path's ~6 fixed-latency mini-jobs, which
        # otherwise sit in the scaling run's serial floor.
        ents = ranked.select("entity_id").distinct()
        if use_docagg:
            ids = [r["entity_id"] for r in ents.collect()]
            pairs = [("ent:" + a, "ent:" + b) for a, b in SYNONYMS]
            return canonical_mapping_local(spark, ids, pairs)
        return canonical_mapping(ents, same_as_edges(spark))

    canonical = stage("canonical_map", _canonical)

    # vocabulary under the dict ceiling (rows AND bytes) → the canonical
    # map lives on the driver and unlocks the doc-aggregated fast paths
    # for relations, entities and provenance below.  Broadcast ONCE and
    # hand the same handle to all three extractors — the bytes ceiling
    # allows this dict to reach ~hundreds of MB, and three independent
    # broadcasts would ship (and pin) three copies of it (ADVICE r3).
    cmap = ({r["entity_id"]: r["canonical_id"] for r in canonical.collect()}
            if use_docagg else None)
    bcmap = (spark.sparkContext.broadcast(cmap)
             if cmap is not None else None)

    def _linked_canonical() -> DataFrame:
        canon = F.broadcast(canonical) if broadcast_vocab else canonical
        return linked.join(canon, "entity_id").select(
            "url", "pos", "surface", "kind", "entity_id", "link_score",
            "canonical_id",
        )

    linked_canonical = _linked_canonical()

    # entities: under the vocab ceiling the whole per-surface level folds
    # into one Arrow pass over docs_clean (per-batch partial aggregates in
    # canonical space — extract_entity_counts_docagg docstring); open
    # vocabulary → aggregate the mention stream by (surface, kind) before
    # any join (decomposable aggs — build_entities_preagg docstring).
    # build_entities(linked_canonical) is the reference shape and remains
    # the oracle in tests
    def _entities() -> DataFrame:
        if cmap is not None:
            return build_entities_docagg(
                extract_entity_counts_docagg(docs_clean, bcmap))
        return build_entities_preagg(
            mentions, ranked, canonical, broadcast_alias=broadcast_vocab)

    entities = stage("entities", _entities)

    def _relations() -> DataFrame:
        # Scale path: when the canonical vocabulary fits a driver dict,
        # the (pair, url) half of the relations aggregate is computed
        # per-document inside the extraction pass (every pair of a doc
        # lives in ONE docs_clean row, so the url level never needs a
        # shuffle) and the global agg map-side-combines down to the
        # canonical pair space.  The shuffle path measured 2.3+2.7 GB
        # shuffled / ~1200 CPU-s at 2M pages; this path shuffles KBs.
        # Open vocabulary past the dict ceiling → the original
        # pre-aggregated shuffle path.
        if cmap is not None:
            return build_relations_docagg(
                extract_canonical_pair_counts(docs_clean, bcmap))
        return build_relations(raw_triples, canonical,
                               broadcast_canonical=broadcast_vocab)

    relations = stage("relations", _relations)

    if cat is None:
        frames, slots = build_frames_slots(relations)
        if cache_intermediates:
            frames, slots = frames.cache(), slots.cache()
    else:
        if cat.committed("frames") and cat.committed("slots"):
            resumed += ["frames", "slots"]
            frames, slots = cat.read(spark, "frames"), cat.read(spark, "slots")
        else:
            frames, slots = build_frames_slots(relations)
            frames = cat.commit("frames", frames)
            slots = cat.commit("slots", slots)

    triples = stage("triples", lambda: build_triples(entities, frames, graph))

    def _provenance() -> DataFrame:
        # doc-local fast path under the vocab ceiling (all three counts
        # of a url live in one docs_clean row — extraction.py docstring);
        # open vocabulary → the keyed-aggregate shuffle path
        if cmap is not None:
            return extract_provenance_docagg(docs_clean, bcmap)
        return build_provenance(linked_canonical, raw_triples)

    provenance = stage("provenance", _provenance)

    return KGTables(
        docs_clean=docs_clean, mentions=mentions, raw_triples=raw_triples,
        linked=linked_canonical, canonical=canonical, entities=entities,
        relations=relations, frames=frames, slots=slots, triples=triples,
        provenance=provenance, stages_resumed=resumed,
    )
