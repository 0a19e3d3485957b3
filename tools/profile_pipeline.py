#!/usr/bin/env python
"""Per-stage wall-clock profile of the construction pipeline on the
synthetic corpus.  Usage: python tools/profile_pipeline.py [pages] [cores]"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 16


def main() -> None:
    from pyspark.sql import functions as F

    from kgraphmemory_spark.datagen import generate_pages_distributed
    from kgraphmemory_spark.operators.cc import canonical_mapping
    from kgraphmemory_spark.operators.extraction import (
        extract_docs, extract_mentions, extract_raw_triples)
    from kgraphmemory_spark.operators.linking import (
        discovered_alias_table, link_mentions, rank_candidates)
    from kgraphmemory_spark.operators.materialize import (
        build_entities, build_frames_slots, build_relations, build_triples)
    from kgraphmemory_spark.pipeline import same_as_edges
    from kgraphmemory_spark.session import get_spark

    spark = get_spark(app="kgm-profile", cores=CORES,
                      shuffle_partitions=2 * CORES)
    pages = generate_pages_distributed(spark, PAGES, seed=42, partitions=64)
    pages.cache().count()

    t_all = time.time()
    ts = {}

    def mark(name, fn):
        t0 = time.time()
        r = fn()
        ts[name] = round(time.time() - t0, 2)
        print(f"{name:22s} {ts[name]:7.2f}s  {r}")
        return r

    docs = extract_docs(pages).cache()
    mark("docs_clean(count)", docs.count)
    mentions = extract_mentions(docs)
    raw = extract_raw_triples(docs)
    alias = discovered_alias_table(mentions).cache()
    mark("alias_table", alias.count)
    linked = link_mentions(mentions, alias, strategy="salted")
    mark("linked(count)", linked.count)
    ents = rank_candidates(alias).select("entity_id").distinct()
    canonical = mark("canonical_cc",
                     lambda: canonical_mapping(ents, same_as_edges(spark)).cache())
    mark("canonical(count)", canonical.count)
    lc = linked.join(F.broadcast(canonical), "entity_id").select(
        "url", "pos", "surface", "kind", "entity_id", "link_score",
        "canonical_id")
    entities = build_entities(lc)
    mark("entities", entities.cache().count)
    relations = build_relations(raw, canonical).cache()
    mark("relations", relations.count)
    frames, slots = build_frames_slots(relations)
    mark("frames+slots", lambda: (frames.count(), slots.count()))
    triples = build_triples(entities, frames)
    mark("triples_long", triples.count)
    mark("raw_triples(count)", raw.count)
    print(f"TOTAL {time.time() - t_all:.2f}s  (pages={PAGES}, cores={CORES})")
    spark.stop()


if __name__ == "__main__":
    main()
