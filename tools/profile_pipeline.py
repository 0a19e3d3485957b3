#!/usr/bin/env python
"""Per-stage wall-clock profile of the construction pipeline on the
synthetic corpus — through ``run_pipeline`` itself, so the profile
exercises exactly the stage graph production runs (fast-path relations,
pre-aggregated entities, driver-local CC under the vocab ceiling, the
stage caching policy), not a hand-assembled approximation.

Attribution note: ``mentions``/``raw_triples``/``linked`` are
deliberately uncached in the pipeline (cheap map-side derivations of
cached docs_clean — see run_pipeline docstring), so a mark on a
downstream output includes recomputing those; each mark = "cost to
produce this output from the cached upstreams", which is what a run
actually pays.

Usage: python tools/profile_pipeline.py [pages] [cores] [strategy]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

PAGES = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
CORES = int(sys.argv[2]) if len(sys.argv) > 2 else 16
STRATEGY = sys.argv[3] if len(sys.argv) > 3 else "auto"


def main() -> None:
    from kgraphmemory_spark.datagen import generate_pages_distributed
    from kgraphmemory_spark.pipeline import run_pipeline
    from kgraphmemory_spark.session import get_spark

    spark = get_spark(app="kgm-profile", cores=CORES,
                      shuffle_partitions=2 * CORES)
    pages = generate_pages_distributed(spark, PAGES, seed=42, partitions=64)
    pages.cache().count()

    ts = {}

    def mark(name, fn):
        t0 = time.time()
        r = fn()
        ts[name] = round(time.time() - t0, 2)
        print(f"{name:24s} {ts[name]:7.2f}s  {r}", flush=True)
        return r

    t_all = time.time()
    holder = {}

    def build():
        holder["kg"] = run_pipeline(spark, pages, link_strategy=STRATEGY)
        return "built"

    mark("construct(ranked+cc)", build)
    kg = holder["kg"]
    mark("docs_clean", kg.docs_clean.count)
    mark("mentions", kg.mentions.count)
    mark("raw_triples", kg.raw_triples.count)
    mark("linked", kg.linked.count)
    mark("entities", kg.entities.count)
    mark("relations", kg.relations.count)
    mark("frames+slots", lambda: (kg.frames.count(), kg.slots.count()))
    mark("triples_long", kg.triples.count)
    mark("provenance", kg.provenance.count)
    print(f"TOTAL {time.time() - t_all:.2f}s  "
          f"(pages={PAGES}, cores={CORES}, strategy={STRATEGY})")
    spark.stop()


if __name__ == "__main__":
    main()
