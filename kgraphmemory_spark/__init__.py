"""kgraphmemory_spark — a from-scratch PySpark-native knowledge-graph
construction & query engine with the capabilities of vital-ai/kgraphmemory.

Reference (read-only, public): /root/reference — an in-memory KG store
(pyoxigraph RDF quads + local Qdrant vectors).  This package re-expresses
the same data model and query surface as batch Spark DataFrame pipelines
designed for 100 TB-scale corpora:

- ``semantics``   — the pure-Python single-node oracle (rule-set webtext-v1)
- ``pipeline``    — extract → link → canonicalize → materialize, with
                    snapshot checkpoints and per-partition lineage
- ``operators``   — linking join (auto/broadcast/salted/shuffle),
                    connected components, store CRUD (object↔triple
                    pivot, clear), dedup family (incl. cluster-safe LSH
                    dedup classes), similarity search (brute/LSH/IVF),
                    multi-vector + point CRUD + hybrid search,
                    chat/interaction surface, multimodal
                    decode/features/frames
- ``functions``   — pandas/Arrow UDFs (extraction, embedding, ids) and
                    JVM-side column helpers (cosine, text stats)
- ``io``          — snapshot catalog (parquet + manifest; Iceberg-shaped),
                    N-Triples/N-Quads distributed parser + serializer,
                    whole-file parsers AND whole-document emitters for
                    Turtle/TriG, JSON-LD and RDF/XML (serialize.py, all
                    JVM-side), bucket-partitioned graph-table sink
                    (entity-keyed, pruned point lookups)
- ``streaming``   — Structured Streaming incremental ingest (foreachBatch)
- ``queries``     — driver-facing registry (queries() / oracle_sql())
- ``api``         — single-graph facade (KGraphView / ChatView)
- ``memory``      — multi-graph manager (KGraphMemory: the reference's
                    top-level entry class, one partitioned table for all
                    graphs, cross-graph ops as single plans)
- ``sparql``      — raw SPARQL strings compiled to DataFrame plans
"""

__version__ = "0.1.0"
