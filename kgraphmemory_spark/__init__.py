"""kgraphmemory_spark — a from-scratch PySpark-native knowledge-graph
construction & query engine with the capabilities of vital-ai/kgraphmemory.

Reference (read-only, public): /root/reference — an in-memory KG store
(pyoxigraph RDF quads + local Qdrant vectors).  This package re-expresses
the same data model and query surface as batch Spark DataFrame pipelines
designed for 100 TB-scale corpora:

- ``semantics``   — the pure-Python single-node oracle (rule-set webtext-v1)
- ``pipeline``    — extract → link → canonicalize → materialize, with
                    snapshot checkpoints and per-partition lineage
- ``operators``   — linking join (salted), connected components,
                    dedup family, similarity search, graph query builders
- ``functions``   — pandas/Arrow UDFs (extraction, embedding, ids) and
                    JVM-side column helpers (cosine, text stats)
- ``sources``     — N-Triples/N-Quads distributed parser + serializer
- ``io``          — snapshot catalog (parquet + manifest; Iceberg-shaped)
"""

__version__ = "0.1.0"
