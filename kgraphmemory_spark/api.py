"""KGraphView — the reference's query API surface as DataFrame builders.

A user of `vital-ai/kgraphmemory` interacts through `KGraph` / `KGraphBridge`
methods (/root/reference/kgraphmemory/kgraph.py, kgraph_bridge_utilities.py);
this facade gives each of the read-side methods a set-oriented twin over the
materialized graph tables (`pipeline.KGTables`).  Per-URI getters return
1-row DataFrames instead of objects; every method is lazy (a plan, not a
result), so callers compose further before one action.

Method parity map (reference → here):
- get_object / get_object_by_uri (kgraph.py:536-547) → ``get_object``
- get_objects_batch / get_object_list (kgraph.py:549-573) → ``get_objects``
  (ONE join, not the reference's per-subject probe loop)
- get_objects_by_type (kgraph_bridge_utilities.py:354-395) → ``objects_by_type``
- get_linked_objects (kgraph_bridge_utilities.py:304-352) → ``linked_objects``
- filter_by_property (kgraph_bridge_utilities.py:697-745) → ``filter_by_property``
- get_object_type (kgraph_bridge_utilities.py:763-788) → ``object_type``
- sparql_ask (kgraph.py:212-222) → ``ask`` (DataFrame predicate form) and
  ``sparql_ask`` (raw SPARQL string via sparql.py)
- sparql_query / sparql_construct (kgraph.py:185-210) →
  ``sparql_query`` / ``sparql_construct`` — the reference's query
  *strings* run unchanged, compiled to one DataFrame plan (sparql.py)
- vector_search / vector_search_by_type (kgraph.py:224-272) → ``vector_search``
- hybrid_search (kgraph.py:296-346) → ``hybrid_search`` (semi-join, no N+1)
- get_object_vectors (kgraph.py:462-485) → ``object_vectors``
- get_stats (kgraph.py:503-517) → ``stats``
- serialize (kgraph_rdf_db.py:523-547) → ``serialize`` (string) /
  ``serialize_df`` (distributed block rows)
- frame traversal entity→frame→slot (kgraph_frame_bridge.py:289-323) →
  ``frames_for_entity`` / ``frame_slots``
- chat/interaction family (kgraph_chat_bridge.py,
  kgraph_interaction_bridge.py) → ``ChatView`` below

Write-side methods (add/update/remove) live in ``operators.store`` — they
are table transforms committed through the snapshot catalog, not mutations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.vectors import build_vector_records
from .operators.vectors import hybrid_search as _hybrid
from .operators.vectors import knn as _knn
from .pipeline import KGTables
from .semantics import RDF_TYPE, SLOT_DESTINATION, SLOT_SOURCE


class KGraphView:
    """Read-side query facade over one materialized graph."""

    def __init__(self, kg: KGTables, vectors: DataFrame | None = None):
        self.kg = kg
        # vectors materialize lazily on first use (multi-vector records
        # over the entities table, uuid5 ids — operators/vectors.py)
        self._vectors = vectors

    # -- object access -------------------------------------------------

    def get_object(self, uri: str) -> DataFrame:
        return self.kg.entities.where(F.col("entity_id") == uri)

    def get_objects(self, uris: list[str]) -> DataFrame:
        spark = self.kg.entities.sparkSession
        want = spark.createDataFrame([(u,) for u in uris], "entity_id string")
        return self.kg.entities.join(F.broadcast(want), "entity_id", "left_semi")

    def objects_by_type(self, entity_type: str,
                        limit: int | None = None) -> DataFrame:
        out = self.kg.entities.where(F.col("entity_type") == entity_type)
        return out.limit(limit) if limit else out

    def object_type(self, uri: str) -> DataFrame:
        """URI → its rdf:type rows (registry-lookup J9 — derived from the
        triples table, no separate registry state)."""
        return self.kg.triples.where(
            (F.col("subject") == uri) & (F.col("predicate") == RDF_TYPE)
        ).select(F.col("subject").alias("uri"),
                 F.col("object").alias("entity_type"))

    def filter_by_property(self, prop_col: str, value) -> DataFrame:
        return self.kg.entities.where(F.col(prop_col) == value)

    def ask(self, predicate_df: DataFrame) -> bool:
        """SPARQL ASK twin: does any row satisfy the pattern?  (The
        reference evaluates ASK per candidate in a loop; batch callers
        should use hybrid_search's semi-join instead.)"""
        return predicate_df.limit(1).count() > 0

    # -- graph traversal ------------------------------------------------

    def linked_objects(self, uri: str, direction: str = "out") -> DataFrame:
        """1-hop neighbors via relation edges (J1).  direction: out | in |
        both (the reference's UNION of src/dst patterns,
        kgraph_bridge_utilities.py:498-512)."""
        rel = self.kg.relations
        out = rel.where(F.col("subj") == uri).select(
            F.col("obj").alias("entity_id"), "pred", "weight")
        inn = rel.where(F.col("obj") == uri).select(
            F.col("subj").alias("entity_id"), "pred", "weight")
        if direction == "out":
            hop = out
        elif direction == "in":
            hop = inn
        else:
            hop = out.unionByName(inn)
        return hop.join(self.kg.entities, "entity_id")

    def frames_for_entity(self, uri: str) -> DataFrame:
        """entity → frames where it fills the source slot (entity→frame→slot
        star, kgraph_frame_bridge.py:289-323)."""
        src = self.kg.slots.where(
            (F.col("slot_type") == SLOT_SOURCE) & (F.col("entity_value") == uri))
        return self.kg.frames.join(
            src.select("frame_uri"), "frame_uri", "left_semi")

    def frame_slots(self, frame_uri: str) -> DataFrame:
        return self.kg.slots.where(F.col("frame_uri") == frame_uri)

    # -- vector / hybrid -----------------------------------------------

    @property
    def vectors(self) -> DataFrame:
        if self._vectors is None:
            self._vectors = build_vector_records(self.kg.entities)
        return self._vectors

    def vector_search(self, query_text: str | None = None, limit: int = 10,
                      vector_id: str | None = None,
                      filters: dict | None = None,
                      score_threshold: float | None = None,
                      query_vector: list[float] | None = None) -> DataFrame:
        """vector_search / vector_search_by_type (kgraph.py:224-272);
        pass ``query_vector`` for vector_search_by_vector
        (kgraph.py:274-294)."""
        return _knn(self.vectors, query_text, k=limit, vector_id=vector_id,
                    metadata_filters=filters, score_threshold=score_threshold,
                    query_vector=query_vector)

    def available_vector_types(self, uri: str) -> DataFrame:
        """Vector ids stored for one object
        (get_available_vector_types_for_object, kgraph.py:487-501)."""
        return self.vectors.where(F.col("uri") == uri).select("vector_id")

    def hybrid_search(self, query_text: str, graph_candidates: DataFrame,
                      limit: int = 10,
                      vector_id: str | None = None) -> DataFrame:
        return _hybrid(self.vectors, graph_candidates, query_text,
                       k=limit, vector_id=vector_id)

    def object_vectors(self, uri: str) -> DataFrame:
        return self.vectors.where(F.col("uri") == uri)

    # -- stats ----------------------------------------------------------

    def stats(self) -> DataFrame:
        """Per-graph roll-up (kgraph.py:503-517)."""
        g = self.kg.triples.groupBy("graph").agg(
            F.count(F.lit(1)).alias("n_triples"))
        return (
            g.crossJoin(self.kg.entities.agg(
                F.count(F.lit(1)).alias("n_entities")))
            .crossJoin(self.kg.relations.agg(
                F.count(F.lit(1)).alias("n_relations")))
        )

    # -- SPARQL ---------------------------------------------------------

    def _sparql(self):
        from .sparql import SparqlEngine
        return SparqlEngine(self.kg.triples)

    def sparql_query(self, query: str) -> DataFrame:
        """SELECT over the triple table (kgraph.py:185-198): columns are
        the projected variables; the reference returns dict rows —
        ``[r.asDict() for r in df.collect()]`` is the literal analog."""
        return self._sparql().query(query)

    def sparql_ask(self, query: str) -> bool:
        """ASK → bool (kgraph.py:212-222)."""
        return self._sparql().ask(query)

    def sparql_construct(self, query: str) -> DataFrame:
        """CONSTRUCT → (subject, predicate, object) rows
        (kgraph.py:200-210)."""
        return self._sparql().construct(query)

    def sparql_describe(self, query: str) -> DataFrame:
        """DESCRIBE → every stored triple (all columns) of the described
        resources — the fourth query form (the reference gets it free
        from pyoxigraph; kgraph.py only wraps the other three, so this
        rounds out the pyoxigraph-level surface)."""
        return self._sparql().describe(query)

    def sparql_update(self, update: str) -> DataFrame:
        """SPARQL UPDATE (kgraph_rdf_db.py:342-357) as a pure transform:
        returns the NEW triples table (the reference mutates its
        embedded store and returns bool; here the caller commits the
        result through the snapshot catalog)."""
        return self._sparql().update(update)

    # -- serialization --------------------------------------------------

    def serialize(self, fmt: str = "turtle",
                  prefixes: dict[str, str] | None = None) -> str:
        """Dump the graph's triple table as one document string — the
        reference's ``serialize`` (kgraph_rdf_db.py:523-547; same default
        format, same reference spellings).  Driver-bounded exactly like
        the reference's in-process dump; for 100 TB outputs use
        ``serialize_df`` + ``df.write.text``."""
        from .io.serialize import dump_rdf_string
        return dump_rdf_string(self.kg.triples, fmt, prefixes=prefixes)

    def serialize_df(self, fmt: str = "turtle") -> DataFrame:
        """Distributed form: block/line rows (column ``value``) for a
        parallel text sink — see io/serialize.py for each format's
        ordering contract."""
        from .io.serialize import serialize_rdf
        return serialize_rdf(self.kg.triples, fmt)


class ChatView:
    """Chat/interaction query facade (the reference's KGraphChatBridge +
    KGraphInteractionBridge read surface, kgraph_chat_bridge.py:235-283 +
    578-586, kgraph_interaction_bridge.py:456-499) over the typed
    interaction/message tables built by ``operators.chat``."""

    def __init__(self, events: DataFrame, documents: DataFrame | None = None):
        from .operators.chat import build_interactions, build_messages
        self._events = events
        self._documents = documents
        self.interactions = build_interactions(events)
        self.messages = build_messages(events)

    def messages_for(self, interaction_uri: str) -> DataFrame:
        """Interaction → messages ordered by timestamp (ORDER BY
        ?timestamp, kgraph_chat_bridge.py:235-283)."""
        from .operators.chat import messages_for_interaction
        return messages_for_interaction(self.messages, interaction_uri)

    def recent_interactions(self, n: int = 10,
                            interaction_type: str | None = None,
                            start: str | None = None,
                            end: str | None = None) -> DataFrame:
        from .operators.chat import recent_interactions
        return recent_interactions(self.interactions, n, interaction_type,
                                   start, end)

    def interaction_context(self, interaction_uri: str,
                            include_messages: bool = True,
                            include_documents: bool = True,
                            include_tasks: bool = True,
                            include_tools: bool = True) -> dict:
        """Comprehensive per-interaction context
        (kgraph_bridge.py:128-137 ``get_interaction_context``): a dict of
        LAZY DataFrames keyed like the reference's result sections —
        nothing executes until the caller acts on a section, so asking
        for the full context costs only the sections actually read."""
        from .operators.chat import messages_for_interaction
        from .operators.tasks import (build_documents, build_tasks,
                                      build_tool_requests)
        w = F.col("interaction_uri") == interaction_uri
        out: dict[str, DataFrame] = {}
        if include_messages:
            out["messages"] = messages_for_interaction(
                self.messages, interaction_uri)
        if include_tasks:
            out["tasks"] = build_tasks(self._events).where(w)
        if include_tools:
            out["tool_requests"] = build_tool_requests(self._events).where(w)
        if include_documents:
            if self._documents is None:
                raise ValueError("ChatView was built without a documents "
                                 "table; pass documents= to include them")
            out["documents"] = build_documents(self._documents).where(w)
        return out

    def search_messages(self, k: int = 10,
                        score_col: str = "score") -> DataFrame:
        """Merged user+bot message search with global re-rank
        (kgraph_chat_bridge.py:578-586: per-class top-(k//2), then one
        sort by score)."""
        from .operators.chat import BOT_MESSAGE, USER_MESSAGE, merged_search
        m = self.messages.select("message_uri", "message_type", score_col)
        return merged_search(
            {USER_MESSAGE: m.where(F.col("message_type") == USER_MESSAGE),
             BOT_MESSAGE: m.where(F.col("message_type") == BOT_MESSAGE)},
            k=k, score_col=score_col)
