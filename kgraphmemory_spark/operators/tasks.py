"""Typed task / tool / document facades — the reference's KGTask, KGTool
and KGDocument object families (kgraph_task_bridge.py,
kgraph_tool_bridge.py, kgraph_document_bridge.py) re-expressed as typed
tables + set-oriented rollups.

Reference semantics mirrored:
- KGTask objects carry ``hasKGTaskStatus`` ∈ {pending, in_progress,
  completed, cancelled} and link to their interaction by URI property;
  ``get_interaction_task_summary`` (kgraph_task_bridge.py:243-269) walks
  every task of one interaction and buckets it per status — here ONE
  pivot aggregation produces the same buckets for EVERY interaction at
  once (the reference's per-task ``get_task_details`` probe loop is the
  N+1 shape this engine never does);
- ``get_tasks_by_status`` (kgraph_task_bridge.py:288-299) =
  ``filter_by_property("KGTask", "hasKGTaskStatus", status)`` — a pushed
  equality predicate on the scan;
- KGTool objects carry ``hasName``; ``get_tool_by_name``
  (kgraph_tool_bridge.py:84-95) is an exact-name lookup on the tool
  registry — the registry is vocabulary-sized, so consumers join it
  broadcast (J9 registry-lookup join);
- tool requests carry ``hasKGToolRequestStatus``;
  ``get_interaction_tool_summary`` (kgraph_tool_bridge.py:292-330)
  buckets requests into pending / failed / with-results — same pivot
  shape as the task summary.

Construction lifts the synthetic ``events`` stream to these shapes (one
task or tool request per event, one tool per event type) — the same
constructors a real deployment points at its task/tool log.  The status
derivations are deterministic pure functions of event columns so the
DuckDB oracle can mirror them as CASE expressions.

Scale notes: the summaries are single hash aggregations with map-side
combine (sum-of-CASE / pivot — decomposable); the tool registry is tiny
and broadcast; per-interaction task tables written at scale partition by
bucket(interaction_uri) so summary scans prune.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TASK_STATUSES = ("pending", "in_progress", "completed", "cancelled")
REQUEST_STATUSES = ("pending", "failed", "completed")

# event_type → hasKGTaskStatus (synthetic-corpus convention, same spirit
# as chat.py's user/bot message split): user intent events are pending /
# in-progress work, purchases complete it, signups cancel-and-replace it;
# 'error' events are not tasks at all — they surface as failed tool
# requests below.
_TASK_STATUS = {"click": "pending", "view": "in_progress",
                "purchase": "completed", "signup": "cancelled"}


def _interaction_uri() -> F.Column:
    return F.concat(F.lit("urn:interaction:"),
                    F.col("user_id").cast("string"))


def build_tasks(events: DataFrame) -> DataFrame:
    """events → tasks(task_uri, interaction_uri, name, status, ts): one
    KGTask per non-error event, linked to its interaction by URI property
    (kgraph_task_bridge.py: hasKGTaskInteractionURI analog)."""
    status = F.col("event_type")
    expr = F.lit(None).cast("string")
    for et, st in sorted(_TASK_STATUS.items()):
        expr = F.when(status == et, F.lit(st)).otherwise(expr)
    return (
        events.where(F.col("event_type") != "error")
        .select(
            F.concat(F.lit("urn:task:"), F.col("event_id").cast("string"))
            .alias("task_uri"),
            _interaction_uri().alias("interaction_uri"),
            F.concat(F.lit("task "), F.col("event_id").cast("string"))
            .alias("name"),
            expr.alias("status"),
            F.col("ts"),
        )
    )


def get_tasks_by_status(tasks: DataFrame, status: str) -> DataFrame:
    """filter_by_property("KGTask","hasKGTaskStatus",status)
    (kgraph_task_bridge.py:288-299) — a pushed equality predicate."""
    return tasks.where(F.col("status") == status)


def interaction_task_summary(tasks: DataFrame) -> DataFrame:
    """Per-interaction status buckets for ALL interactions in one pivot
    (kgraph_task_bridge.py:243-269 ``get_interaction_task_summary``; the
    reference's per-task detail loop is replaced by one decomposable
    aggregation).  → (interaction_uri, total_tasks, n_pending,
    n_in_progress, n_completed, n_cancelled)."""
    return (
        tasks.groupBy("interaction_uri")
        .pivot("status", list(TASK_STATUSES)).count()
        .select(
            "interaction_uri",
            sum((F.coalesce(F.col(s), F.lit(0)) for s in TASK_STATUSES),
                F.lit(0)).cast("long").alias("total_tasks"),
            *[F.coalesce(F.col(s), F.lit(0)).cast("long").alias(f"n_{s}")
              for s in TASK_STATUSES],
        )
    )


def build_tools(events: DataFrame) -> DataFrame:
    """events → tools(tool_uri, name, tool_type): the tool registry — one
    KGTool per distinct event type (kgraph_tool_bridge.py:40-82
    ``create_tool``).  Vocabulary-sized: consumers broadcast it."""
    return (
        events.select(F.col("event_type").alias("name")).distinct()
        .select(
            F.concat(F.lit("urn:tool:"), F.col("name")).alias("tool_uri"),
            "name",
            F.lit("urn:kg:KGTool").alias("tool_type"),
        )
    )


def get_tool_by_name(tools: DataFrame, name: str) -> DataFrame:
    """Exact-name registry lookup (kgraph_tool_bridge.py:84-95
    ``get_tool_by_name``): ≤1 row; callers broadcast-join it."""
    return tools.where(F.col("name") == name)


def build_tool_requests(events: DataFrame) -> DataFrame:
    """events → requests(request_uri, interaction_uri, tool_uri, status):
    one tool request per event against the tool named by its event type;
    hasKGToolRequestStatus = failed for error events, pending below the
    value threshold, completed (has results) otherwise."""
    status = (
        F.when(F.col("event_type") == "error", F.lit("failed"))
        .when(F.col("value") < 5, F.lit("pending"))
        .otherwise(F.lit("completed"))
    )
    return events.select(
        F.concat(F.lit("urn:req:"), F.col("event_id").cast("string"))
        .alias("request_uri"),
        _interaction_uri().alias("interaction_uri"),
        F.concat(F.lit("urn:tool:"), F.col("event_type")).alias("tool_uri"),
        status.alias("status"),
    )


def interaction_tool_summary(requests: DataFrame) -> DataFrame:
    """Per-interaction request buckets (kgraph_tool_bridge.py:292-330
    ``get_interaction_tool_summary``): pending / failed / with-results
    (the reference's else-bucket) — one hash aggregation for every
    interaction at once."""
    return (
        requests.groupBy("interaction_uri")
        .agg(
            F.count(F.lit(1)).alias("total_requests"),
            F.sum(F.when(F.col("status") == "pending", 1).otherwise(0))
            .cast("long").alias("n_pending"),
            F.sum(F.when(F.col("status") == "failed", 1).otherwise(0))
            .cast("long").alias("n_failed"),
            F.sum(F.when(~F.col("status").isin("pending", "failed"), 1)
                  .otherwise(0)).cast("long").alias("n_with_results"),
        )
    )


def build_documents(documents: DataFrame) -> DataFrame:
    """documents → typed KGDocument rows (doc_uri, interaction_uri,
    doc_type, content_length): the document-bridge object shape
    (kgraph_document_bridge.py: KGDocument with hasKGDocumentContent),
    lifted from the synthetic corpus — one document per row, linked to
    its source interaction, typed by language."""
    return documents.select(
        F.concat(F.lit("urn:doc:"), F.col("doc_id").cast("string"))
        .alias("doc_uri"),
        F.concat(F.lit("urn:interaction:"), F.col("source"))
        .alias("interaction_uri"),
        F.col("lang").alias("doc_type"),
        F.col("n_chars").cast("long").alias("content_length"),
    )


def interaction_document_summary(docs: DataFrame) -> DataFrame:
    """Per-(interaction, type) document rollup
    (kgraph_document_bridge.py:247-281 ``get_interaction_document_summary``
    builds total count, by-type counts, and total content length by
    probing each document's details in a loop; set-oriented that is one
    grouped aggregation for every interaction at once).  Per-interaction
    totals are the downstream re-aggregation of these rows."""
    return (
        docs.groupBy("interaction_uri", "doc_type")
        .agg(F.count(F.lit(1)).alias("n_documents"),
             F.sum("content_length").cast("long")
             .alias("total_content_length"))
    )
