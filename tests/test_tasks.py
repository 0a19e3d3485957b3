"""Typed task / tool facades (kgraph_task_bridge.py / kgraph_tool_bridge.py
analogs): status buckets, exact-name registry lookup, per-interaction
rollups — all set-oriented (one pivot/agg for every interaction, never the
reference's per-object probe loop)."""

import datetime

from pyspark.sql import functions as F

from kgraphmemory_spark.operators.tasks import (
    build_tasks,
    build_tool_requests,
    build_tools,
    get_tasks_by_status,
    get_tool_by_name,
    interaction_task_summary,
    interaction_tool_summary,
)

_TS = datetime.datetime(2024, 1, 1)

EVENTS = [
    # event_id, ts, user_id, event_type, value, props
    (0, _TS, 1, "click", 1.0, "{}"),
    (1, _TS, 1, "view", 9.0, "{}"),
    (2, _TS, 1, "purchase", 2.0, "{}"),
    (3, _TS, 1, "error", 9.0, "{}"),
    (4, _TS, 2, "signup", 9.0, "{}"),
    (5, _TS, 2, "click", 9.0, "{}"),
]
SCHEMA = ("event_id long, ts timestamp, user_id long, event_type string, "
          "value double, props string")


def _events(spark):
    return spark.createDataFrame(EVENTS, SCHEMA)


def test_task_summary_buckets_every_interaction(spark):
    tasks = build_tasks(_events(spark))
    # error events are not tasks
    assert tasks.count() == 5
    rows = {r.interaction_uri: r for r in
            interaction_task_summary(tasks).collect()}
    u1 = rows["urn:interaction:1"]
    assert (u1.total_tasks, u1.n_pending, u1.n_in_progress,
            u1.n_completed, u1.n_cancelled) == (3, 1, 1, 1, 0)
    u2 = rows["urn:interaction:2"]
    assert (u2.total_tasks, u2.n_pending, u2.n_cancelled) == (2, 1, 1)


def test_tasks_by_status_filter(spark):
    tasks = build_tasks(_events(spark))
    pend = get_tasks_by_status(tasks, "pending").collect()
    assert {r.task_uri for r in pend} == {"urn:task:0", "urn:task:5"}
    assert all(r.status == "pending" for r in pend)


def test_tool_registry_and_exact_name_lookup(spark):
    tools = build_tools(_events(spark))
    assert {(r.tool_uri, r.name) for r in tools.collect()} == {
        ("urn:tool:click", "click"), ("urn:tool:view", "view"),
        ("urn:tool:purchase", "purchase"), ("urn:tool:error", "error"),
        ("urn:tool:signup", "signup")}
    hit = get_tool_by_name(tools, "purchase").collect()
    assert len(hit) == 1 and hit[0].tool_uri == "urn:tool:purchase"
    assert get_tool_by_name(tools, "nope").count() == 0


def test_tool_request_summary(spark):
    reqs = build_tool_requests(_events(spark))
    rows = {r.interaction_uri: r for r in
            interaction_tool_summary(reqs).collect()}
    u1 = rows["urn:interaction:1"]
    # click(1.0)→pending, view(9)→completed, purchase(2)→pending,
    # error→failed
    assert (u1.total_requests, u1.n_pending, u1.n_failed,
            u1.n_with_results) == (4, 2, 1, 1)
    u2 = rows["urn:interaction:2"]
    assert (u2.total_requests, u2.n_pending, u2.n_failed,
            u2.n_with_results) == (2, 0, 0, 2)


def test_lookup_join_is_broadcast(spark):
    """The registry-lookup join (J9) must be a broadcast join — the tool
    registry is vocabulary-sized, never worth a shuffle of the request
    stream."""
    tools = build_tools(_events(spark))
    reqs = build_tool_requests(_events(spark))
    j = reqs.join(F.broadcast(get_tool_by_name(tools, "click")), "tool_uri")
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert j.count() == 2


def test_document_summary_rollup(spark):
    docs = spark.createDataFrame(
        [(1, "t", "en", "web", 100), (2, "t", "en", "web", 50),
         (3, "t", "fr", "web", 7), (4, "t", "en", "wiki", 9)],
        "doc_id long, text string, lang string, source string, n_chars long")
    from kgraphmemory_spark.operators.tasks import (
        build_documents,
        interaction_document_summary,
    )
    rows = {(r.interaction_uri, r.doc_type):
            (r.n_documents, r.total_content_length)
            for r in interaction_document_summary(
                build_documents(docs)).collect()}
    assert rows == {
        ("urn:interaction:web", "en"): (2, 150),
        ("urn:interaction:web", "fr"): (1, 7),
        ("urn:interaction:wiki", "en"): (1, 9),
    }
