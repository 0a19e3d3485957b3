"""Chat/interaction surface vs python mirrors of the reference semantics
(kgraph_chat_bridge.py:235-283 ordered traversal, :578-586 merged
re-rank; kgraph_interaction_bridge.py:456-499 recent-N with filters)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark.api import ChatView
from kgraphmemory_spark.operators.chat import (
    BOT_MESSAGE,
    USER_MESSAGE,
    build_interactions,
    build_messages,
    merged_search,
)


@pytest.fixture(scope="module")
def events(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append((
            i,
            t0 + dt.timedelta(minutes=(37 * i) % 97),
            i % 4,  # 4 users
            ["click", "error", "view", "signup", "purchase"][i % 5],
            float((i * 13) % 50) / 2.0,
            f'{{"k": {i}}}',
        ))
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string").cache()


def test_messages_ordered_by_timestamp(events):
    cv = ChatView(events)
    msgs = cv.messages_for("urn:interaction:2").collect()
    assert msgs, "user 2 has events"
    assert [m.msg_idx for m in msgs] == list(range(1, len(msgs) + 1))
    ts = [m.ts for m in msgs]
    assert ts == sorted(ts)
    # property-based linking: every message belongs to the interaction
    raw = events.where(F.col("user_id") == 2).count()
    assert len(msgs) == raw


def test_message_typing(events):
    m = build_messages(events)
    got = {r.message_uri: r.message_type for r in m.collect()}
    for r in events.collect():
        want = USER_MESSAGE if r.event_type in (
            "click", "view", "purchase", "signup") else BOT_MESSAGE
        assert got[f"urn:msg:{r.event_id}"] == want


def test_recent_interactions_order_and_filters(events):
    cv = ChatView(events)
    top = cv.recent_interactions(n=3).collect()
    assert [r.rank for r in top] == [1, 2, 3]
    times = [r.update_time for r in top]
    assert times == sorted(times, reverse=True)
    # python mirror: per-user max ts desc
    per_user = {}
    for r in events.collect():
        u = f"urn:interaction:{r.user_id}"
        per_user[u] = max(per_user.get(u, dt.datetime.min), r.ts)
    want = [u for _, u in sorted(
        ((per_user[u], u) for u in per_user),
        key=lambda t: (-t[0].timestamp(), t[1]))][:3]
    assert [r.interaction_uri for r in top] == want
    # date-range filter
    cut = sorted(per_user.values())[2]
    few = cv.recent_interactions(n=10, end=cut.isoformat(sep=" ")).collect()
    assert all(r.update_time <= cut for r in few)


def test_merged_search_matches_reference_algorithm(events):
    """Reference: user_results(limit//2) + bot_results(limit//2), then one
    global sort by score (kgraph_chat_bridge.py:578-586)."""
    cv = ChatView(events)
    got = [(r.message_uri, r.rank) for r in cv.search_messages(k=6).collect()]
    rows = [(f"urn:msg:{r.event_id}",
             USER_MESSAGE if r.event_type in ("click", "view", "purchase",
                                              "signup") else BOT_MESSAGE,
             r.value) for r in events.collect()]
    def top(mtype, k):
        return sorted([r for r in rows if r[1] == mtype],
                      key=lambda t: (-t[2], t[0]))[:k]
    merged = sorted(top(USER_MESSAGE, 3) + top(BOT_MESSAGE, 3),
                    key=lambda t: (-t[2], t[0]))[:6]
    assert got == [(u, i + 1) for i, (u, _, _) in enumerate(merged)]


def test_interactions_census(events):
    inter = {r.interaction_uri: r.n_messages
             for r in build_interactions(events).collect()}
    assert sum(inter.values()) == events.count()
    assert set(inter) == {f"urn:interaction:{u}" for u in range(4)}


def test_interaction_context(events, spark):
    """get_interaction_context (kgraph_bridge.py:128-137): one dict with
    every section for the interaction, each a lazy per-section plan."""
    docs = spark.createDataFrame(
        [(1, "0", "en", 120), (2, "1", "de", 80)],
        "doc_id long, source string, lang string, n_chars long")
    cv = ChatView(events, documents=docs)
    ctx = cv.interaction_context("urn:interaction:0")
    assert set(ctx) == {"messages", "tasks", "tool_requests", "documents"}
    # user 0 owns events 0,4,8,... (40/4); errors drop from tasks only
    assert ctx["messages"].count() == 10
    n_err = events.where((F.col("user_id") == 0)
                         & (F.col("event_type") == "error")).count()
    assert ctx["tasks"].count() == 10 - n_err
    assert ctx["tool_requests"].count() == 10
    assert [r.doc_uri for r in ctx["documents"].collect()] == ["urn:doc:1"]
    # sections are opt-out, matching the reference's include_* flags
    slim = cv.interaction_context("urn:interaction:0",
                                  include_documents=False,
                                  include_tools=False)
    assert set(slim) == {"messages", "tasks"}
    # documents section without a documents table is a clear error
    with pytest.raises(ValueError, match="without a documents table"):
        ChatView(events).interaction_context("urn:interaction:0")
