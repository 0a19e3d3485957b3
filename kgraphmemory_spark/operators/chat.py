"""Chat / interaction surface — the reference's second-biggest API family
(kgraph_chat_bridge.py, kgraph_interaction_bridge.py) re-expressed as
typed tables + DataFrame builders.

Reference semantics mirrored:
- KGChatInteraction / KGChatMessage typed objects with
  hasKGChatInteractionURI property-based linking
  (kgraph_chat_bridge.py:252-283: message → interaction URI property,
  ORDER BY ?timestamp) — here `messages.interaction_uri` + an orderBy;
- get_recent_interactions: ORDER BY DESC(?updateTime) LIMIT n with
  optional type / date-range filters
  (kgraph_interaction_bridge.py:456-499);
- search_chat_messages: per-type top-(k/2) searches merged and re-ranked
  globally by score (kgraph_chat_bridge.py:578-586) — the per-type limit
  happens BEFORE the merge, exactly like the reference's
  `limit // 2` splits.

Construction here lifts the synthetic `events` stream to the chat shape
(one interaction per user, one message per event) — the same
constructor a real deployment points at its message log.  All builders
are lazy plans; ordering is materialized as an explicit index column
(`msg_idx` / `rank`) so a sorted-row comparison still proves the ORDER BY.

Scale notes: messages-per-interaction is a partition-prunable predicate
when the messages table is written partitioned by bucket(interaction_uri);
recent-N is a TakeOrderedAndProject (no global sort); the merged search
re-rank runs on ≤ k rows per type.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INTERACTION_TYPE = "urn:kg:KGChatInteraction"
USER_MESSAGE = "KGChatUserMessage"
BOT_MESSAGE = "KGChatBotMessage"

# event_type → message class: user-initiated events are user messages,
# system-emitted ones bot messages (synthetic-corpus convention)
_USER_EVENT_TYPES = ("click", "view", "purchase", "signup")


def build_interactions(events: DataFrame) -> DataFrame:
    """events → interactions(interaction_uri, name, interaction_type,
    update_time, n_messages): one KGChatInteraction per user session
    thread; update_time = latest message timestamp (the reference's
    hasObjectUpdateTime, kgraph_interaction_bridge.py:484)."""
    return (
        events.groupBy(F.col("user_id"))
        .agg(F.max("ts").alias("update_time"),
             F.count(F.lit(1)).alias("n_messages"))
        .select(
            F.concat(F.lit("urn:interaction:"), F.col("user_id").cast("string"))
            .alias("interaction_uri"),
            F.concat(F.lit("interaction "), F.col("user_id").cast("string"))
            .alias("name"),
            F.lit(INTERACTION_TYPE).alias("interaction_type"),
            "update_time", "n_messages",
        )
    )


def build_messages(events: DataFrame) -> DataFrame:
    """events → messages(message_uri, interaction_uri, message_type,
    content, ts): property-based linking via interaction_uri
    (kgraph_chat_bridge.py:263-271 `hasKGChatInteractionURI`)."""
    return events.select(
        F.concat(F.lit("urn:msg:"), F.col("event_id").cast("string"))
        .alias("message_uri"),
        F.concat(F.lit("urn:interaction:"), F.col("user_id").cast("string"))
        .alias("interaction_uri"),
        F.when(F.col("event_type").isin(*_USER_EVENT_TYPES),
               F.lit(USER_MESSAGE)).otherwise(F.lit(BOT_MESSAGE))
        .alias("message_type"),
        F.col("props").alias("content"),
        F.col("ts"),
        F.col("value").alias("score"),
    )


def messages_for_interaction(messages: DataFrame,
                             interaction_uri: str) -> DataFrame:
    """Interaction → its messages ordered by timestamp
    (kgraph_chat_bridge.py:235-283).  msg_idx materializes the ORDER BY
    ?timestamp position (ties broken by message_uri — the reference's
    result order is store-dependent on ties; here it is total)."""
    # partitioned by interaction_uri: with the equality filter this is the
    # same total order, but the window never funnels to one partition —
    # an unfiltered/multi-interaction caller still gets per-thread indexes
    # at per-thread cost
    w = Window.partitionBy("interaction_uri").orderBy(
        F.col("ts"), F.col("message_uri"))
    return (
        messages.where(F.col("interaction_uri") == interaction_uri)
        .withColumn("msg_idx", F.row_number().over(w))
        .select("msg_idx", "message_uri", "message_type", "content", "ts")
    )


def recent_interactions(interactions: DataFrame, n: int = 10,
                        interaction_type: str | None = None,
                        start: str | None = None,
                        end: str | None = None) -> DataFrame:
    """Most-recent-N interactions (kgraph_interaction_bridge.py:456-499):
    optional type / date-range filters then ORDER BY DESC(updateTime)
    LIMIT n — a TakeOrderedAndProject, never a global sort.  `rank`
    materializes the order for set-compared consumers."""
    out = interactions
    if interaction_type is not None:
        out = out.where(F.col("interaction_type") == interaction_type)
    if start is not None:
        out = out.where(F.col("update_time") >= start)
    if end is not None:
        out = out.where(F.col("update_time") <= end)
    # distributed top-N FIRST (TakeOrderedAndProject) — the rank window
    # then touches only the n survivors, never a single-partition sort of
    # every interaction (user-cardinality at web scale)
    topn = out.orderBy(F.desc("update_time"), F.asc("interaction_uri")).limit(n)
    w = Window.orderBy(F.desc("update_time"), F.asc("interaction_uri"))
    return (
        topn.withColumn("rank", F.row_number().over(w))
        .select("rank", "interaction_uri", "name", "update_time", "n_messages")
    )


def merged_search(scored_by_type: dict[str, DataFrame], k: int = 10,
                  score_col: str = "score") -> DataFrame:
    """Merged multi-type search with global re-rank
    (kgraph_chat_bridge.py:578-586): each type contributes its own
    top-(k // n_types) (the reference's `limit // 2` per message class),
    then one global re-rank by score takes the final k.

    Each input DataFrame must carry ``score_col``; per-type and global
    ranks tie-break on message_uri so the result set is deterministic.
    """
    per = k // max(len(scored_by_type), 1)
    parts = []
    for _type, df in sorted(scored_by_type.items()):
        parts.append(
            df.orderBy(F.desc(score_col), F.asc("message_uri")).limit(per))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    w = Window.orderBy(F.desc(score_col), F.asc("message_uri"))
    return (
        out.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )
