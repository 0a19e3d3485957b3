"""Deterministic id functions.

The reference uses random URIs (`URIGenerator.generate_uri()`,
kgraph_bridge_utilities.py:105) and wall-clock timestamps
(kgraph_bridge_utilities.py:790-810).  For idempotent, resumable batch
construction every id must be content-derived — these helpers are the only
id factories in the engine.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sha_id(prefix: str, *cols: Column, length: int = 24) -> Column:
    """`prefix:` + first ``length`` hex chars of sha256(col1|col2|...)."""
    return F.concat(
        F.lit(prefix + ":"),
        F.substring(F.sha2(F.concat_ws("|", *cols), 256), 1, length),
    )


def frame_uri_col(subj: Column, pred: Column, obj: Column) -> Column:
    """Mirror of semantics.frame_uri (sha256 of 'subj|pred|obj', 24 hex)."""
    return sha_id("frame", subj, pred, obj)


def slot_uri_col(frame: Column, slot_type: Column) -> Column:
    return sha_id("slot", frame, slot_type)


@F.pandas_udf(T.StringType())
def uuid5_url_udf(key: pd.Series) -> pd.Series:
    """uuid5(NAMESPACE_URL, key) — exact parity with the reference's vector
    record ids (kgraph.py:82-88: uuid5 of f"{uri}#{vector_id}")."""
    import uuid
    return key.map(lambda k: str(uuid.uuid5(uuid.NAMESPACE_URL, k)))


def vector_record_id_col(uri: Column, vector_id: Column) -> Column:
    return uuid5_url_udf(F.concat_ws("#", uri, vector_id))
