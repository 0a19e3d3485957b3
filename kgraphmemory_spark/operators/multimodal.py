"""Multimodal columns: image/audio/video as opaque `binary` + typed
metadata, with decode / feature-extract / frame-sample as Arrow-batched
`mapInPandas` operators.

The reference stores documents as opaque content with a type tag
(/root/reference/kgraphmemory/kgraph_document_bridge.py:47-78
hasKGDocumentContent/Type) and never decodes; the north-rule training-data
pipeline needs the decode stage, so the Spark-side plumbing here is real
(schemas, batch iteration, partitioning) while the actual codec backends
(PIL / librosa / ffmpeg — not shipped in this sandbox) are stubbed behind
``NotImplementedError`` with a deterministic fake backend used by tests.

Fake container format (so decode is verifiable end-to-end, including by the
DuckDB oracle): 4-byte magic ``KGMM`` + uint32-BE width + uint32-BE height
+ raw payload bytes.  `synth_media` derives every field deterministically
from (doc_id, text), so decoded metadata is SQL-expressible.
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"KGMM"
HEADER_LEN = 12
FRAME_BYTES = 16

MEDIA_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("content", T.BinaryType()),
])

DECODED_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("n_payload_bytes", T.LongType()),
    T.StructField("payload_sha", T.StringType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("feature", T.ArrayType(T.DoubleType())),
])

FRAMES_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("frame_idx", T.LongType()),
    T.StructField("frame_sha", T.StringType()),
])


def pack_media(doc_id: int, text: str) -> tuple[str, bytes]:
    """Single-row oracle for synth_media (pure fn, shared with tests)."""
    media_type = ("image", "audio", "video")[doc_id % 3]
    width = 16 + doc_id % 64
    height = 16 + (doc_id * 7) % 64
    payload = (text or "").encode("utf-8")
    return media_type, MAGIC + struct.pack(">II", width, height) + payload


def synth_media(docs: DataFrame, id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """documents → media(doc_id, media_type, content binary) — the
    deterministic stand-in for a real media column at ingest."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [pack_media(int(i), t)
                    for i, t in zip(pdf[id_col], pdf[text_col])]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "media_type": [r[0] for r in rows],
                "content": [r[1] for r in rows],
            })
    return docs.select(id_col, text_col).mapInPandas(gen, MEDIA_SCHEMA)


def decode_media(media: DataFrame, backend: str = "fake") -> DataFrame:
    """media → decoded metadata.  ``backend='fake'`` parses the KGMM
    container; real codecs are explicit stubs (the container libs are not in
    this environment — SURVEY.md §7.3 documented limitation)."""
    if backend != "fake":
        raise NotImplementedError(
            f"decode backend {backend!r}: real image/audio codecs (PIL, "
            "librosa, ffmpeg) are not available in this environment; the "
            "Spark plumbing (schema, Arrow batching, partitioning) is "
            "identical for a real backend — swap this function body only.")

    def dec(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {k: [] for k in ("doc_id", "media_type", "width", "height",
                                   "n_payload_bytes", "payload_sha")}
            for i, mt, raw in zip(pdf["doc_id"], pdf["media_type"], pdf["content"]):
                raw = bytes(raw)
                if raw[:4] != MAGIC or len(raw) < HEADER_LEN:
                    continue  # malformed rows dropped, like blank NT lines
                w, h = struct.unpack(">II", raw[4:HEADER_LEN])
                payload = raw[HEADER_LEN:]
                out["doc_id"].append(int(i))
                out["media_type"].append(mt)
                out["width"].append(w)
                out["height"].append(h)
                out["n_payload_bytes"].append(len(payload))
                out["payload_sha"].append(hashlib.sha256(payload).hexdigest())
            yield pd.DataFrame(out)
    return media.mapInPandas(dec, DECODED_SCHEMA)


def extract_features(media: DataFrame, backend: str = "fake",
                     bins: int = 8) -> DataFrame:
    """media → fixed-width feature vector per item.  Fake backend: L1-
    normalized byte histogram of the payload (deterministic; numpy-
    vectorized inside the Arrow batch).  Real embedding models are stubs."""
    if backend != "fake":
        raise NotImplementedError(
            f"feature backend {backend!r}: model runtimes are not available "
            "in this environment; replace the batch fn body to integrate one.")

    import numpy as np

    def feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for i, raw in zip(pdf["doc_id"], pdf["content"]):
                payload = np.frombuffer(bytes(raw)[HEADER_LEN:], dtype=np.uint8)
                hist = np.bincount(payload // (256 // bins), minlength=bins)[:bins]
                total = float(hist.sum()) or 1.0
                ids.append(int(i))
                feats.append([float(x) / total for x in hist])
            yield pd.DataFrame({"doc_id": ids, "feature": feats})
    return media.mapInPandas(feat, FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 4) -> DataFrame:
    """video media → every ``every_n``-th fixed-size frame of the payload
    (frame-sampling shape for video pipelines: one input row fans out to
    0..n output rows inside the Arrow batch)."""
    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, shas = [], [], []
            for i, raw in zip(pdf["doc_id"], pdf["content"]):
                payload = bytes(raw)[HEADER_LEN:]
                n = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, n, every_n):
                    chunk = payload[fi * FRAME_BYTES:(fi + 1) * FRAME_BYTES]
                    ids.append(int(i))
                    idxs.append(fi)
                    shas.append(hashlib.sha256(chunk).hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame_sha": shas})
    return (
        media.where(F.col("media_type") == "video")
        .mapInPandas(frames, FRAMES_SCHEMA)
    )
