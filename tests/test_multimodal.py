"""Multimodal plumbing: KGMM container decode, feature extraction, frame
sampling — Arrow-batch operators vs single-row pure-Python oracles; real
codec backends must raise the documented stub error."""

import hashlib

import numpy as np
import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark.operators.multimodal import (
    FRAME_BYTES,
    HEADER_LEN,
    decode_media,
    extract_features,
    pack_media,
    sample_frames,
    synth_media,
)

DOCS = [
    (0, "hash join beats nested loops"),
    (1, "a b c"),
    (2, "video payload " * 10),
    (3, ""),
    (5, "another video-ish doc " * 3),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


@pytest.fixture(scope="module")
def media(docs):
    return synth_media(docs).cache()


def test_container_layout(media):
    rows = {r.doc_id: r for r in media.collect()}
    assert len(rows) == len(DOCS)
    for doc_id, text in DOCS:
        mt, blob = pack_media(doc_id, text)
        assert rows[doc_id].media_type == mt
        assert bytes(rows[doc_id].content) == blob
    assert rows[0].media_type == "image"
    assert rows[1].media_type == "audio"
    assert rows[2].media_type == "video"


def test_decode(media):
    got = {r.doc_id: r for r in decode_media(media).collect()}
    for doc_id, text in DOCS:
        r = got[doc_id]
        assert r.width == 16 + doc_id % 64
        assert r.height == 16 + (doc_id * 7) % 64
        payload = text.encode("utf-8")
        assert r.n_payload_bytes == len(payload)
        assert r.payload_sha == hashlib.sha256(payload).hexdigest()


def test_decode_drops_malformed(spark):
    bad = spark.createDataFrame(
        [(99, "image", b"NOTM" + b"\x00" * 20), (100, "image", b"")],
        "doc_id long, media_type string, content binary")
    assert decode_media(bad).count() == 0


def test_real_backends_are_stubs(media):
    with pytest.raises(NotImplementedError):
        decode_media(media, backend="pil")
    with pytest.raises(NotImplementedError):
        extract_features(media, backend="clip")


def test_features_match_numpy(media):
    got = {r.doc_id: list(r.feature) for r in extract_features(media).collect()}
    for doc_id, text in DOCS:
        payload = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
        hist = np.bincount(payload // 32, minlength=8)[:8]
        total = float(hist.sum()) or 1.0
        want = [float(x) / total for x in hist]
        assert got[doc_id] == pytest.approx(want)


def test_frame_sampling(media):
    rows = sample_frames(media, every_n=4).collect()
    assert rows, "video docs must produce frames"
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    # only media_type == video fans out
    assert set(by_doc) == {2, 5}
    for doc_id, text in DOCS:
        if doc_id not in by_doc:
            continue
        payload = text.encode("utf-8")
        n_frames = (len(payload) + FRAME_BYTES - 1) // FRAME_BYTES
        want_idx = list(range(0, n_frames, 4))
        got = sorted(by_doc[doc_id], key=lambda r: r.frame_idx)
        assert [r.frame_idx for r in got] == want_idx
        for r in got:
            chunk = payload[r.frame_idx * FRAME_BYTES:(r.frame_idx + 1) * FRAME_BYTES]
            assert r.frame_sha == hashlib.sha256(chunk).hexdigest()
