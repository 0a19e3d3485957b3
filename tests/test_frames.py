"""Typed frame/slot builders — the presidents-shape fixture from the
reference (test/interaction_test.py:122-167: entity + biography frame with
birth/death datetime slots + party text slot, death nullable)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kgraphmemory_spark.operators.frames import (
    SLOT_CLASS_BOOLEAN,
    SLOT_CLASS_DATETIME,
    SLOT_CLASS_ENTITY,
    SLOT_CLASS_TEXT,
    SlotSpec,
    build_typed_frames,
    frame_slot_values,
)

SPECS = [
    SlotSpec("birthDate", SLOT_CLASS_DATETIME, "birth"),
    SlotSpec("deathDate", SLOT_CLASS_DATETIME, "death"),
    SlotSpec("party", SLOT_CLASS_TEXT, "party"),
    SlotSpec("inOffice", SLOT_CLASS_BOOLEAN, "in_office"),
    SlotSpec("homeState", SLOT_CLASS_ENTITY, "state_uri"),
]


@pytest.fixture(scope="module")
def built(spark):
    rows = spark.createDataFrame(
        [
            ("p1", "Washington", dt.datetime(1732, 2, 22),
             dt.datetime(1799, 12, 14), "none", False, "ent:virginia"),
            ("p2", "Lincoln", dt.datetime(1809, 2, 12),
             None, "republican", False, "ent:illinois"),
            ("p3", "Current", dt.datetime(1950, 1, 1),
             None, None, True, None),
        ],
        "pid string, name string, birth timestamp, death timestamp, "
        "party string, in_office boolean, state_uri string",
    )
    frames, slots = build_typed_frames(
        rows, "urn:biography_type", key_col="pid", slots=SPECS,
        name_col="name")
    return frames.cache(), slots.cache()


def test_frame_rows(built):
    frames, _ = built
    rows = frames.collect()
    assert len(rows) == 3
    assert all(r.frame_type == "urn:biography_type" for r in rows)
    assert len({r.frame_uri for r in rows}) == 3  # content-derived, unique


def test_one_value_column_per_slot(built):
    _, slots = built
    for r in slots.collect():
        non_null = [c for c in ("text_value", "datetime_value",
                                "boolean_value", "entity_value")
                    if r[c] is not None]
        assert len(non_null) == 1, r
        # value column matches the slot class
        want = {SLOT_CLASS_TEXT: "text_value",
                SLOT_CLASS_DATETIME: "datetime_value",
                SLOT_CLASS_BOOLEAN: "boolean_value",
                SLOT_CLASS_ENTITY: "entity_value"}[r.slot_class]
        assert non_null == [want]


def test_null_values_emit_no_slot(built):
    frames, slots = built
    by_frame = {r.name: r.frame_uri for r in frames.collect()}
    n = {name: slots.where(F.col("frame_uri") == u).count()
         for name, u in by_frame.items()}
    assert n["Washington"] == 5     # all slots set
    assert n["Lincoln"] == 4        # death missing
    assert n["Current"] == 2        # only birth + inOffice set


def test_deterministic_uris(spark, built):
    frames, slots = built
    rows2 = spark.createDataFrame(
        [("p2", "Lincoln", dt.datetime(1809, 2, 12), None,
          "republican", False, "ent:illinois")],
        "pid string, name string, birth timestamp, death timestamp, "
        "party string, in_office boolean, state_uri string")
    f2, s2 = build_typed_frames(rows2, "urn:biography_type", key_col="pid",
                                slots=SPECS, name_col="name")
    assert f2.first().frame_uri == frames.where(
        F.col("name") == "Lincoln").first().frame_uri
    assert ({r.slot_uri for r in s2.collect()}
            <= {r.slot_uri for r in slots.collect()})


def test_optional_reconstruction(built):
    frames, slots = built
    wide = frame_slot_values(
        frames, slots,
        ["urn:slot:party", "urn:slot:deathDate", "urn:slot:homeState"])
    by_name = {r.name: r for r in wide.collect()}
    assert by_name["Washington"].party == "none"
    assert by_name["Washington"].deathDate.startswith("1799-12-14")
    assert by_name["Lincoln"].deathDate is None      # OPTIONAL null
    assert by_name["Lincoln"].homeState == "ent:illinois"
    assert by_name["Current"].party is None
