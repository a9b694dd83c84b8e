"""Tuple-form items + additionalItems on typed array columns —
reference semantics from jesse_validator_draft3.erl:511-536 including
the longer-array prefix-skip quirk (:524-526)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sparkjesse.engine import ValidationEngine
from sparkjesse.errors import DRAFT3


def _validate(spark, rows, schema, draft=None):
    df = spark.createDataFrame(rows, "doc_id string, arr array<int>")
    res = ValidationEngine().validate(df, schema, draft=draft)
    out = {}
    for r in res.annotated.collect():
        out[r["doc_id"]] = sorted(
            (v["error_type"], v["path"]) for v in r["violations"])
    return out


TUPLE = {"type": "object",
         "properties": {"arr": {"items": [{"minimum": 10},
                                          {"maximum": 5}]}}}


def test_draft3_tuple_semantics(spark):
    schema = dict(TUPLE)
    out = _validate(spark, [
        ("exact_ok", [10, 3]),
        ("exact_bad", [1, 30]),
        ("short", [10]),
        ("longer_quirk", [1, 30, 99]),  # prefix NOT validated (quirk)
    ], schema, draft=DRAFT3)
    assert out["exact_ok"] == []
    assert out["exact_bad"] == [("not_in_range", "/arr/0"),
                                ("not_in_range", "/arr/1")]
    assert out["short"] == [("not_enought_items", "/arr")]
    assert out["longer_quirk"] == []


def test_draft3_additional_items_false(spark):
    schema = {"type": "object",
              "properties": {"arr": {"items": [{"minimum": 10}],
                                     "additionalItems": False}}}
    out = _validate(spark, [
        ("ok", [10]),
        ("extra", [10, 1]),
    ], schema, draft=DRAFT3)
    assert out["ok"] == []
    assert out["extra"] == [("no_extra_items_allowed", "/arr")]


def test_draft3_additional_items_schema(spark):
    schema = {"type": "object",
              "properties": {"arr": {"items": [{"minimum": 10}],
                                     "additionalItems": {"maximum": 0}}}}
    out = _validate(spark, [
        ("ok", [10, -1, -2]),
        ("bad_extra", [10, -1, 7]),   # index 2 violates additionalItems
        ("bad_prefix", [3, -1]),      # prefix IS validated here
    ], schema, draft=DRAFT3)
    assert out["ok"] == []
    assert out["bad_extra"] == [("not_in_range", "/arr/2")]
    assert out["bad_prefix"] == [("not_in_range", "/arr/0")]


def test_draft4_tuple_semantics(spark):
    schema = {"$schema": "http://json-schema.org/draft-04/schema#",
              **TUPLE}
    out = _validate(spark, [
        ("short_ok", [10]),           # draft4: short arrays pass
        ("prefix_checked", [1, 30, 99]),  # draft4: prefix always checked
    ], schema)
    assert out["short_ok"] == []
    assert out["prefix_checked"] == [("not_in_range", "/arr/0"),
                                     ("not_in_range", "/arr/1")]


def test_draft4_additional_items_false(spark):
    schema = {"$schema": "http://json-schema.org/draft-04/schema#",
              "type": "object",
              "properties": {"arr": {"items": [{"minimum": 10}],
                                     "additionalItems": False}}}
    out = _validate(spark, [("extra", [10, 1])], schema)
    assert out["extra"] == [("no_extra_items_allowed", "/arr")]
