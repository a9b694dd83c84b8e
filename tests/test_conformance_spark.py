"""Conformance corpus as a single DataFrame batch through the Arrow-batched
pandas-UDF path (``ValidationEngine.validate_json``) — the dynamic-JSON leg
of the north star. Every fixture case becomes a row; expected verdicts must
match exactly, per draft."""

from __future__ import annotations

import json

import pytest

from pyspark.sql import functions as F

from sparkjesse import errors as E
from sparkjesse.engine import ValidationEngine
from tests.test_conformance_local import iter_cases


@pytest.mark.parametrize("draft,default_draft",
                         [("draft3", E.DRAFT3), ("draft4", E.DRAFT4)])
def test_dataframe_batch_conformance(spark, draft, default_draft):
    # group cases by schema so each distinct schema runs as one batch job
    by_schema: dict[str, list] = {}
    registries: dict[str, dict] = {}
    for case_id, schema, data, valid, registry in iter_cases(draft):
        key = json.dumps(schema, sort_keys=True)
        by_schema.setdefault(key, []).append((case_id, data, valid))
        if registry is not None:
            registries[key] = {k: registry.read(k) for k in registry.keys()}

    total = 0
    failures = []
    for key, cases in by_schema.items():
        schema = json.loads(key)
        eng = ValidationEngine(default_draft=default_draft)
        for k, v in registries.get(key, {}).items():
            eng.add_schema(k, v)
        df = spark.createDataFrame(
            [(cid, json.dumps(data)) for cid, data, _ in cases],
            "case_id string, doc string")
        res = eng.validate_json(df, "doc", schema, doc_id_col="case_id")
        got = {r["case_id"]: r["valid"]
               for r in res.annotated.select("case_id", "valid").collect()}
        for cid, _, expected in cases:
            total += 1
            if got[cid] != expected:
                failures.append((cid, expected))
    assert total > 150
    assert not failures, f"{len(failures)} batch mismatches: {failures[:10]}"


def test_violation_rows_through_batch_path(spark):
    """Exploded violations table carries jesse-parity rows end-to-end."""
    eng = ValidationEngine(default_draft=E.DRAFT3)
    schema = {"type": "object",
              "properties": {"foo": {"type": "integer", "required": True}},
              "additionalProperties": False}
    df = spark.createDataFrame(
        [("d1", '{"foo": 1}'),
         ("d2", '{"foo": "bar", "extra": 1}'),
         ("d3", 'not json at all')],
        "doc_id string, doc string")
    res = eng.validate_json(df, "doc", schema, draft=E.DRAFT3)
    rows = sorted((r["doc_id"], r["error_type"], r["path"], r["detail"])
                  for r in res.violations.collect())
    assert rows == [
        ("d2", E.NO_EXTRA_PROPERTIES_ALLOWED, "/extra", "extra"),
        ("d2", E.WRONG_TYPE, "/foo", ""),
        ("d3", "parse_error", "", rows[2][3]),
    ]
    assert res.totals() == {"docs": 3, "pass": 1, "fail": 2}
