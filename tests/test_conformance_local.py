"""JSON-Schema-Test-Suite-style conformance, local single-value path.

Mirrors the reference's harness contract
(`/root/reference/test/jesse_tests_draft3_SUITE.erl:204-228`): for every
fixture case, ``valid:true`` ⇒ no violations, ``valid:false`` ⇒ ≥1 violation.
The same corpus also runs as a single DataFrame batch in
``test_conformance_spark.py``.
"""

from __future__ import annotations

import json
import os

import pytest

from sparkjesse import errors as E
from sparkjesse.pyvalidator import validate_value
from sparkjesse.registry import SchemaRegistry

HERE = os.path.dirname(__file__)
FIXTURES = os.path.join(HERE, "fixtures")


def iter_cases(draft: str):
    root = os.path.join(FIXTURES, draft)
    for fname in sorted(os.listdir(root)):
        if not fname.endswith(".json"):
            continue
        with open(os.path.join(root, fname), encoding="utf-8") as fh:
            groups = json.load(fh)
        for gi, group in enumerate(groups):
            registry = None
            if "registry" in group:
                registry = SchemaRegistry()
                for key, schema in group["registry"].items():
                    registry.add(key, schema)
            for ti, test in enumerate(group["tests"]):
                case_id = f"{fname}/{gi}/{ti}: {group['description']}" \
                          f" — {test['description']}"
                yield case_id, group["schema"], test["data"], \
                    test["valid"], registry


def _collect(draft, default_draft):
    return list(iter_cases(draft)), default_draft


@pytest.mark.parametrize("draft,default_draft",
                         [("draft3", E.DRAFT3), ("draft4", E.DRAFT4)])
def test_conformance(draft, default_draft):
    cases, default = _collect(draft, default_draft)
    assert cases, f"no fixtures found for {draft}"
    failures = []
    for case_id, schema, data, expected_valid, registry in cases:
        violations = validate_value(schema, data, registry=registry,
                                    default_draft=default)
        got_valid = not violations
        if got_valid != expected_valid:
            failures.append((case_id, expected_valid,
                             [v.as_dict() for v in violations][:3]))
    assert not failures, (
        f"{len(failures)}/{len(cases)} {draft} conformance failures:\n"
        + "\n".join(repr(f) for f in failures[:25]))


def test_pass_rate_is_total():
    """Headline metric: 100% pass rate over the vendored corpus."""
    total = 0
    for draft, default in (("draft3", E.DRAFT3), ("draft4", E.DRAFT4)):
        for case_id, schema, data, expected_valid, registry in iter_cases(draft):
            total += 1
            ok = not validate_value(schema, data, registry=registry,
                                    default_draft=default)
            assert ok == expected_valid, case_id
    assert total >= 350
