"""Violation-row parity with the reference's golden error tuples
(`/root/reference/test/jesse_schema_validator_tests.erl:23-191`).

jesse's error tuple {data_invalid, Schema, Type, Value, Path} maps to our
violation row (error_kind, error_type, path, schema_ptr, value_json, detail);
the Erlang path list renders as a JSON pointer ("/foo/subfoo", 0-based array
indices). Comparison is order-insensitive (jesse emits LIFO order,
/root/reference/README.md:153-163).
"""

from __future__ import annotations

from sparkjesse import errors as E
from sparkjesse.pyvalidator import validate_value


def keys(violations):
    return sorted((v.error_type, v.path, v.detail) for v in violations)


INT = {"type": "integer"}


def test_no_errors():
    assert validate_value(INT, 42) == []


SCHEMA = {
    "type": "object",
    "properties": {
        "foo": {"type": "object", "properties": {"subfoo": INT}},
    },
    "patternProperties": {"^b": INT},
}


def test_root_level_error():
    v = validate_value(SCHEMA, "foo")
    assert keys(v) == [("wrong_type", "", "")]
    assert v[0].error_kind == E.DATA_INVALID


def test_properties_two_levels():
    v = validate_value(SCHEMA, {"foo": {"subfoo": "bar"}})
    assert keys(v) == [("wrong_type", "/foo/subfoo", "")]


def test_pattern_properties_level1():
    v = validate_value(SCHEMA, {"bar": "baz"})
    assert keys(v) == [("wrong_type", "/bar", "")]


SCHEMA2 = {
    "type": "object",
    "properties": {"foo": INT},
    "additionalProperties": False,
}


def test_additional_properties_level1():
    v = validate_value(SCHEMA2, {"foo": 0, "bar": "baz"})
    assert keys(v) == [("no_extra_properties_allowed", "/bar", "bar")]


SCHEMA3 = {
    "type": "object",
    "properties": {
        "foo": {
            "type": "object",
            "properties": {"subfoo": INT},
            "additionalProperties": False,
        },
    },
    "additionalProperties": False,
}


def test_additional_properties_level2():
    v = validate_value(SCHEMA3, {"foo": {"subfoo": 1, "bar": 2}})
    assert keys(v) == [("no_extra_properties_allowed", "/foo/bar", "bar")]


ITEMS_SCHEMA = {"type": "array", "items": INT, "maxItems": 3}


def test_items_zero_based_index():
    v = validate_value(ITEMS_SCHEMA, [2, "baz", 3])
    assert keys(v) == [("wrong_type", "/1", "")]


def test_items_wrong_size():
    v = validate_value(ITEMS_SCHEMA, [2, 3, 4, 5])
    assert keys(v) == [("wrong_size", "", "")]
    assert v[0].value_json == "[2,3,4,5]"


ITEMS_SCHEMA2 = {
    "type": "array",
    "items": [INT, INT, INT],
    "additionalItems": False,
}


def test_tuple_items_index():
    v = validate_value(ITEMS_SCHEMA2, [2, 3, "baz"])
    assert keys(v) == [("wrong_type", "/2", "")]


def test_tuple_items_no_extra():
    v = validate_value(ITEMS_SCHEMA2, [2, 3, 4, 5])
    assert keys(v) == [("no_extra_items_allowed", "", "")]


def test_tuple_items_not_enought():
    v = validate_value(ITEMS_SCHEMA2, [2])
    assert keys(v) == [("not_enought_items", "", "")]


DEPENDENCIES_SCHEMA = {
    "type": "object",
    "dependencies": {"bar": ["foo"]},
}


def test_missing_dependency():
    v = validate_value(DEPENDENCIES_SCHEMA, {"bar": 42})
    assert keys(v) == [("missing_dependency", "", "foo")]


def test_dots_used_in_keys():
    schema = {
        "type": "object",
        "properties": {"3.4.5.6.7": {"type": "string"}},
    }
    assert validate_value(schema, {"3.4.5.6.7": "Hello world!"}) == []
    v = validate_value(schema, {"3.4.5.6.7": True})
    assert keys(v) == [("wrong_type", "/3.4.5.6.7", "")]


def test_missing_required_property_detail():
    schema = {"type": "object",
              "properties": {"foo": {"type": "string", "required": True}}}
    v = validate_value(schema, {})
    assert keys(v) == [("missing_required_property", "", "foo")]


def test_schema_unsupported():
    ok = {"$schema": "http://json-schema.org/draft-03/schema#"}
    assert validate_value(ok, {"x": 1}) == []
    bad = {"$schema": "http://json-schema.org/draft-07/schema#"}
    v = validate_value(bad, {"x": 1})
    assert len(v) == 1
    assert v[0].error_kind == E.SCHEMA_INVALID
    assert v[0].error_type == "schema_unsupported"


def test_draft4_supported_unlike_reference():
    """The reference rejects draft-04 (jesse_schema_validator.erl:86-87);
    our engine adds a draft-04 validator behind the same dispatch."""
    schema = {"$schema": "http://json-schema.org/draft-04/schema#",
              "type": "object", "required": ["foo"]}
    assert validate_value(schema, {"foo": 1}) == []
    v = validate_value(schema, {})
    assert keys(v) == [("missing_required_property", "", "foo")]


def test_multiple_errors_collected():
    schema = {
        "type": "object",
        "properties": {
            "a": {"type": "integer", "required": True},
            "b": {"type": "string"},
            "c": {"minimum": 10},
        },
    }
    v = validate_value(schema, {"b": 1, "c": 5})
    assert keys(v) == [
        ("missing_required_property", "", "a"),
        ("not_in_range", "/c", ""),
        ("wrong_type", "/b", ""),
    ]


def test_max_errors_budget():
    schema = {"items": {"type": "integer"}}
    v = validate_value(schema, ["a", "b", "c"], max_errors=2)
    assert len(v) == 2


def test_json_pointer_escaping():
    schema = {"type": "object",
              "properties": {"a/b": {"type": "integer"},
                             "m~n": {"type": "integer"}}}
    v = validate_value(schema, {"a/b": "x", "m~n": "y"})
    assert keys(v) == [("wrong_type", "/a~1b", ""),
                       ("wrong_type", "/m~0n", "")]


def test_schema_ptr_points_at_fragment():
    v = validate_value(SCHEMA, {"foo": {"subfoo": "bar"}})
    assert v[0].schema_ptr == "/properties/foo/properties/subfoo/type"
