"""KVC path/aggregate parity — goldens modeled on the reference's
jesse_json_path_tests.erl:8-61."""

from __future__ import annotations

import pytest

from sparkjesse import kvc


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame(
        [("d1",
          {"name": "alice", "score": 10},
          [{"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "c", "v": 3}],
          [[1, 2], [2, 3]])],
        "doc_id string, "
        "obj struct<name:string, score:int>, "
        "items array<struct<k:string, v:int>>, "
        "nested array<array<int>>")


def one(df_, p):
    return df_.select(kvc.path(df_, p).alias("x")).collect()[0]["x"]


def test_struct_path(df):
    assert one(df, "obj.name") == "alice"
    assert one(df, "obj.score") == 10


def test_array_fanout(df):
    assert one(df, "items.k") == ["a", "b", "c"]
    assert one(df, "items.v") == [1, 2, 3]


def test_aggregates(df):
    assert one(df, "items.v.@max") == 3
    assert one(df, "items.v.@min") == 1
    assert one(df, "items.v.@sum") == 6.0
    assert one(df, "items.v.@count") == 3
    assert one(df, "items.v.@avg") == 2.0


def test_union_ops(df):
    assert one(df, "nested.@unionOfArrays") == [1, 2, 2, 3]
    assert sorted(one(df, "nested.@distinctUnionOfArrays")) == [1, 2, 3]
    assert one(df, "items.k.@distinctUnionOfObjects") == ["a", "b", "c"]


def test_errors(df):
    with pytest.raises(kvc.KvcPathError):
        kvc.path(df, "obj.bogus")
    with pytest.raises(kvc.KvcPathError):
        kvc.path(df, "doc_id.@max")
    with pytest.raises(kvc.KvcPathError):
        kvc.path(df, "items.v.@median")
