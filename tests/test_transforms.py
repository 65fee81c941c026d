from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_2_10_0_src_mapreduce_spark.operators import sets, transforms
from hadoop_2_10_0_src_mapreduce_spark.sources import readers


def test_field_spec_parse():
    assert transforms._parse_field_spec("2,4-6,8-") == [(2, 2), (4, 6), (8, None)]
    assert transforms._parse_field_spec("0") == [(0, 0)]


def test_field_select(spark):
    df = spark.createDataFrame([("a\tb\tc\td",)], ["line"])
    out = transforms.field_select(df, "line", "1,0:2-").collect()[0]
    assert out.key == "b\ta"
    assert out.value == "c\td"


def test_field_select_open_range_and_missing(spark):
    df = spark.createDataFrame([("x\ty",)], ["line"])
    out = transforms.field_select(df, "line", "0:1-").collect()[0]
    assert out.key == "x" and out.value == "y"


def test_inverse(spark):
    df = spark.createDataFrame([("k1", "v1")], ["key", "value"])
    row = transforms.inverse(df).collect()[0]
    assert (row.key, row.value) == ("v1", "k1")


def test_tokenize_and_chain(spark):
    df = spark.createDataFrame([("Hello, WORLD 42!",)], ["value"])
    tokens = [r.token for r in transforms.tokenize(df).collect()]
    assert tokens == ["hello", "world", "42"]
    pipeline = transforms.chain(
        lambda d: transforms.tokenize(d),
        lambda d: d.where(F.length("token") > 2),
    )
    assert [r.token for r in pipeline(df).collect()] == ["hello", "world"]


def test_kv_text_roundtrip(spark, tmp_path):
    p = str(tmp_path / "kv")
    spark.createDataFrame(
        [("k1\tv1\twith\ttabs",), ("lonely-key",)], ["value"]
    ).coalesce(1).write.text(p)
    rows = {r.key: r.value for r in readers.read_kv_text(spark, p).collect()}
    assert rows["k1"] == "v1\twith\ttabs"  # split on FIRST separator only
    assert rows["lonely-key"] == ""


def test_multiple_inputs(spark):
    a = spark.createDataFrame([(1, "a")], ["id", "src"])
    b = spark.createDataFrame([("b", 2)], ["src", "id"])  # different column order
    out = readers.read_multiple_inputs([(a, None), (b, None)])
    assert {(r.id, r.src) for r in out.collect()} == {(1, "a"), (2, "b")}


def test_sets(spark):
    a = spark.createDataFrame([(1,), (2,), (2,), (3,)], ["x"])
    b = spark.createDataFrame([(2,), (4,)], ["x"])
    assert {r.x for r in sets.union_distinct(a, b).collect()} == {1, 2, 3, 4}
    assert {r.x for r in sets.intersect(a, b).collect()} == {2}
    assert {r.x for r in sets.except_(a, b).collect()} == {1, 3}
    assert sets.union_all(a, b).count() == 6
    assert sets.distinct(a, "x").count() == 3
