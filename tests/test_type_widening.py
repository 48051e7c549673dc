"""Type widening on the versioned stage table — Delta's typeWidening
feature: lossless column-type widening as a zero-IO metadata commit;
narrow files read up under the wider schema, narrow batches stay
appendable, values preserved exactly."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cdk_datalake_ingest_upeu_spark.operators.versioned import (
    VersionedStageTable,
    _widens,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


@pytest.fixture()
def table(spark, tmp_path):
    return VersionedStageTable(spark, str(tmp_path / "vt"))


def test_widens_matrix():
    i, l, f, d = (
        T.IntegerType(), T.LongType(), T.FloatType(), T.DoubleType()
    )
    assert _widens(i, l) and _widens(T.ByteType(), i)
    assert _widens(f, d) and _widens(i, d)
    assert _widens(i, T.DecimalType(10, 0))
    assert _widens(l, T.DecimalType(20, 0))
    # NOT widenings: narrowing, long->double (inexact past 2^53),
    # insufficient decimal digits, unrelated types
    assert not _widens(l, i)
    assert not _widens(l, d)
    assert not _widens(i, T.DecimalType(9, 0))
    assert not _widens(d, f)
    assert not _widens(T.StringType(), l)
    assert not _widens(i, i)


def test_widen_column_zero_io_and_time_travel(spark, table):
    table.overwrite(
        spark.createDataFrame([(1, 10), (2, 20)], "k int, x int")
        .coalesce(1)
    )
    files0 = table._manifest(0)["files"]
    v = table.widen_column("x", "bigint")
    m = table._manifest(v)
    assert m["files"] == files0  # zero IO
    assert table.history()[-1]["op"] == "widen_column"
    assert dict(table.read().dtypes)["x"] == "bigint"
    assert _rows(table.read()) == [(1, 10), (2, 20)]
    # old version reads under its own (narrow) type
    assert dict(table.read(0).dtypes)["x"] == "int"
    proto = table.protocol()
    assert "type-widening" in proto["reader"]
    assert "type-widening" in proto["writer"]
    # widening to the same type is a no-op; narrowing raises
    assert table.widen_column("x", "bigint") == v
    with pytest.raises(ValueError, match="not a supported"):
        table.widen_column("x", "int")
    with pytest.raises(ValueError, match="no column"):
        table.widen_column("nope", "bigint")


def test_narrow_and_wide_batches_after_widen(spark, table):
    table.overwrite(
        spark.createDataFrame([(1, 10)], "k int, x int").coalesce(1)
    )
    table.widen_column("x", "bigint")
    # wide batch lands as-is
    table.append(spark.createDataFrame([(2, 2**40)], "k int, x bigint"))
    # NARROW batch still appendable forever: reads widen it
    table.append(spark.createDataFrame([(3, 30)], "k int, x int"))
    assert dict(table.read().dtypes)["x"] == "bigint"
    assert _rows(table.read()) == [(1, 10), (2, 2**40), (3, 30)]
    # stats pruning stays sound across narrow and wide file bounds
    assert table.lookup("x > 1000000").count() == 1
    assert table.lookup("x <= 30").count() == 2


def test_merge_schema_append_auto_widens(spark, table):
    table.overwrite(
        spark.createDataFrame([(1, 1.5)], "k int, x float").coalesce(1)
    )
    # wider batch without merge_schema raises with the widen hint
    with pytest.raises(ValueError, match="widen_column"):
        table.append(spark.createDataFrame([(2, 2.5)], "k int, x double"))
    table.append(
        spark.createDataFrame([(2, 2.5)], "k int, x double"),
        merge_schema=True,
    )
    assert dict(table.read().dtypes)["x"] == "double"
    assert _rows(table.read()) == [(1, 1.5), (2, 2.5)]
    assert "type-widening" in table.protocol()["reader"]


def test_narrow_batch_into_wide_table_declares_feature(spark, table):
    # a table CREATED wide accepting a narrow batch now holds narrow
    # files under a wider schema — the commit must gate readers
    table.overwrite(
        spark.createDataFrame([(1, 2**40)], "k int, x bigint").coalesce(1)
    )
    assert table.protocol() == {}
    table.append(spark.createDataFrame([(2, 20)], "k int, x int"))
    assert "type-widening" in table.protocol()["reader"]
    assert _rows(table.read()) == [(1, 2**40), (2, 20)]


def test_merge_casts_narrower_source_up(spark, table):
    table.overwrite(
        spark.createDataFrame(
            [(1, 10), (2, 20)], "k int, x int"
        ).coalesce(1)
    )
    table.widen_column("x", "bigint")
    table.merge(
        spark.createDataFrame([(2, 99), (3, 30)], "k int, x int"), ["k"]
    )
    assert dict(table.read().dtypes)["x"] == "bigint"
    assert _rows(table.read()) == [(1, 10), (2, 99), (3, 30)]
    # a non-widening mismatch still raises
    with pytest.raises(ValueError, match="does not evolve schema"):
        table.merge(
            spark.createDataFrame([(4, "s")], "k int, x string"), ["k"]
        )


def test_widen_survives_checkpoint_and_composes_with_rename(
    spark, tmp_path
):
    t = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    t.overwrite(
        spark.createDataFrame([(1, 10)], "k int, x int").coalesce(1)
    )
    t.rename_column("x", "amount")
    t.widen_column("amount", "bigint")
    t.append(
        spark.createDataFrame([(2, 2**40)], "k int, amount bigint")
    )  # v3 -> checkpoint
    assert t.checkpoints() == [3]
    fresh = VersionedStageTable(
        spark, str(tmp_path / "vt"), checkpoint_interval=3
    )
    assert dict(fresh.read().dtypes)["amount"] == "bigint"
    assert _rows(fresh.read()) == [(1, 10), (2, 2**40)]
    # the physical name survived both ops: files still carry 'x'
    import pyarrow.parquet as pq

    for rel in fresh._manifest(3)["files"]:
        assert "x" in pq.read_schema(fresh._abs(rel)).names
    # delete through mixed narrow/wide files under the mapped name
    fresh.delete("amount > 1000000")
    assert _rows(fresh.read()) == [(1, 10)]
    # CHECK constraints keep binding across the widening
    fresh.add_constraint("amt_pos", "amount > 0")
    with pytest.raises(Exception, match="amt_pos"):
        fresh.append(
            spark.createDataFrame([(3, -5)], "k int, amount int")
        )
