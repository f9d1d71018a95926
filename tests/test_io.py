"""IO seam: staged overwrite, append, views, checkpoint manifest."""

import os

from dq import io as dqio


def test_overwrite_then_read_back(spark, tmp_path):
    p = str(tmp_path / "t")
    df = spark.range(10)
    df.write.parquet(p)
    # staged overwrite of a path currently being read
    reread = spark.read.parquet(p).where("id < 5")
    dqio.overwrite_table(reread, p)
    assert spark.read.parquet(p).count() == 5
    assert not os.path.exists(p + ".staging") and not os.path.exists(p + ".old")


def test_append(spark, tmp_path):
    p = str(tmp_path / "t")
    dqio.append_table(spark.range(3), p)
    dqio.append_table(spark.range(3), p)
    assert spark.read.parquet(p).count() == 6


def test_register_views(spark):
    dqio.register_views(spark, "/root/testdata/sf0.001", ["documents"])
    assert spark.sql("select count(*) c from documents").collect()[0].c == 500


def test_partition_values_and_exists(spark):
    df = spark.range(10).selectExpr("id", "cast(id % 3 as string) as p")
    vals = {r.partition_value for r in dqio.partition_values(df, "p").collect()}
    assert vals == {"0", "1", "2"}
    assert dqio.partition_exists(df, "p", "1")
    assert not dqio.partition_exists(df, "p", "9")


def test_manifest_resume(tmp_path):
    mpath = str(tmp_path / "m.json")
    m = dqio.CheckpointManifest(mpath)
    units = [("t", "a"), ("t", "b"), ("t", "c")]
    assert m.pending(units) == units
    m.mark_done("t", "b")
    m2 = dqio.CheckpointManifest(mpath)  # reload from disk
    assert m2.pending(units) == [("t", "a"), ("t", "c")]
