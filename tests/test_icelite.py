"""icelite snapshot layer — commit/read/append/time-travel round-trip."""

from __future__ import annotations

from topicalcrawler_spark import icelite


def test_commit_read_append_timetravel(spark, tmp_path):
    t = str(tmp_path / "tbl")
    df1 = spark.range(5).withColumnRenamed("id", "v")
    s1 = icelite.commit(df1, t, round_n=0)
    assert s1 == 1
    assert icelite.read_snapshot(spark, t).count() == 5

    df2 = spark.range(5, 8).withColumnRenamed("id", "v")
    s2 = icelite.commit(df2, t, round_n=1, mode="append")
    assert s2 == 2
    assert icelite.read_snapshot(spark, t).count() == 8
    # time travel to snapshot 1
    assert icelite.read_snapshot(spark, t, snapshot_id=1).count() == 5
    # replace mode discards history content for the new snapshot
    s3 = icelite.commit(df2, t, round_n=2, mode="replace")
    assert icelite.read_snapshot(spark, t, snapshot_id=s3).count() == 3
    # manifest chain intact
    h = icelite.history(t)
    assert [m["snapshot_id"] for m in h] == [1, 2, 3]
    assert h[1]["parent_id"] == 1
    assert h[1]["row_count"] == 8
