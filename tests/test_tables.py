"""TableIO seam: write/read/exists/drop round-trips; iceberg cleanly
gated when the runtime jar is absent."""

import pytest

from eaststorm_searchengine_spark.sources.tables import TableIO, iceberg_available

TMP = "/root/repo/_tmp/t_tables"


def test_parquet_roundtrip(spark):
    io = TableIO(spark, TMP)
    df = spark.range(100).withColumnRenamed("id", "v")
    io.write(df, "t1")
    assert io.exists("t1")
    assert io.read("t1").count() == 100
    io.write(df.withColumn("p", df["v"] % 4), "t2", partition_by=["p"])
    assert io.read("t2").filter("p = 1").count() == 25
    io.drop("t1")
    assert not io.exists("t1")


def test_iceberg_gated(spark):
    if iceberg_available(spark):
        pytest.skip("iceberg present; gate not applicable")
    with pytest.raises(RuntimeError, match="iceberg runtime jar"):
        TableIO(spark, "cat.db", format="iceberg")
