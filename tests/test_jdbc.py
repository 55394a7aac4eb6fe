"""Live JDBC integration: exercise JdbcConnector's read / write /
pushdown / count / truncate / copy paths against embedded Apache Derby
— a real JDBC database whose driver ships inside Spark's own jars, so
the exact code paths used against Redshift/Postgres in production
(``spark.read.jdbc``, ``df.write.jdbc``, driver-side
``DriverManager`` statements) execute for real here."""

import pytest
from pyspark.sql import functions as F

from spark_etl_agent_spark.sources.jdbc import JdbcConnector

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def jdbc(spark, tmp_path_factory):
    db_dir = tmp_path_factory.mktemp("derby")
    # keep derby.log inside the tmp dir, not the repo root
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(db_dir))
    url = f"jdbc:derby:{db_dir}/testdb;create=true"
    return JdbcConnector(spark, url, user="app", password="", driver=DERBY_DRIVER)


def test_jdbc_end_to_end(spark, jdbc):
    src = spark.createDataFrame(
        [(1, "a", 10.5), (2, "b", 20.0), (3, "c", 30.25)],
        "id int, name string, amount double",
    )

    # write (overwrite creates the table through the Derby dialect)
    jdbc.write_table(src, "accounts", mode="overwrite", num_partitions=2)

    # read back through spark.read.jdbc
    got = {(r.id, r.name, r.amount) for r in jdbc.read_table("accounts").collect()}
    assert got == {(1, "a", 10.5), (2, "b", 20.0), (3, "c", 30.25)}

    # SQL pushdown via the (query) AS spark_query derived-table trick
    # (Spark's JDBC writer creates quoted lowercase columns, so raw SQL
    # against the created table must quote them)
    agg = jdbc.execute_sql(
        'SELECT COUNT(*) AS n, SUM("amount") AS total FROM accounts'
    ).collect()[0]
    assert agg[0] == 3 and agg[1] == pytest.approx(60.75)

    # count helper
    assert jdbc.get_table_count("accounts") == 3

    # copy: append source rows into a new table, returns source count
    jdbc.write_table(src.limit(0), "accounts_bak", mode="overwrite")
    assert jdbc.copy_table_data("accounts", "accounts_bak") == 3
    assert jdbc.get_table_count("accounts_bak") == 3

    # truncate issues a real TRUNCATE TABLE: rows gone, DDL intact
    jdbc.truncate_table("accounts")
    assert jdbc.get_table_count("accounts") == 0
    jdbc.write_table(src.filter(F.col("id") == 1), "accounts", mode="append")
    assert jdbc.get_table_count("accounts") == 1


def test_jdbc_read_limit_pushdown(spark, jdbc):
    src = spark.range(100).select(
        F.col("id").cast("int").alias("id"), F.lit("x").alias("v")
    )
    jdbc.write_table(src, "wide", mode="overwrite")
    assert jdbc.read_table("wide", limit=7).count() == 7


def test_jdbc_partitioned_read_parallel_and_complete(spark, jdbc):
    src = spark.range(1, 101).select(
        F.col("id").cast("int").alias("id"),
        (F.col("id") * 2).cast("double").alias("val"),
    )
    jdbc.write_table(src, "part_read", mode="overwrite")

    df = jdbc.read_table_partitioned("part_read", '"id"', num_partitions=4)
    # genuinely partitioned: the scan side carries 4 JDBC partitions
    assert df.rdd.getNumPartitions() == 4
    # and no rows are lost or duplicated at stride boundaries
    assert df.count() == 100
    assert {r[0] for r in df.select("id").collect()} == set(range(1, 101))


def test_jdbc_partitioned_read_empty_table_falls_back(spark, jdbc):
    src = spark.range(0).select(F.col("id").cast("int").alias("id"))
    jdbc.write_table(src, "part_empty", mode="overwrite")
    df = jdbc.read_table_partitioned("part_empty", '"id"', num_partitions=4)
    assert df.count() == 0
