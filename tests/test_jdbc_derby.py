"""JDBC source end-to-end against embedded Derby (the jar ships inside
Spark's own jars dir) — covers the reference's main entry point, a real
SQL-database extract (pipeline_management.py:652,818): cursor-predicate
pushdown into the remote query plus range partitioning over the cursor."""

from __future__ import annotations

import pytest

from patuha_etl_dlt_spark.sources.jdbc import JdbcSourceConfig, read_jdbc

DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    db = tmp_path_factory.mktemp("derby") / "db"
    url = f"jdbc:derby:{db};create=true"
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DRIVER)
    conn = jvm.java.sql.DriverManager.getConnection(url)
    st = conn.createStatement()
    st.executeUpdate("CREATE TABLE pages (seq BIGINT PRIMARY KEY, url VARCHAR(64), body VARCHAR(256))")
    for i in range(200):
        st.executeUpdate(f"INSERT INTO pages VALUES ({i}, 'https://ex.com/{i}', 'body {i}')")
    st.close()
    conn.close()
    return f"jdbc:derby:{db}"


def test_jdbc_full_and_incremental_read(spark, derby_url):
    full = read_jdbc(spark, JdbcSourceConfig(url=derby_url, table="pages", driver=DRIVER))
    assert full.count() == 200

    # incremental: numeric cursor pushed into the remote query, unquoted
    cfg = JdbcSourceConfig(
        url=derby_url, table="pages", cursor_col="seq", last_value=149, driver=DRIVER
    )
    assert "WHERE seq > 149" in cfg.dbtable()
    inc = read_jdbc(spark, cfg)
    rows = inc.collect()
    assert len(rows) == 50 and min(r["SEQ"] for r in rows) == 150


def test_jdbc_range_partitioned_parallel_pull(spark, derby_url):
    cfg = JdbcSourceConfig(
        url=derby_url, table="pages", cursor_col="seq", last_value=99,
        partition_col="seq", lower_bound="100", upper_bound="200",
        num_partitions=4, driver=DRIVER,
    )
    df = read_jdbc(spark, cfg)
    # N executors each pull a slice (vs the reference's single-connection
    # serial extract) — the scan parallelism IS the partition count
    assert df.rdd.getNumPartitions() == 4
    assert df.count() == 100

    # pushdown composes: Spark folds its own filters into the remote query
    filtered = df.filter("seq >= 180").selectExpr("count(*) AS N").collect()
    assert filtered[0]["N"] == 20


def test_jdbc_string_cursor_quoting(spark, derby_url):
    cfg = JdbcSourceConfig(
        url=derby_url, table="pages", cursor_col="url",
        last_value="https://ex.com/5", driver=DRIVER,
    )
    # string cursor: quoted, and Derby accepts the generated subquery
    df = read_jdbc(spark, cfg)
    assert df.count() == df.filter("url > 'https://ex.com/5'").count()
