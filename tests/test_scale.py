"""Scale-technique tests: bucketed joins run exchange-free, salted
aggregation matches plain aggregation."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.scale import salted_agg, write_bucketed
from experiment_flink_cdc_connectors_postgres_datastream_spark.plans import formatted_plan


def test_bucketed_join_has_no_exchange(spark):
    a = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 2).alias("va"))
    b = spark.range(1000).select(F.col("id").alias("k"), (F.col("id") * 3).alias("vb"))
    write_bucketed(a, "bk_a", ["k"], num_buckets=8)
    write_bucketed(b, "bk_b", ["k"], num_buckets=8)
    # disable broadcast so the join planner must pick SMJ — at real
    # fact-×-fact scale neither side broadcasts; bucketing is what
    # removes the shuffle there
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bk_a").join(spark.table("bk_b"), "k")
        plan = formatted_plan(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_groupby_has_no_exchange(spark):
    a = spark.range(1000).select((F.col("id") % 10).alias("k"), F.col("id").alias("v"))
    write_bucketed(a, "bk_g", ["k"], num_buckets=8)
    agg = spark.table("bk_g").groupBy("k").agg(F.sum("v").alias("s"))
    assert "Exchange" not in formatted_plan(agg)
    assert agg.count() == 10


def test_salted_agg_matches_plain(spark):
    # heavy skew: 90% of rows share one key
    df = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, F.lit("hot")).otherwise(F.lit("cold")).alias("k"),
        F.col("id").alias("v"),
    )
    plain = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"), F.min("v").alias("mn"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"], r["mn"], r["mx"])
        for r in salted_agg(
            df, ["k"], {"s": ("v", "sum"), "c": ("v", "count"), "mn": ("v", "min"), "mx": ("v", "max")}
        ).collect()
    }
    assert salted == plain


def test_partitioned_write_prunes_directories(spark, tmp_path):
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.scale import (
        read_partition_pruned,
        write_partitioned,
    )

    ev = spark.range(2000).select(
        (F.col("id") % 12 + 1).alias("month"),
        F.col("id").alias("v"),
    )
    path = str(tmp_path / "part_ev")
    write_partitioned(ev, path, ["month"], sort_cols=["v"])
    q = read_partition_pruned(spark, path).filter(F.col("month") == 5)
    plan = formatted_plan(q)
    # the month predicate must be a directory-level partition filter,
    # not a post-scan row filter
    assert "PartitionFilters" in plan and "month" in plan.split("PartitionFilters", 1)[1][:200]
    assert q.count() == ev.filter(F.col("month") == 5).count()


def test_spread_scan_fires_only_for_under_split_file_scans(spark, tmp_path):
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.scale import spread_scan

    # single-file parquet (the compacted-extract case): spread to target
    spark.range(0, 1000).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "one"))
    narrow = spark.read.parquet(str(tmp_path / "one"))
    assert spread_scan(narrow, min_partitions=8).rdd.getNumPartitions() == 8

    # many-file scan at/above target parallelism: untouched (no-op at scale)
    spark.range(0, 1000).repartition(8).write.mode("overwrite").parquet(str(tmp_path / "many"))
    wide = spark.read.parquet(str(tmp_path / "many"))
    assert spread_scan(wide, min_partitions=4) is wide

    # non-file plans (local relations, streams) pass through untouched —
    # the probe must not force a plan→RDD conversion to find out
    local = spark.range(0, 100).coalesce(1)
    assert spread_scan(local, min_partitions=8) is local


def test_salted_join_value_neutral(spark):
    """salted_join must be a drop-in for an inner equi-join: same
    multiset of output rows for skewed data, null join keys dropped
    on both paths (SQL equi-join semantics)."""
    import pyspark.sql.functions as F

    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.scale import salted_join

    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", 1), (None, 9)],
        "k string, v long",
    )
    small = spark.createDataFrame(
        [("hot", 10), ("cold", 20), (None, 30)], "k string, w long"
    )
    plain = big.join(small, ["k"]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    salted = salted_join(big, small, ["k"], salt=4).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.col("v") + F.col("w")).alias("s")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_default_salt_handles_dotted_names_and_map_columns(spark):
    """The deterministic default salt must backtick-quote column names
    (a literal dot must not parse as struct access) and skip map
    columns (xxhash64 rejects MapType) instead of throwing."""
    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.scale import salted_agg

    df = (
        spark.range(20)
        .selectExpr(
            "id % 3 AS k",
            "CAST(id AS DOUBLE) AS `v.alue`",
            "map('a', id) AS m",
        )
    )
    out = {
        r["k"]: r["n"]
        for r in salted_agg(df, ["k"], {"n": ("k", "count")}, salt=4).collect()
    }
    assert out == {0: 7, 1: 7, 2: 6}


def test_default_salt_refuses_key_only_frame(spark):
    """ADVICE r7 guard: when every hashable column is part of the key,
    the deterministic default salt is a pure function of the key —
    constant within each hot key, spreading nothing — so salted_agg /
    salted_join must refuse loudly instead of silently reinstating the
    monster task; an explicit salt_col lifts the refusal."""
    import pytest as _pytest

    from experiment_flink_cdc_connectors_postgres_datastream_spark.operators.scale import salted_agg, salted_join

    df = spark.createDataFrame([("a",), ("a",), ("b",)], "k string")
    with _pytest.raises(ValueError, match="CONSTANT within each key"):
        salted_agg(df, ["k"], {"n": ("k", "count")})
    dim = spark.createDataFrame([("a", 1), ("b", 2)], "k string, v int")
    with _pytest.raises(ValueError, match="CONSTANT within each key"):
        salted_join(df, dim, ["k"])

    # explicit salt_col: runs, and results are exact
    got = {
        r["k"]: r["n"]
        for r in salted_agg(
            df.withColumn("_rid", F.monotonically_increasing_id()),
            ["k"],
            {"n": ("k", "count")},
            salt_col=F.col("_rid"),
        ).collect()
    }
    assert got == {"a": 2, "b": 1}
