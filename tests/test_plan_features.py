"""Engine-feature tests: runtime Bloom-filter join pruning and parquet
schema evolution — scale levers that have no per-query oracle row but
must demonstrably engage on this engine."""

from __future__ import annotations

import json
import os
import tempfile

from pyspark.sql import functions as F


def test_runtime_bloom_filter_injected(spark, sf_dir):
    """Spark's runtime semi-join reduction: a selective filter on the
    orders side injects a bloom_filter_agg → might_contain pre-filter
    on the lineitem scan side of the shuffle join. At 100 TB this is
    the difference between shuffling the full fact table and shuffling
    only rows that can possibly match; here we force the shuffle-join
    path (broadcast off) and drop the 10 GB application-side floor so
    injection triggers at test scale, then check the rewritten plan
    AND that results are unchanged."""
    from spec_search_spark.catalog import load_table
    from spec_search_spark.plans.audit import plan_of

    conf = spark.conf
    saved = {
        k: conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.optimizer.runtime.bloomFilter.enabled",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
        )
    }

    def build():
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        orders = load_table(spark, sf_dir, "orders").filter(
            F.col("o_orderstatus") == "P"
        )
        return li.join(orders, F.col("l_orderkey") == F.col("o_orderkey")).agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("l_extendedprice"), 2).alias("rev"),
        )

    try:
        conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
        conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        plan = plan_of(build())
        assert "bloom_filter_agg" in plan or "might_contain" in plan, plan
        with_bloom = build().first()
        conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "false")
        without = build().first()
        assert with_bloom == without
    finally:
        for k, v in saved.items():
            if v is None:
                conf.unset(k)
            else:
                conf.set(k, v)


def test_parquet_schema_merge_evolution(spark):
    """Schema evolution on read: a column added by a later writer is
    union-merged (mergeSchema) and back-filled with nulls for old
    files — the append-only evolution contract a long-lived 100 TB
    table relies on."""
    d = tempfile.mkdtemp(prefix="evo_")
    spark.createDataFrame([(1, "a")], "id bigint, a string").write.parquet(
        os.path.join(d, "p=1")
    )
    spark.createDataFrame(
        [(2, "b", 9.5)], "id bigint, a string, score double"
    ).write.parquet(os.path.join(d, "p=2"))
    df = spark.read.option("mergeSchema", "true").parquet(d)
    assert set(df.columns) >= {"id", "a", "score"}
    rows = {r.id: r for r in df.collect()}
    assert rows[1].score is None and rows[2].score == 9.5
    # pushdown still reaches the merged scan
    from spec_search_spark.plans.audit import plan_of

    plan = plan_of(df.filter(F.col("id") > 1).select("id", "score"))
    assert "PushedFilters: [IsNotNull(id), GreaterThan(id,1)]" in plan
