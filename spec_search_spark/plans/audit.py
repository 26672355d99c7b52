"""Physical-plan audit: machine-checks that the plans Catalyst picks
are the plans the scale design calls for (predicate pushdown reaching
parquet, dimension joins going broadcast, top-k avoiding global sorts,
aggregates running partial+final).

Run: ``python -m spec_search_spark.plans.audit [sf_dir]`` → one line
per check + exit status; tests/test_plans.py asserts the same
invariants so plan regressions fail CI.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession


def plan_of(df: DataFrame) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


# (query name, [required plan fragments], [forbidden plan fragments])
CHECKS: list[tuple[str, list[str], list[str]]] = [
    # q6: every predicate must reach the parquet scan
    ("q6_forecast_revenue", ["PushedFilters: [IsNotNull(l_shipdate)"], ["CartesianProduct"]),
    # q1: pre-shuffle partial aggregation (partial_ prefix in agg node)
    ("q1_pricing_summary", ["partial_sum", "HashAggregate"], ["SortAggregate"]),
    # q3: dimension join broadcasts; fact join keeps hash strategy
    ("q3_shipping_priority", ["BroadcastHashJoin"], ["CartesianProduct"]),
    # top-k: TakeOrderedAndProject, not a global Sort + Limit
    ("topk_orders", ["TakeOrderedAndProject"], ["Exchange rangepartitioning"]),
    # semi/anti joins stay semi/anti (no row-multiplying rewrite)
    ("join_semi", ["LeftSemi"], []),
    ("join_anti", ["LeftAnti"], []),
    # broadcast hint honored on the part dimension
    ("join_broadcast_agg", ["BroadcastHashJoin"], ["SortMergeJoin"]),
    # scans project only needed columns: q6 reads 4 cols, never l_comment-ish width
    ("q6_forecast_revenue", ["ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate"], []),
    # window top-k: single shuffle on the partition key
    ("window_topk_per_customer", ["Window", "hashpartitioning(o_custkey"], []),
    # knn: probe side broadcast — embedding table never shuffles
    ("knn_exact", ["BroadcastNestedLoopJoin"], ["Exchange hashpartitioning(vec_id"]),
    # as-of: union + window composition, never a range/cross join
    ("asof_join_purchase", ["Window"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
    # sessionize: single partitioning chain on user_id
    ("sessionize", ["hashpartitioning(user_id"], ["CartesianProduct"]),
    # events hourly rollup aggregates partially before the shuffle
    ("hourly_event_rollup", ["partial_count"], []),
    # correlated subquery is decorrelated to an aggregate+join
    ("sql_correlated_subquery", ["HashAggregate"], ["CartesianProduct"]),
    # range-band join keeps the equi conjunct as the hash key
    ("join_range_band", ["BroadcastHashJoin"], ["CartesianProduct", "BroadcastNestedLoopJoin"]),
]


def audit(spark: SparkSession, sf_dir: str) -> list[tuple[str, str, bool]]:
    import __spark_entry__ as e

    qs = e.queries()
    results: list[tuple[str, str, bool]] = []
    for name, required, forbidden in CHECKS:
        plan = plan_of(qs[name](spark, sf_dir))
        for frag in required:
            results.append((name, f"requires `{frag}`", frag in plan))
        for frag in forbidden:
            results.append((name, f"forbids `{frag}`", frag not in plan))
    return results


def main() -> int:
    sys.path.insert(0, "/root/repo")
    from spec_search_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("plan-audit")
    results = audit(spark, sf_dir)
    failed = 0
    for name, check, ok in results:
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {check}")
        failed += 0 if ok else 1
    print(f"\n{failed} plan-audit failures / {len(results)} checks")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
