"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop write (full plan executes,
nothing collected to the driver). A warmup query amortizes JVM/codegen
startup so the numbers reflect steady-state throughput.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from spec_search_spark.session import get_spark  # noqa: E402

HEADLINE = [
    # relational core
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_local_supplier",
    "q7_nation_volume",
    "q10_returned_items",
    "join_broadcast_agg",
    "salted_join_revenue",
    "agg_cube",
    # windows / events
    "window_topk_per_customer",
    "window_range_10min",
    "sessionize",
    "hourly_event_rollup",
    "asof_join_purchase",
    # reference pipeline + text/dedup/vector
    "cell_grid_unpivot",
    "chunk_fixed",
    "token_stats",
    "doc_fingerprints",
    "ngram_jaccard_pairs",
    "jaccard_strict_pairs",
    "minhash_lsh_candidates",
    "simhash_near_pairs",
    "knn_multi_probe",
    "ann_lsh_bucketed",
    "ivf_ann_search",
    "multimodal_decode",
    "vector_index_build",
    "semantic_search",
    # training-pipeline pack (round 3)
    "decontaminate",
    "repetition_filters",
    "tfidf_top_terms",
    "token_pack_blocks",
    "ann_int8_rerank",
    # round-3 additions: co-located join, graph, fuzzy, resample,
    # sharding, triplet mining
    "bucketed_join_revenue",
    "graph_triangles",
    "fuzzy_name_pairs",
    "gap_fill_hourly",
    "balanced_shards",
    "triplet_mining",
    "stats_moments",
    "recursive_reachability",
    "hybrid_search_rrf",
    "filtered_ann_search",
    "semantic_search_reranked",
    "corpus_diff",
    "stratified_quality_sample",
    "equi_depth_histogram",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from spec_search_spark.operators import all_queries

    qs, _ = all_queries()
    spark = get_spark("bench")

    # warmup: exercise each engine path once (parquet scan + shuffle
    # agg; python-worker pool + Arrow; vector-distance expression
    # family) so timings measure steady-state throughput, not one-time
    # JVM/codegen/worker-pool initialization.
    qs["q1_pricing_summary"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs["knn_exact"](spark, sf_dir).write.format("noop").mode("overwrite").save()
    qs["token_stats"](spark, sf_dir).write.format("noop").mode("overwrite").save()

    def run(name: str) -> float:
        t0 = time.time()
        qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # min of 3 runs: the VM shows ~3x wall-clock jitter between
    # identical executions; the minimum is the stable throughput signal.
    timings = {name: round(min(run(name) for _ in range(3)), 3) for name in HEADLINE}

    # Machine calibration: a fixed shuffle-agg microbench (1M rows,
    # groupBy 1000 keys) so per-round numbers can be normalized across
    # host VMs of different speed. Recorded, never added to `value`.
    def _calib() -> float:
        df = spark.range(1_000_000).selectExpr("id % 1000 as k", "id")
        t0 = time.time()
        df.groupBy("k").count().write.format("noop").mode("overwrite").save()
        return time.time() - t0

    _calib()  # warm
    calib = round(min(_calib() for _ in range(3)), 3)

    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    out = {
        "metric": "headline_suite_total_steady_state",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": sf_val,
        "calibration_shuffle_agg_1m_sec": calib,
    }
    prev_name, prev = _previous_round()
    if prev is not None and prev.get("sf") == sf_val:
        prev_q = prev.get("queries", {})
        out["prev"] = prev_name
        out["prev_value"] = prev.get("value")
        out["deltas"] = {
            name: round(t - prev_q[name], 3)
            for name, t in timings.items()
            if name in prev_q
        }
    print(json.dumps(out))


def _previous_round():
    """Latest driver-recorded BENCH_r{N}.json next to this script — the
    regression ledger baseline. Returns (name, parsed) or (None, None)."""
    import re

    here = os.path.dirname(os.path.abspath(__file__))
    rounds = []
    for f in os.listdir(here):
        m = re.fullmatch(r"BENCH_r(\d+)\.json", f)
        if m:
            rounds.append((int(m.group(1)), f))
    if not rounds:
        return None, None
    _, name = max(rounds)
    try:
        with open(os.path.join(here, name)) as fh:
            data = json.load(fh)
        # the driver records {"parsed": <our line>, ...wrapper fields}
        return name, data.get("parsed", data)
    except (OSError, json.JSONDecodeError):
        return None, None


if __name__ == "__main__":
    main()
