"""Invariant tests for the round-4 continuation analytics ops (value
parity vs DuckDB is covered by tools/selfcheck.py — these pin the
structural claims)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table


def test_funnel_stages_are_monotone(spark, sf_dir):
    from spec_search_spark.operators.windows import funnel_conversion

    rows = {r["stage"]: r for r in funnel_conversion(spark, sf_dir).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_users"] >= rows[2]["n_users"] >= rows[3]["n_users"]
    assert rows[1]["pct_of_entry"] == 1.0
    for r in rows.values():
        assert 0.0 <= r["pct_of_entry"] <= 1.0


def test_retention_day0_equals_cohort_size(spark, sf_dir):
    from spec_search_spark.operators.windows import retention_cohorts

    df = retention_cohorts(spark, sf_dir)
    # day 0 count per cohort == number of users first seen that day
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("d")
    )
    cohorts = (
        ev.groupBy("user_id")
        .agg(F.min("d").alias("cohort"))
        .groupBy(F.date_format("cohort", "yyyy-MM-dd").alias("cohort"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )
    day0 = df.filter(F.col("day_offset") == 0).select("cohort", "n_active")
    diff = day0.join(cohorts, "cohort").filter(
        F.col("n_active") != F.col("n_users")
    )
    assert diff.count() == 0


def test_copurchase_pairs_ordered_and_positive(spark, sf_dir):
    from spec_search_spark.operators.affinity import copurchase_pairs

    rows = copurchase_pairs(spark, sf_dir).collect()
    assert rows
    counts = [r["n_orders"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r["p1"] < r["p2"] and r["n_orders"] >= 1 for r in rows)


def test_table_profile_bounds(spark, sf_dir):
    from spec_search_spark.operators.maintenance import table_profile

    for r in table_profile(spark, sf_dir).collect():
        assert r["ndv"] <= r["n_rows"]
        assert r["n_null"] == 0
        assert r["min_v"] <= r["avg_v"] <= r["max_v"]


def test_skew_profile_shares(spark, sf_dir):
    from spec_search_spark.operators.skew import skew_profile

    rows = skew_profile(spark, sf_dir).collect()
    counts = [r["cnt"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert sum(r["share"] for r in rows) <= 1.0 + 1e-6
    assert all(r["x_uniform"] >= 1.0 for r in rows)  # hottest keys ≥ uniform


def test_per_source_cap_binds(spark, sf_dir):
    from spec_search_spark.operators.pipeline_ops import (
        CAP_PER_SOURCE,
        per_source_cap,
    )

    per_src = (
        per_source_cap(spark, sf_dir)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert per_src.filter(F.col("n") > CAP_PER_SOURCE).count() == 0
    # the cap must actually bind on the test corpus
    docs = load_table(spark, sf_dir, "documents")
    assert per_src.agg(F.sum("n")).first()[0] < docs.count()


def test_sliding_windows_double_count(spark, sf_dir):
    from spec_search_spark.operators.windows import sliding_window_counts

    total = (
        sliding_window_counts(spark, sf_dir).agg(F.sum("n")).first()[0]
    )
    n_events = load_table(spark, sf_dir, "events").count()
    assert total == 2 * n_events  # 1h/30min → every event in exactly 2 windows


def test_ntile_quartiles_in_range(spark, sf_dir):
    from spec_search_spark.operators.windows import window_ntile_ranks

    df = window_ntile_ranks(spark, sf_dir)
    bad = df.filter(
        (F.col("quartile") < 1)
        | (F.col("quartile") > 4)
        | (F.col("pr") < 0)
        | (F.col("pr") > 1)
        | (F.col("cd") <= 0)
        | (F.col("cd") > 1)
    ).count()
    assert bad == 0


def test_feature_pit_no_future_leakage(spark, sf_dir):
    from spec_search_spark.operators.windows import feature_store_pit

    df = feature_store_pit(spark, sf_dir)
    # errors can only be in the past: the gap is never negative
    assert df.filter(F.col("secs_since_error") < 0).count() == 0
    # spine cardinality preserved: one row per deduped purchase
    ev = load_table(spark, sf_dir, "events")
    n_spine = (
        ev.filter(F.col("event_type") == "purchase")
        .select("user_id", "ts")
        .distinct()
        .count()
    )
    assert df.count() == n_spine


def test_bpe_pairs_shape(spark, sf_dir):
    from spec_search_spark.operators.text_analysis import bpe_pair_merges

    rows = bpe_pair_merges(spark, sf_dir).collect()
    assert rows
    counts = [r["n"] for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(len(r["pair"]) == 2 for r in rows)


def test_vocab_coverage_monotone(spark, sf_dir):
    from spec_search_spark.operators.text_analysis import vocab_coverage

    rows = sorted(
        vocab_coverage(spark, sf_dir).collect(),
        key=lambda r: (-r["n"], r["tok"]),
    )
    cum = [r["cum_share"] for r in rows]
    assert cum == sorted(cum)
    assert cum[-1] <= 1.0 + 1e-9
    assert abs(cum[-1] - sum(r["share"] for r in rows)) < 1e-4


def test_entity_resolution_structure(spark, sf_dir):
    from pyspark.sql import functions as F

    from spec_search_spark.operators.fuzzy import entity_resolution

    df = entity_resolution(spark, sf_dir)
    # exactly one canonical per entity
    per_entity = df.groupBy("entity_id").agg(
        F.sum(F.col("is_canonical").cast("int")).alias("n_canon"),
        F.count(F.lit(1)).alias("n"),
        F.max("cluster_size").alias("sz"),
    )
    assert per_entity.filter(F.col("n_canon") != 1).count() == 0
    assert per_entity.filter(F.col("n") != F.col("sz")).count() == 0
    # entity id is a member of its own cluster
    assert df.filter(F.col("entity_id") == F.col("name")).count() == per_entity.count()


def test_phash_quads_collapse_and_symmetric(spark, sf_dir):
    # the re-crawl fixture stores one image under every even doc_id of
    # an 8-block: those pairs MUST appear at hamming 0, and every
    # reported pair must be ordered and within the radius
    from spec_search_spark.operators.multimodal import (
        PHASH_HAM_T,
        PHASH_QUAD,
        image_phash_pairs,
    )

    rows = image_phash_pairs(spark, sf_dir).collect()
    assert rows
    pairs = {(r["doc1"], r["doc2"]): r["hamming"] for r in rows}
    for (d1, d2), ham in pairs.items():
        assert d1 < d2 and 0 <= ham <= PHASH_HAM_T
        if d1 // PHASH_QUAD == d2 // PHASH_QUAD:
            assert ham == 0, f"identical images must hash identically {d1},{d2}"
    # at least one full quad of evens collapses: docs 0,2,4,6
    assert pairs.get((0, 2)) == 0 and pairs.get((0, 4)) == 0 and pairs.get((2, 6)) == 0


def test_image_resize_matches_pure_python_nearest(spark, sf_dir):
    """The mapInPandas resize must equal a per-image pure-Python
    nearest-neighbor resample of the same genuinely-built BMP bytes."""
    import struct

    from spec_search_spark.operators.multimodal import (
        RESIZE_GRID,
        make_bmp,
        multimodal_image_resize,
    )

    rows = {r["doc_id"]: r for r in multimodal_image_resize(spark, sf_dir).collect()}
    assert rows  # even doc_ids exist
    for doc_id, r in list(rows.items())[:25]:
        w, h = 1 + doc_id % 31, 1 + doc_id % 17
        b = make_bmp(w, h, seed=doc_id)
        off = struct.unpack_from("<I", b, 10)[0]
        stride = (w * 3 + 3) // 4 * 4
        sums = [0, 0, 0]
        checksum = 0
        for ty in range(RESIZE_GRID):
            for tx in range(RESIZE_GRID):
                yy, xx = (ty * h) // RESIZE_GRID, (tx * w) // RESIZE_GRID
                px = [b[off + yy * stride + xx * 3 + c] for c in range(3)]
                for c in range(3):
                    sums[c] += px[c]
                checksum += sum(px) * (ty * RESIZE_GRID + tx + 1)
        assert (r["width"], r["height"]) == (w, h)
        assert (r["rs_b"], r["rs_g"], r["rs_r"]) == tuple(sums)
        assert r["pos_checksum"] == checksum


def test_merge_upsert_cdc_action_algebra(spark, sf_dir):
    from spec_search_spark.operators import maintenance as mt

    out = {r.action: r for r in mt.merge_upsert_cdc(spark, sf_dir).collect()}
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    n = orders.count()
    in_base = F.expr(
        f"o_orderkey % {mt.MERGE_BASE_SKIP_MOD} != {mt.MERGE_BASE_SKIP_REM}"
    )
    in_delta = F.expr(f"o_orderkey % {mt.MERGE_DELTA_MOD} = 0")
    is_del = F.expr(f"o_orderkey % {mt.MERGE_DELETE_MOD} = 0")
    # every MERGE action count reproduces from the set algebra directly
    assert out["delete"].n == orders.filter(in_base & in_delta & is_del).count()
    assert out["update"].n == orders.filter(in_base & in_delta & ~is_del).count()
    assert out["insert"].n == orders.filter(~in_base & in_delta & ~is_del).count()
    assert out["unchanged"].n == orders.filter(in_base & ~in_delta).count()
    # the next snapshot's size: base - deletes + inserts
    n_base = orders.filter(in_base).count()
    next_rows = out["update"].n + out["insert"].n + out["unchanged"].n
    assert next_rows == n_base - out["delete"].n + out["insert"].n
    # upserts carry the bumped price: cents_total ≡ raw cents + bump·n
    raw_upd = orders.filter(in_base & in_delta & ~is_del).agg(
        F.sum(F.expr("cast(round(o_totalprice * 100) as bigint)"))
    ).first()[0]
    assert out["update"].cents_total == raw_upd + mt.MERGE_PRICE_BUMP_CENTS * out["update"].n


def test_association_rules_measures_are_exact(spark, sf_dir):
    from spec_search_spark.operators import affinity as af

    rows = af.association_rules(spark, sf_dir).collect()
    assert len(rows) == af.TOP_RULES
    items = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict = {}
    for r in items:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    baskets = {k: v for k, v in baskets.items() if len(v) <= af.MAX_BASKET}
    n_orders = len(baskets)
    from collections import Counter

    margin: Counter = Counter()
    for parts in baskets.values():
        margin.update(parts)
    for r in rows:
        n_both = sum(
            1 for parts in baskets.values() if r.p1 in parts and r.p2 in parts
        )
        assert r.n_both == n_both >= af.RULE_MIN_SUPPORT
        assert abs(r.confidence - n_both / margin[r.p1]) < 2e-6
        assert abs(r.lift - n_orders * n_both / (margin[r.p1] * margin[r.p2])) < 2e-6
        assert r.lift >= 1.0  # top-20 by lift on this data are positive


def test_mahalanobis_gate_matches_numpy(spark, sf_dir):
    import numpy as np

    from spec_search_spark.operators.ml import (
        MAHAL_CHI2_999,
        mahalanobis_outlier_report,
    )

    got = {r.l_returnflag: r for r in mahalanobis_outlier_report(spark, sf_dir).collect()}
    pdf = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .selectExpr(
            "l_returnflag",
            "cast(round(l_quantity * 100) as bigint) as x",
            "cast(round(l_extendedprice * 100) as bigint) as y",
        )
        .toPandas()
    )
    pts = pdf[["x", "y"]].to_numpy(dtype=float)
    mu = pts.mean(axis=0)
    cov = np.cov(pts.T, bias=True)
    inv = np.linalg.inv(cov)
    d = pts - mu
    d2 = np.einsum("ij,jk,ik->i", d, inv, d)
    pdf["out"] = d2 > MAHAL_CHI2_999
    ref = pdf.groupby("l_returnflag")["out"].agg(["count", "sum"])
    for flag, row in ref.iterrows():
        assert got[flag].n == row["count"]
        assert got[flag].n_out == row["sum"], flag


def test_cdc_chunk_dedup_accounting_is_consistent(spark, sf_dir):
    from spec_search_spark.operators.span_dedup import cdc_chunk_dedup

    r = cdc_chunk_dedup(spark, sf_dir).first()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total_toks = (
        docs.selectExpr(
            "case when trim(text) = '' then 0"
            " else size(split(trim(text), '\\\\s+')) end as n"
        )
        .groupBy()
        .sum("n")
        .first()[0]
    )
    # every token lands in exactly one chunk
    assert r.total_tokens == total_toks
    assert r.n_distinct <= r.n_chunks
    assert r.stored_tokens <= r.total_tokens
    assert 0.0 <= r.dedup_ratio < 1.0
    assert r.n_shared > 0  # the corpus genuinely shares chunks


def test_rules_hitrate_eval_matches_brute_force(spark, sf_dir):
    from spec_search_spark.operators import affinity as af

    row = af.rules_hitrate_eval(spark, sf_dir).first()
    items = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select("l_orderkey", "l_partkey")
        .distinct()
        .collect()
    )
    baskets: dict = {}
    for r in items:
        baskets.setdefault(r.l_orderkey, set()).add(r.l_partkey)
    baskets = {k: v for k, v in baskets.items() if len(v) <= af.MAX_BASKET}
    train = {k: v for k, v in baskets.items() if k % af.REC_TEST_MOD != 0}
    test = {k: v for k, v in baskets.items() if k % af.REC_TEST_MOD == 0}
    from collections import Counter

    margin: Counter = Counter()
    pair_n: Counter = Counter()
    for parts in train.values():
        margin.update(parts)
        for p1 in parts:
            for p2 in parts:
                if p1 != p2:
                    pair_n[(p1, p2)] += 1
    rules: dict = {}
    for (p1, p2), nb in pair_n.items():
        if nb >= af.REC_MIN_SUPPORT:
            rules.setdefault(p1, {})[p2] = round(nb / margin[p1] * 1e6)
    n_scored = sum(1 for v in test.values() if len(v) >= 2)
    hits = 0
    for ok_, parts in test.items():
        if len(parts) < 2:
            continue
        target = max(parts)
        seed = parts - {target}
        scores: dict = {}
        for s in seed:
            for c, conf in rules.get(s, {}).items():
                if c in parts and c != target:
                    continue
                scores[c] = max(scores.get(c, 0), conf)
        top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[: af.REC_TOP_K]
        hits += any(c == target for c, _ in top)
    assert row.n_test_baskets == len(test)
    assert row.n_scored == n_scored
    assert row.n_hits == hits


def test_stream_merge_upsert_equals_batch_merge(spark, sf_dir):
    from spec_search_spark.operators.maintenance import merge_upsert_cdc
    from spec_search_spark.streaming.incremental import stream_merge_upsert_query

    got = stream_merge_upsert_query(spark, sf_dir).first()
    # the batch MERGE audit implies the same final snapshot: rows =
    # update + insert + unchanged; cents = their cents_total sum
    audit = {r.action: r for r in merge_upsert_cdc(spark, sf_dir).collect()}
    keep = [audit[a] for a in ("update", "insert", "unchanged") if a in audit]
    assert got.n_rows == sum(r.n for r in keep)
    assert got.key_sum == sum(r.key_sum for r in keep)
    assert got.cents_total == sum(r.cents_total for r in keep)


def test_stream_percolate_equals_batch(spark, sf_dir):
    from spec_search_spark.operators.bm25 import percolate_alerts
    from spec_search_spark.streaming.incremental import stream_percolate_query

    batch = {
        (r.t1, r.t2): r.n_docs for r in percolate_alerts(spark, sf_dir).collect()
    }
    stream = {
        (r.t1, r.t2): r.n_docs
        for r in stream_percolate_query(spark, sf_dir).collect()
    }
    assert stream == batch
