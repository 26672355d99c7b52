"""Invariant tests for the EWMA / applyInArrow / audio-energy batch
(value parity vs DuckDB is covered by tools/selfcheck.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table


def test_ewma_stays_within_value_hull(spark, sf_dir):
    from spec_search_spark.operators.behavior import ewma_user_value

    rows = ewma_user_value(spark, sf_dir).collect()
    assert rows
    hull = {
        r["user_id"]: (r["lo"], r["hi"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        lo, hi = hull[r["user_id"]]
        # a convex combination of observed values cannot escape their hull
        assert lo - 1e-6 <= r["ewma_value"] <= hi + 1e-6


def test_ewma_single_event_equals_value(spark, sf_dir):
    """ewma([v]) == v: the fold seeds with the first value."""
    import pandas as pd

    from spec_search_spark.operators.behavior import EWMA_ALPHA

    # replicate the fold locally on one user's ordered values
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "value")
        .toPandas()
        .sort_values(["user_id", "ts", "event_id"])
    )
    uid = ev["user_id"].iloc[0]
    vals = ev[ev["user_id"] == uid]["value"].tolist()
    acc = vals[0]
    for x in vals[1:]:
        acc = EWMA_ALPHA * x + (1 - EWMA_ALPHA) * acc
    from spec_search_spark.operators.behavior import ewma_user_value

    got = {
        r["user_id"]: r["ewma_value"]
        for r in ewma_user_value(spark, "/root/testdata/sf0.001").collect()
    }[uid]
    assert abs(got - round(acc, 6)) < 1e-9


def test_arrow_group_stats_matches_builtin_agg(spark, sf_dir):
    from spec_search_spark.operators.extensibility import arrow_group_stats

    got = {
        r["event_type"]: (r["n"], r["n_users"], r["total_value"], r["max_value"])
        for r in arrow_group_stats(spark, sf_dir).collect()
    }
    want = {
        r["event_type"]: (r["n"], r["n_users"], r["total_value"], r["max_value"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("user_id").alias("n_users"),
            F.round(F.sum("value"), 2).alias("total_value"),
            F.max("value").alias("max_value"),
        )
        .collect()
    }
    assert got == want


def test_audio_energy_decodes_known_payload(spark, sf_dir):
    """The kernel's numpy decode agrees with a hand-rolled struct
    parse on a fixed payload."""
    import struct

    import pandas as pd

    from spec_search_spark.operators.multimodal import (
        decode_wav_energy_batch,
        make_wav,
    )

    payload = make_wav(8000, 2, 5, seed=123)
    (out,) = decode_wav_energy_batch(
        iter([pd.DataFrame({"doc_id": [1], "payload": [payload]})])
    )
    r = out.iloc[0]
    assert (r["sample_rate"], r["n_channels"], r["n_frames"]) == (8000, 2, 5)
    data = payload[44:]
    vals = [
        struct.unpack("<h", data[2 * j : 2 * j + 2])[0] for j in range(5 * 2)
    ]
    assert r["total_abs"] == sum(abs(v) for v in vals)
    assert r["peak"] == max(abs(v) for v in vals)


def test_observed_metrics_match_direct_agg(spark, sf_dir):
    from spec_search_spark.operators.maintenance import observed_write_metrics

    (r,) = observed_write_metrics(spark, sf_dir).collect()
    li = load_table(spark, sf_dir, "lineitem")
    (want,) = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias(
            "revenue"
        ),
        F.count(F.when(F.col("l_quantity") > 45, 1)).alias("n_high_qty"),
    ).collect()
    assert (r["n_rows"], r["revenue"], r["n_high_qty"]) == (
        want["n_rows"],
        want["revenue"],
        want["n_high_qty"],
    )


def test_audio_energy_covers_all_audio_docs(spark, sf_dir):
    from spec_search_spark.operators.multimodal import multimodal_audio_energy

    df = multimodal_audio_energy(spark, sf_dir)
    n_audio = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("doc_id") % 2 == 1)
        .count()
    )
    assert df.count() == n_audio


def test_dsir_target_domain_scores_highest(spark, sf_dir):
    from spec_search_spark.operators.lm_quality import (
        DSIR_TARGET,
        dsir_importance_report,
    )

    rows = dsir_importance_report(spark, sf_dir).collect()
    assert rows
    by_src = {r["source"]: r for r in rows}
    assert all(0 <= r["n_selected"] <= r["n_docs"] for r in rows)
    # the importance ratio is trained ON the target domain: its own
    # docs must score highest on average
    target_avg = by_src[DSIR_TARGET]["avg_logw"]
    assert target_avg == max(r["avg_logw"] for r in rows)


def test_lang_confusion_diagonal_dominates(spark, sf_dir):
    from spec_search_spark.operators.text_analysis import lang_id_confusion

    rows = lang_id_confusion(spark, sf_dir).collect()
    assert rows
    shares: dict[str, float] = {}
    for r in rows:
        shares[r["lang"]] = shares.get(r["lang"], 0.0) + r["share_of_label"]
    for lang, s in shares.items():
        assert abs(s - 1.0) < 1e-4


def test_temperature_mixing_compresses_shares(spark, sf_dir):
    from spec_search_spark.operators.pipeline_ops import source_mix_temperature

    rows = source_mix_temperature(spark, sf_dir).collect()
    assert rows
    assert abs(sum(r["raw_share"] for r in rows) - 1.0) < 1e-3
    assert abs(sum(r["temp_share"] for r in rows) - 1.0) < 1e-3
    # sqrt-scaling moves every share toward the mean: biggest sources
    # shrink, smallest grow
    big = max(rows, key=lambda r: r["raw_share"])
    small = min(rows, key=lambda r: r["raw_share"])
    assert big["temp_share"] <= big["raw_share"] + 1e-9
    assert small["temp_share"] >= small["raw_share"] - 1e-9


def test_k_anonymity_consistency(spark, sf_dir):
    from spec_search_spark.operators.pii import K_ANON_K, k_anonymity_report

    (r,) = k_anonymity_report(spark, sf_dir).collect()
    assert r["n_groups"] >= 1
    assert 1 <= r["k_anonymity"]
    if r["k_anonymity"] >= K_ANON_K:
        assert r["n_rows_below_k"] == 0 and r["n_groups_below_k"] == 0
    else:
        assert r["n_groups_below_k"] >= 1
        assert r["n_rows_below_k"] >= r["n_groups_below_k"]


def test_minhash_eval_counts_consistent(spark, sf_dir):
    from spec_search_spark.operators.dedup import minhash_eval_report

    (r,) = minhash_eval_report(spark, sf_dir).collect()
    assert 0 <= r["n_hit"] <= min(r["n_truth"], r["n_candidates"])
    assert 0.0 <= r["recall"] <= 1.0
    assert 0.0 <= r["precision"] <= 1.0
    # this corpus's planted near-dups are high-jaccard: banding with
    # 4x4 must catch most of them
    assert r["recall"] >= 0.8


def test_km_survival_is_monotone_and_bounded(spark, sf_dir):
    from spec_search_spark.operators.behavior import km_survival_curve
    from spec_search_spark.catalog import load_table

    rows = km_survival_curve(spark, sf_dir).collect()
    assert rows, "empty curve"
    n_users = (
        load_table(spark, sf_dir, "events").select("user_id").distinct().count()
    )
    # every user appears exactly once across the lifetime groups
    assert sum(r["n_churned"] + r["n_censored"] for r in rows) == n_users
    # n_risk at the smallest lifetime is the full cohort
    assert rows[0]["n_risk"] == n_users
    last = 1.0
    for r in rows:
        assert 0.0 <= r["survival"] <= 1.0
        assert r["survival"] <= last + 1e-9  # survival never increases
        last = r["survival"]
        assert r["n_risk"] >= r["n_churned"] + r["n_censored"] >= 1


def test_stream_seasonal_equals_batch(spark, sf_dir):
    # the streaming twin (fixed baseline broadcast + bounded bucket
    # state) must reproduce the batch report exactly
    from spec_search_spark.operators.behavior import seasonal_anomaly_report
    from spec_search_spark.streaming.incremental import (
        stream_seasonal_anomaly_query,
    )

    b = {
        (r["dow"], r["hod"]): (r["n"], r["mean_value"], r["sigma_value"], r["n_anomalies"])
        for r in seasonal_anomaly_report(spark, sf_dir).collect()
    }
    s = {
        (r["dow"], r["hod"]): (r["n"], r["mean_value"], r["sigma_value"], r["n_anomalies"])
        for r in stream_seasonal_anomaly_query(spark, sf_dir).collect()
    }
    assert b == s and len(b) > 0


def _write_events(tmp_path, rows):
    """rows: (event_id, 'YYYY-MM-DD', user_id). Single-file parquet so both
    Spark (load_table) and DuckDB (the oracle view) read the same bytes."""
    from datetime import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                [datetime.fromisoformat(r[1] + "T12:00:00") for r in rows],
                pa.timestamp("us"),
            ),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["view"] * len(rows), pa.string()),
            "value": pa.array([1.0] * len(rows), pa.float64()),
            "props": pa.array(["{}"] * len(rows), pa.string()),
        }
    )
    pq.write_table(table, str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_km_survival_with_real_churn(spark, tmp_path):
    """The shipped testdata censors 100% of users (survival constantly 1.0),
    so the estimator's churn branch — the nano-nat ln/exp product and the
    d == n_risk dead cut — never ran on checked data. Synthetic cohort with
    known lifetimes: churn at t=0/3/10, mixed churn+censor ties, and a
    lone max-lifetime churner that triggers the dead cut (S -> 0.0).

    Closed form: S(0)=7/9, S(3)=7/9*4/5, S(10)=that*1/3, S(20)=0."""
    import duckdb

    from spec_search_spark.operators.behavior import KM_SQL, km_survival_curve

    # wend = 2024-02-01 (u8). censored iff wend - last_day < 7.
    events = [
        (1, "2024-01-01", 1),                        # t=0  churned
        (2, "2024-01-02", 2),                        # t=0  churned
        (3, "2024-01-30", 3),                        # t=0  censored
        (4, "2024-01-01", 4), (5, "2024-01-04", 4),  # t=3  churned
        (6, "2024-01-27", 5), (7, "2024-01-30", 5),  # t=3  censored
        (8, "2024-01-05", 6), (9, "2024-01-15", 6),  # t=10 churned
        (10, "2024-01-03", 7), (11, "2024-01-13", 7),  # t=10 churned
        (12, "2024-02-01", 8),                       # t=0  censored, sets wend
        (13, "2024-01-01", 9), (14, "2024-01-21", 9),  # t=20 churned: dead cut
    ]
    sf = _write_events(tmp_path, events)
    rows = km_survival_curve(spark, sf).collect()

    got = {r["t_days"]: r for r in rows}
    assert sorted(got) == [0, 3, 10, 20]
    assert (got[0]["n_risk"], got[0]["n_churned"], got[0]["n_censored"]) == (9, 2, 2)
    assert (got[3]["n_risk"], got[3]["n_churned"], got[3]["n_censored"]) == (5, 1, 1)
    assert (got[10]["n_risk"], got[10]["n_churned"], got[10]["n_censored"]) == (3, 2, 0)
    assert (got[20]["n_risk"], got[20]["n_churned"], got[20]["n_censored"]) == (1, 1, 0)

    s0, s3 = 7 / 9, 7 / 9 * 4 / 5
    s10 = s3 * (1 / 3)
    assert abs(got[0]["survival"] - s0) < 1e-5
    assert abs(got[3]["survival"] - s3) < 1e-5
    assert abs(got[10]["survival"] - s10) < 1e-5
    assert got[20]["survival"] == 0.0  # dead cut: d == n_risk

    # cross-engine: the DuckDB oracle must agree bit-exactly on the fixture
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    oracle = con.sql(KM_SQL).fetchall()
    spark_tuples = [
        (r["t_days"], r["n_risk"], r["n_churned"], r["n_censored"], r["survival"])
        for r in rows
    ]
    assert spark_tuples == [tuple(o) for o in oracle]


def test_event_seq3_support_matches_direct_reference(spark, sf_dir):
    from collections import Counter, defaultdict

    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.behavior import (
        SEQ3_TOP_K,
        event_seq3_support,
    )

    rows = event_seq3_support(spark, sf_dir).collect()
    assert len(rows) <= SEQ3_TOP_K
    per_user = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    ):
        per_user[r[0]].append((r[1], r[2], r[3]))
    occ = Counter()
    users = defaultdict(set)
    for uid, evs in per_user.items():
        evs.sort()
        for i in range(len(evs) - 2):
            tri = (evs[i][2], evs[i + 1][2], evs[i + 2][2])
            occ[tri] += 1
            users[tri].add(uid)
    expected = sorted(occ.items(), key=lambda kv: (-kv[1], kv[0]))[:SEQ3_TOP_K]
    got = [((r["e1"], r["e2"], r["e3"]), r["n_occurrences"]) for r in rows]
    assert got == expected
    for r in rows:
        assert r["n_users"] == len(users[(r["e1"], r["e2"], r["e3"])])


def test_rfm_quintile_segments_matches_direct_reference(spark, sf_dir):
    from collections import defaultdict

    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.behavior import rfm_quintile_segments

    rows = rfm_quintile_segments(spark, sf_dir).collect()
    orders = (
        load_table(spark, sf_dir, "orders")
        .selectExpr(
            "o_custkey",
            "cast(o_orderdate as date) as d",
            "cast(round(o_totalprice * 100) as bigint) as cents",
        )
        .collect()
    )
    d1 = max(r["d"] for r in orders)
    per_c = defaultdict(lambda: [10**9, 0, 0])
    for r in orders:
        m = per_c[r["o_custkey"]]
        m[0] = min(m[0], (d1 - r["d"]).days)
        m[1] += 1
        m[2] += r["cents"]

    def cuts(vals):
        s = sorted(vals)
        n = len(s)
        out = []
        for j in (1, 2, 3, 4):
            t = (j * n + 4) // 5  # ceil(j*n/5)
            # smallest value whose inclusive cum count reaches t
            out.append(s[t - 1])
        return out

    rc = cuts([v[0] for v in per_c.values()])
    fc = cuts([v[1] for v in per_c.values()])
    mc = cuts([v[2] for v in per_c.values()])

    seg = defaultdict(lambda: [0, 0])
    for r_, f_, m_ in per_c.values():
        key = (
            1 + sum(r_ > c for c in rc),
            1 + sum(f_ > c for c in fc),
            1 + sum(m_ > c for c in mc),
        )
        seg[key][0] += 1
        seg[key][1] += m_
    got = {
        (r["r_b"], r["f_b"], r["m_b"]): (r["n_customers"], r["monetary_cents"])
        for r in rows
    }
    assert got == {k: tuple(v) for k, v in seg.items()}
    for r in rows:
        assert 1 <= r["r_b"] <= 5 and 1 <= r["f_b"] <= 5 and 1 <= r["m_b"] <= 5


def test_burstiness_by_type_matches_direct_reference(spark, sf_dir):
    from collections import Counter

    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.behavior import burstiness_by_type
    from pyspark.sql import functions as F

    rows = {r["event_type"]: r for r in burstiness_by_type(spark, sf_dir).collect()}
    evs = (
        load_table(spark, sf_dir, "events")
        .select(F.date_trunc("hour", "ts").alias("h"), "event_type")
        .collect()
    )
    h0 = min(r["h"] for r in evs)
    h1 = max(r["h"] for r in evs)
    n_hours = int((h1 - h0).total_seconds() // 3600) + 1
    per = Counter((r["event_type"], r["h"]) for r in evs)
    types = {r["event_type"] for r in evs}
    assert set(rows) == types
    for t in types:
        counts = [v for (tt, _), v in per.items() if tt == t]
        counts += [0] * (n_hours - len(counts))
        n = len(counts)
        s = sum(counts)
        sxx = sum(c * c for c in counts)
        mean = s / n
        fano = (n * sxx - s * s) / (n * s)
        r = rows[t]
        assert (r["n_hours"], r["n_events"]) == (n, s)
        assert abs(r["mean_per_hour_6"] - mean) < 1e-6
        assert abs(r["fano_6"] - fano) < 2e-6


def test_stream_burstiness_equals_batch(spark, sf_dir):
    from spec_search_spark.operators.behavior import burstiness_by_type
    from spec_search_spark.streaming.incremental import stream_burstiness_query

    b = {r["event_type"]: r.asDict() for r in burstiness_by_type(spark, sf_dir).collect()}
    s = {r["event_type"]: r.asDict() for r in stream_burstiness_query(spark, sf_dir).collect()}
    assert b == s


def test_rolling_active_users_matches_brute_force(spark, sf_dir):
    from spec_search_spark.operators.behavior import (
        WAU_WINDOW_DAYS,
        rolling_active_users,
    )

    got = {r.day: r for r in rolling_active_users(spark, sf_dir).collect()}
    ud = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("user_id", "cast(ts as date) as day")
        .distinct()
        .collect()
    )
    by_day: dict = {}
    for r in ud:
        by_day.setdefault(r.day, set()).add(r.user_id)
    days = sorted(by_day)
    import datetime

    for d in days:
        week = set()
        for k in range(WAU_WINDOW_DAYS):
            week |= by_day.get(d - datetime.timedelta(days=k), set())
        assert got[d].dau == len(by_day[d]), d
        assert got[d].wau == len(week), d
        assert got[d].wau >= got[d].dau


def test_cohort_ltv_triangle_with_staggered_cohorts(spark, tmp_path):
    """The shipped events start every user in week 0 (one cohort), so
    the triangle's multi-cohort shape never shows there. Staggered
    synthetic signups: two cohorts, known per-cell cents, cumulative
    LTV checked closed-form, and the DuckDB oracle must agree."""
    import duckdb

    from spec_search_spark.operators.behavior import (
        COHORT_LTV_SQL,
        cohort_ltv_triangle,
    )

    # value column is fixed at 1.0 by _write_events => 100 cents/event
    events = [
        # cohort 0 (first week): users 1, 2
        (1, "2024-01-01", 1), (2, "2024-01-02", 2),
        # cohort 0 age 1: user 1 returns
        (3, "2024-01-09", 1),
        # cohort 1 (second week): user 3 signs up
        (4, "2024-01-08", 3),
        # cohort 1 age 1: user 3 returns twice
        (5, "2024-01-16", 3), (6, "2024-01-17", 3),
    ]
    sf = _write_events(tmp_path, events)
    rows = {
        (r.cohort_week, r.age_weeks): r
        for r in cohort_ltv_triangle(spark, sf).collect()
    }
    assert set(rows) == {(0, 0), (0, 1), (1, 0), (1, 1)}
    assert rows[(0, 0)].n_active == 2 and rows[(0, 0)].cents == 200
    assert rows[(0, 1)].n_active == 1 and rows[(0, 1)].cents == 100
    assert rows[(1, 0)].n_active == 1 and rows[(1, 0)].cents == 100
    assert rows[(1, 1)].n_active == 1 and rows[(1, 1)].cents == 200
    # cum LTV: cohort 0 size 2 -> 1.0 then 1.5 dollars; cohort 1 size 1
    assert rows[(0, 0)].cum_ltv == 1.0 and rows[(0, 1)].cum_ltv == 1.5
    assert rows[(1, 0)].cum_ltv == 1.0 and rows[(1, 1)].cum_ltv == 3.0
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    oracle = {(r[0], r[1]): r for r in con.sql(COHORT_LTV_SQL).fetchall()}
    for k, r in rows.items():
        assert oracle[k][2:] == (r.n_active, r.cents, r.cum_ltv), k
