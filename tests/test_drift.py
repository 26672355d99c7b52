"""Drift-test invariants (value parity vs DuckDB is selfcheck's job)."""

from __future__ import annotations


def test_ks_matches_scipy_free_reference(spark, sf_dir):
    """Exact D via a direct two-pointer merge over the collected
    samples — independent of the shared integer-cumulative oracle."""
    from spec_search_spark.operators.drift import (
        KS_A,
        KS_B,
        ks_test_priority_revenue,
    )
    from spec_search_spark.catalog import load_table
    from pyspark.sql import functions as F

    row = ks_test_priority_revenue(spark, sf_dir).first()
    o = load_table(spark, sf_dir, "orders")
    a = sorted(
        r[0]
        for r in o.filter(F.col("o_orderpriority") == KS_A)
        .select(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .collect()
    )
    b = sorted(
        r[0]
        for r in o.filter(F.col("o_orderpriority") == KS_B)
        .select(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .collect()
    )
    assert (row["n1"], row["n2"]) == (len(a), len(b))
    values = sorted(set(a) | set(b))
    import bisect

    d = 0.0
    for v in values:
        f1 = bisect.bisect_right(a, v) / len(a)
        f2 = bisect.bisect_right(b, v) / len(b)
        d = max(d, abs(f1 - f2))
    assert abs(row["ks_d"] - d) < 1e-6
    assert 0.0 <= row["ks_d"] <= 1.0


def test_psi_is_symmetric_zero_on_identical_halves(spark, sf_dir):
    """PSI properties: finite, non-negative, and the band matches the
    conventional thresholds."""
    from spec_search_spark.operators.drift import psi_value_drift

    row = psi_value_drift(spark, sf_dir).first()
    assert row["n1"] > 0 and row["n2"] > 0
    assert row["psi"] >= 0.0 or abs(row["psi"]) < 1e-6
    expected_band = (
        "stable" if row["psi"] < 0.1 else ("moderate" if row["psi"] < 0.2 else "shifted")
    )
    assert row["band"] == expected_band


def test_stream_psi_equals_batch_psi(spark, sf_dir):
    # the streaming twin must reproduce the batch drift score exactly:
    # same bins, same nano-unit fold, only the count-table construction
    # differs (streaming state vs one batch aggregation)
    from spec_search_spark.operators.drift import psi_value_drift
    from spec_search_spark.streaming.incremental import stream_psi_drift_query

    b = psi_value_drift(spark, sf_dir).collect()[0]
    s = stream_psi_drift_query(spark, sf_dir).collect()[0]
    assert (b["n1"], b["n2"], b["psi"], b["band"]) == (
        s["n1"],
        s["n2"],
        s["psi"],
        s["band"],
    )


def test_benford_matches_direct_reference(spark, sf_dir):
    import math

    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.drift import benford_first_digit
    from pyspark.sql import functions as F

    rows = benford_first_digit(spark, sf_dir).collect()
    cents = [
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .select(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .collect()
    ]
    counts: dict = {}
    for v in cents:
        d = int(str(v)[0])
        counts[d] = counts.get(d, 0) + 1
    nn = len(cents)
    chi2 = 0.0
    for d in sorted(counts):
        e = nn * math.log10(1 + 1 / d)
        chi2 += round((counts[d] - e) ** 2 / e * 1e9) / 1e9
    got = {r["d"]: r for r in rows}
    assert set(got) == set(counts)
    for d, c in counts.items():
        r = got[d]
        assert r["n"] == c
        assert abs(r["obs_share_6"] - c / nn) < 2e-6
        assert abs(r["benford_share_6"] - math.log10(1 + 1 / d)) < 2e-6
        assert abs(r["chi2_6"] - chi2) < 5e-6
    # shares sum to ~1 on both sides
    assert abs(sum(r["obs_share_6"] for r in rows) - 1.0) < 1e-4


def test_hourly_autocorrelation_matches_direct_reference(spark, sf_dir):
    from datetime import timedelta

    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.drift import (
        ACF_LAGS,
        hourly_autocorrelation,
    )
    from pyspark.sql import functions as F

    rows = {r["lag"]: r for r in hourly_autocorrelation(spark, sf_dir).collect()}
    per_h: dict = {}
    for h, cents in (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x"))
        .collect()
    ):
        per_h[h] = cents
    h0, h1 = min(per_h), max(per_h)
    xs = []
    h = h0
    while h <= h1:
        xs.append(per_h.get(h, 0))
        h = h + timedelta(hours=1)
    n = len(xs)
    mean = sum(xs) / n
    den = sum((x - mean) ** 2 for x in xs)
    for k in ACF_LAGS:
        num = sum((xs[t] - mean) * (xs[t + k] - mean) for t in range(n - k))
        r = rows[k]
        assert r["n_pairs"] == n - k
        assert abs(r["acf_6"] - num / den) < 2e-6
        assert -1.0 - 1e-9 <= r["acf_6"] <= 1.0 + 1e-9


def test_stream_benford_equals_direct_event_reference(spark, sf_dir):
    """The streaming twin's 9-row state table must score exactly like a
    direct batch count over the same stream source column."""
    import math

    from spec_search_spark.catalog import load_table
    from spec_search_spark.streaming.incremental import (
        stream_benford_digits_query,
    )
    from pyspark.sql import functions as F

    rows = {r["d"]: r for r in stream_benford_digits_query(spark, sf_dir).collect()}
    cents = [
        r[0]
        for r in load_table(spark, sf_dir, "events")
        .select(F.expr("cast(round(value * 100) as bigint)"))
        .collect()
        if r[0] >= 1  # Benford is defined on nonzero amounts
    ]
    counts: dict = {}
    for v in cents:
        d = int(str(v)[0])
        counts[d] = counts.get(d, 0) + 1
    assert set(rows) == set(counts)
    nn = len(cents)
    chi2 = sum(
        round(
            (counts[d] - nn * math.log10(1 + 1 / d)) ** 2
            / (nn * math.log10(1 + 1 / d))
            * 1e9
        )
        / 1e9
        for d in counts
    )
    for d, c in counts.items():
        assert rows[d]["n"] == c
        assert abs(rows[d]["chi2_6"] - chi2) < 5e-6


def test_stream_mad_outlier_matches_direct_reference(spark, sf_dir):
    """One-row stream state: n/outlier counts must equal a direct batch
    recomputation with the same snapshot-derived med/MAD/threshold."""
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.rank_stats import MAD_K
    from spec_search_spark.streaming.incremental import stream_mad_outlier_query
    from pyspark.sql import functions as F

    row = stream_mad_outlier_query(spark, sf_dir).first()
    xs = sorted(
        r[0]
        for r in load_table(spark, sf_dir, "events")
        .select(F.expr("cast(round(value * 100) as bigint)"))
        .collect()
    )
    n = len(xs)
    med = xs[(n + 1) // 2 - 1]
    devs = sorted(abs(x - med) for x in xs)
    mad = devs[(n + 1) // 2 - 1]
    thr = round(MAD_K * mad)
    n_out = sum(1 for d in devs if d > thr)
    assert (row["n"], row["med_cents"], row["mad_cents"]) == (n, med, mad)
    assert (row["thr_cents"], row["n_outliers"]) == (thr, n_out)


def test_cramers_v_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.drift import cramers_v_priority_status

    row = cramers_v_priority_status(spark, sf_dir).first()
    cells: dict = {}
    for a, b in (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderstatus")
        .collect()
    ):
        cells[(a, b)] = cells.get((a, b), 0) + 1
    nn = sum(cells.values())
    ma: dict = {}
    mb: dict = {}
    for (a, b), n in cells.items():
        ma[a] = ma.get(a, 0) + n
        mb[b] = mb.get(b, 0) + n
    chi2 = 0.0
    for (a, b), n in cells.items():
        e = ma[a] * mb[b] / nn
        chi2 += round((n - e) ** 2 / e * 1e9) / 1e9
    import math

    v = math.sqrt(chi2 / (nn * (min(len(ma), len(mb)) - 1)))
    assert (row["n"], row["n_rows_dim"], row["n_cols_dim"]) == (
        nn,
        len(ma),
        len(mb),
    )
    assert abs(row["chi2_6"] - chi2) < 5e-6
    assert abs(row["cramers_v_6"] - v) < 2e-6
    assert 0.0 <= row["cramers_v_6"] <= 1.0


def _hourly_series(spark, sf_dir):
    from datetime import timedelta

    from spec_search_spark.catalog import load_table
    from pyspark.sql import functions as F

    per_h: dict = {}
    for h, cents in (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(F.sum(F.expr("cast(round(value * 100) as bigint)")).alias("x"))
        .collect()
    ):
        per_h[h] = cents
    h0, h1 = min(per_h), max(per_h)
    xs = []
    h = h0
    while h <= h1:
        xs.append(per_h.get(h, 0))
        h = h + timedelta(hours=1)
    return xs


def test_mann_kendall_matches_direct_reference(spark, sf_dir):
    import math

    from spec_search_spark.operators.drift import Z_CRIT, mann_kendall_hourly

    row = mann_kendall_hourly(spark, sf_dir).first()
    xs = _hourly_series(spark, sf_dir)
    n = len(xs)
    s = sum(
        (xs[j] > xs[i]) - (xs[j] < xs[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    ties: dict = {}
    for x in xs:
        ties[x] = ties.get(x, 0) + 1
    tie_term = sum(t * (t - 1) * (2 * t + 5) for t in ties.values())
    var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
    z = (s - 1 if s > 0 else s + 1 if s < 0 else 0) / math.sqrt(var)
    assert (row["n_hours"], row["n_pairs"], row["s"]) == (n, n * (n - 1) // 2, s)
    assert abs(row["z_6"] - z) < 2e-6
    assert row["reject_05"] == (abs(z) > Z_CRIT)


def test_theil_sen_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.operators.drift import SEN_SCALE, theil_sen_hourly

    row = theil_sen_hourly(spark, sf_dir).first()
    xs = _hourly_series(spark, sf_dir)
    n = len(xs)
    slopes = []
    for i in range(n):
        for j in range(i + 1, n):
            v = (xs[j] - xs[i]) / (j - i)
            # SQL round: half away from zero
            import math as m

            slopes.append(int(m.copysign(m.floor(abs(v * SEN_SCALE) + 0.5), v)))
    slopes.sort()
    med = slopes[(len(slopes) + 1) // 2 - 1]
    assert row["n_pairs"] == len(slopes)
    assert row["sen_slope_nano"] == med
    assert abs(row["sen_slope_6"] - med / 1e9) < 1e-6


def test_stream_acf_equals_batch_acf(spark, sf_dir):
    from spec_search_spark.operators.drift import hourly_autocorrelation
    from spec_search_spark.streaming.incremental import stream_hourly_acf_query

    b = {r["lag"]: r for r in hourly_autocorrelation(spark, sf_dir).collect()}
    s = {r["lag"]: r for r in stream_hourly_acf_query(spark, sf_dir).collect()}
    assert set(b) == set(s)
    for k in b:
        assert (b[k]["n_pairs"], b[k]["acf_6"]) == (s[k]["n_pairs"], s[k]["acf_6"])


def test_cusum_changepoint_matches_direct_reference(spark, sf_dir):
    import math

    from spec_search_spark.operators.drift import (
        KOLMOGOROV_CRIT,
        cusum_changepoint_hourly,
    )

    row = cusum_changepoint_hourly(spark, sf_dir).first()
    xs = _hourly_series(spark, sf_dir)
    n = len(xs)
    s = sum(xs)
    sxx = sum(x * x for x in xs)
    best_ad, best_k = -1, None
    cx = 0
    for k, x in enumerate(xs, start=1):
        cx += x
        ad = abs(n * cx - k * s)
        if ad > best_ad:
            best_ad, best_k = ad, k
    assert row["n_hours"] == n
    assert row["cusum_abs_scaled"] == best_ad
    sigma = math.sqrt(sxx / n - (s / n) ** 2)
    q = (best_ad / n) / (sigma * math.sqrt(n))
    assert abs(row["stat_6"] - q) < 2e-6
    assert row["reject_05"] == (q > KOLMOGOROV_CRIT)
    # the argmax hour is the (best_k)-th hour of the filled grid
    first_hh = None
    from spec_search_spark.operators.drift import _hourly_filled
    from pyspark.sql import functions as F

    first_hh = (
        _hourly_filled(spark, sf_dir)
        .select(F.expr("cast(unix_micros(h) div 3600000000 as bigint)").alias("hh"))
        .groupBy()
        .agg(F.min("hh").alias("m"))
        .first()["m"]
    )
    assert row["cp_epoch_hour"] == first_hh + best_k - 1


def test_stream_cusum_equals_batch_cusum(spark, sf_dir):
    from spec_search_spark.operators.drift import cusum_changepoint_hourly
    from spec_search_spark.streaming.incremental import (
        stream_cusum_changepoint_query,
    )

    b = cusum_changepoint_hourly(spark, sf_dir).first()
    s = stream_cusum_changepoint_query(spark, sf_dir).first()
    assert b.asDict() == s.asDict()


def test_wilcoxon_ampm_matches_direct_reference(spark, sf_dir):
    import math

    from spec_search_spark.operators.drift import (
        Z_CRIT,
        wilcoxon_ampm_hourly,
        _hourly_filled,
    )
    from pyspark.sql import functions as F

    row = wilcoxon_ampm_hourly(spark, sf_dir).first()
    hh_x = {
        r[0]: r[1]
        for r in _hourly_filled(spark, sf_dir)
        .select(
            F.expr("cast(unix_micros(h) div 3600000000 as bigint)"), "x"
        )
        .collect()
    }
    ds = []
    for hh, x in hh_x.items():
        if hh % 24 < 12 and (hh + 12) in hh_x:
            d = hh_x[hh + 12] - x
            if d != 0:
                ds.append(d)
    n = len(ds)
    assert row["n_pairs"] == n

    def _avg_ranks(values):
        out = {}
        srt = sorted(values)
        i = 0
        while i < len(srt):
            j = i
            while j < len(srt) and srt[j] == srt[i]:
                j += 1
            out[srt[i]] = (i + 1 + j) / 2
            i = j
        return out

    ranks = _avg_ranks([abs(d) for d in ds])
    w2 = round(2 * sum(ranks[abs(d)] for d in ds if d > 0))
    assert row["w_plus_x2"] == w2
    from collections import Counter

    tie3 = sum(c**3 - c for c in Counter(abs(d) for d in ds).values())
    z = (w2 - n * (n + 1) / 2) / math.sqrt(
        n * (n + 1) * (2 * n + 1) / 6 - tie3 / 12
    )
    assert abs(row["z_6"] - z) < 2e-6
    assert row["reject_05"] == (abs(z) > Z_CRIT)


def test_mk_panel_matches_direct_reference(spark, sf_dir):
    import math
    from collections import Counter, defaultdict
    from datetime import timedelta

    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.drift import (
        Z_CRIT,
        mann_kendall_daily_by_priority,
    )
    from pyspark.sql import functions as F

    rows = {r["priority"]: r for r in mann_kendall_daily_by_priority(spark, sf_dir).collect()}
    orders = (
        load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", F.col("o_orderdate").cast("date").alias("d"))
        .collect()
    )
    d0 = min(r["d"] for r in orders)
    d1 = max(r["d"] for r in orders)
    n_days = (d1 - d0).days + 1
    per = Counter((r["o_orderpriority"], r["d"]) for r in orders)
    groups = {r["o_orderpriority"] for r in orders}
    assert set(rows) == groups
    for g in groups:
        xs = [per.get((g, d0 + timedelta(days=i)), 0) for i in range(n_days)]
        n = len(xs)
        s = sum(
            (0 if xs[j] == xs[i] else (1 if xs[j] > xs[i] else -1))
            for i in range(n)
            for j in range(i + 1, n)
        )
        tie_term = sum(
            t * (t - 1) * (2 * t + 5) for t in Counter(xs).values()
        )
        var = (n * (n - 1) * (2 * n + 5) - tie_term) / 18
        z = (s - 1 if s > 0 else s + 1 if s < 0 else 0) / math.sqrt(var)
        r = rows[g]
        assert (r["n_days"], r["n_pairs"], r["s"]) == (n, n * (n - 1) // 2, s)
        assert abs(r["z_6"] - z) < 2e-6
        assert r["reject_05"] == (abs(z) > Z_CRIT)


def test_holt_forecast_matches_python_recursion(spark, sf_dir):
    from spec_search_spark.operators.drift import (
        HOLT_ALPHA,
        HOLT_BETA,
        HOLT_HORIZON,
        _hourly_filled,
        holt_forecast_hourly,
    )

    xs = [
        float(r.x)
        for r in _hourly_filled(spark, sf_dir).orderBy("h").collect()
    ]
    level, trend = xs[0], xs[1] - xs[0]
    for x in xs[2:]:
        lnew = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (level + trend)
        trend = HOLT_BETA * (lnew - level) + (1 - HOLT_BETA) * trend
        level = lnew
    row = holt_forecast_hourly(spark, sf_dir).first()
    assert row.n_hours == len(xs)
    assert abs(row.level - level) < 1e-5
    assert abs(row.trend - trend) < 1e-5
    assert abs(row.forecast_24h - (level + HOLT_HORIZON * trend)) < 1e-4


def test_holt_backtest_mase_matches_python(spark, sf_dir):
    from spec_search_spark.operators.drift import (
        BT_SEASON,
        HOLT_ALPHA,
        HOLT_BETA,
        _hourly_filled,
        holt_backtest_mase,
    )

    xs = [float(r.x) for r in _hourly_filled(spark, sf_dir).orderBy("h").collect()]
    n = len(xs)
    t = (4 * n) // 5
    level, trend = xs[0], xs[1] - xs[0]
    for x in xs[2:t]:
        lnew = HOLT_ALPHA * x + (1 - HOLT_ALPHA) * (level + trend)
        trend = HOLT_BETA * (lnew - level) + (1 - HOLT_BETA) * trend
        level = lnew
    se_h = se_n = 0
    for k in range(1, n - t + 1):
        se_h += round(abs(xs[t + k - 1] - (level + k * trend)) * 1e6)
        naive = xs[t + k - 1 - BT_SEASON * ((k + BT_SEASON - 1) // BT_SEASON)]
        se_n += round(abs(xs[t + k - 1] - naive) * 1e6)
    row = holt_backtest_mase(spark, sf_dir).first()
    assert row.n_hours == n and row.t_train == t and row.h_test == n - t
    assert abs(row.mase - se_h / se_n) < 2e-6
    assert row.mae_holt > 0 and row.mae_naive > 0
