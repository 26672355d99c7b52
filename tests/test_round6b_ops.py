"""Semantic invariants + python-reference parity for the second
round-6 batch (value parity vs the DuckDB oracles is covered by
tools/selfcheck.py): SPRT hourly looks, seasonal decomposition, JSD
language drift, mutual-information ranking, walk-forward CV splits,
Fellegi-Sunter linkage scores, and JL projection recall."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

from pyspark.sql import functions as F


# --- SPRT (hourly looks) -----------------------------------------------------


def test_sprt_matches_python_walk(spark, sf_dir):
    from spec_search_spark.operators.drift import (
        SPRT_A_N,
        SPRT_B_N,
        SPRT_LO_N,
        SPRT_UP_N,
        sprt_conversion_hourly,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("ts", "event_type")
        .collect()
    )
    per_h: dict = defaultdict(lambda: [0, 0])
    for r in rows:
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        per_h[h][0] += 1
        per_h[h][1] += int(r.event_type == "purchase")
    nn = kk = 0
    cross = None
    for h in sorted(per_h):
        n, k = per_h[h]
        nn, kk = nn + n, kk + k
        llr = kk * SPRT_A_N + (nn - kk) * SPRT_B_N
        if cross is None and (llr >= SPRT_UP_N or llr <= SPRT_LO_N):
            cross = (h, 1 if llr >= SPRT_UP_N else -1)
    got = sprt_conversion_hourly(spark, sf_dir).collect()[0]
    assert got.n_hours == len(per_h)
    assert got.n_trials == nn and got.k_conv == kk
    assert got.llr_final_micro == kk * SPRT_A_N + (nn - kk) * SPRT_B_N
    if cross is None:
        assert got.decision == "continue"
        assert got.cross_epoch_hour is None
    else:
        want_dec = "accept_h1" if cross[1] == 1 else "accept_h0"
        assert got.decision == want_dec
        import calendar

        epoch_h = calendar.timegm(cross[0].timetuple()) // 3600
        assert got.cross_epoch_hour == epoch_h


# --- seasonal decomposition --------------------------------------------------


def test_seasonal_decompose_matches_python(spark, sf_dir):
    from spec_search_spark.operators.drift import (
        SEAS_PERIOD,
        seasonal_decompose_hourly,
    )
    import calendar

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("ts", "value")
        .collect()
    )
    per_h: Counter = Counter()
    for r in rows:
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        per_h[calendar.timegm(h.timetuple()) // 3600] += round(r.value * 100)
    i0, i1 = min(per_h), max(per_h)
    x = {i: per_h.get(i, 0) for i in range(i0, i1 + 1)}
    half = SEAS_PERIOD // 2
    sd: Counter = Counter()
    cnt: Counter = Counter()
    for t in range(i0 + half, i1 - half + 1):
        t2 = (
            x[t - half]
            + x[t + half]
            + 2 * sum(x[t + j] for j in range(-half + 1, half))
        )
        d = 2 * SEAS_PERIOD * x[t] - t2
        sd[t % SEAS_PERIOD] += d
        cnt[t % SEAS_PERIOD] += 1
    got = seasonal_decompose_hourly(spark, sf_dir).collect()
    assert len(got) == SEAS_PERIOD
    for r in got:
        assert r.n_obs == cnt[r.hod]
        want = (
            round(sd[r.hod] / (2 * SEAS_PERIOD * cnt[r.hod] * 100) * 1e6)
            / 1e6
        )
        assert math.isclose(r.seasonal_dollars, want, abs_tol=2e-6)
    # additive decomposition: hod-sums of detrended values sum to the
    # total detrended mass (exact integer identity held by construction)
    assert sum(cnt.values()) == (i1 - i0 + 1) - 2 * half


# --- JSD language drift ------------------------------------------------------


def test_jsd_matches_python(spark, sf_dir):
    from spec_search_spark.operators.text_analysis import (
        JSD_SCALE as SCALE,
        jsd_lang_drift,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", "text")
        .collect()
    )
    ca: Counter = Counter()
    cb: Counter = Counter()
    for d in docs:
        if not d.text.strip():
            continue
        for t in d.text.strip().split():
            (ca if d.lang == "en" else cb)[t] += 1
    na, nb = sum(ca.values()), sum(cb.values())
    vocab = set(ca) | set(cb)
    st = 0
    for t in vocab:
        a, b = ca.get(t, 0), cb.get(t, 0)
        pa, pb = a / na, b / nb
        m = (pa + pb) / 2
        term = 0.5 * (
            (pa * math.log2(pa / m) if a > 0 else 0.0)
            + (pb * math.log2(pb / m) if b > 0 else 0.0)
        )
        st += round(term * SCALE)
    want = round(st / SCALE * 1e6) / 1e6
    got = jsd_lang_drift(spark, sf_dir).collect()[0]
    assert got.n_vocab == len(vocab)
    assert got.n_en_tok == na and got.n_other_tok == nb
    assert math.isclose(got.jsd_bits, want, abs_tol=2e-6)
    assert 0.0 <= got.jsd_bits <= 1.0  # log2 JSD is bounded by 1 bit


# --- mutual information ------------------------------------------------------


def test_mutual_info_matches_python(spark, sf_dir):
    from spec_search_spark.operators.text_analysis import (
        CHI2_MIN_DF,
        MI_TOP_K,
        mutual_info_tokens,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("lang", "text")
        .collect()
    )
    a: Counter = Counter()
    b: Counter = Counter()
    n_en = n_ot = 0
    for d in docs:
        if not d.text.strip():
            continue
        toks = set(d.text.strip().split())
        if d.lang == "en":
            n_en += 1
            for t in toks:
                a[t] += 1
        else:
            n_ot += 1
            for t in toks:
                b[t] += 1
    nn = n_en + n_ot

    def cell(n, r, c):
        return (n / nn) * math.log2(n * nn / (r * c)) if n > 0 else 0.0

    scored = []
    for t in set(a) | set(b):
        aa, bb = a.get(t, 0), b.get(t, 0)
        if aa + bb < CHI2_MIN_DF:
            continue
        mi = (
            cell(aa, aa + bb, n_en)
            + cell(bb, aa + bb, n_ot)
            + cell(n_en - aa, nn - aa - bb, n_en)
            + cell(n_ot - bb, nn - aa - bb, n_ot)
        )
        scored.append((round(mi * 1e6) / 1e6, t, aa, bb))
    want = sorted(scored, key=lambda s: (-s[0], s[1]))[:MI_TOP_K]
    got = mutual_info_tokens(spark, sf_dir).collect()
    assert [(r.mi_bits, r.tok, r.n_en_docs, r.n_other_docs) for r in got] == [
        (s[0], s[1], s[2], s[3]) for s in want
    ]
    for r in got:
        assert r.mi_bits >= 0.0  # MI is non-negative


# --- walk-forward CV ---------------------------------------------------------


def test_walk_forward_is_leakage_free_and_exact(spark, sf_dir):
    from spec_search_spark.operators.ml import (
        WF_TEST_YEARS,
        walk_forward_cv_splits,
    )

    orders = (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .select(F.year("o_orderdate").alias("y"), "o_totalprice")
        .collect()
    )
    got = walk_forward_cv_splits(spark, sf_dir).collect()
    assert [r.fold for r in got] == list(range(1, len(WF_TEST_YEARS) + 1))
    prev_train = -1
    for r in got:
        ty = r.test_year
        tr = [o for o in orders if o.y < ty]
        te = [o for o in orders if o.y == ty]
        assert r.n_train == len(tr) and r.n_test == len(te)
        # expanding window: each fold trains on strictly more data
        assert r.n_train > prev_train
        prev_train = r.n_train
        sc = sum(round(o.o_totalprice * 100) for o in tr)
        assert math.isclose(
            r.train_avg_price, round(sc / len(tr)) / 100.0, abs_tol=1e-9
        )


# --- Fellegi-Sunter ----------------------------------------------------------


def _edit_dist(s1: str, s2: str) -> int:
    if len(s1) < len(s2):
        s1, s2 = s2, s1
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1):
        cur = [i + 1]
        for j, c2 in enumerate(s2):
            cur.append(
                min(prev[j + 1] + 1, cur[j] + 1, prev[j] + (c1 != c2))
            )
        prev = cur
    return prev[-1]


def test_fs_linkage_matches_python(spark, sf_dir):
    from spec_search_spark.operators.fuzzy import (
        EDIT_D,
        FS_FIELDS,
        fs_linkage_scores,
    )

    parts = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .select("p_name", *FS_FIELDS)
        .collect()
    )
    n = len(parts)

    def c2(x):
        return x * (x - 1) // 2

    u_den = c2(n)
    m_groups = Counter(p.p_name for p in parts)
    m_den = sum(c2(c) for c in m_groups.values())
    wa, wd = {}, {}
    for f in FS_FIELDS:
        u_num = sum(c2(c) for c in Counter(p[f] for p in parts).values())
        mn = sum(
            c2(c)
            for c in Counter((p.p_name, p[f]) for p in parts).values()
        )
        wa[f] = round(
            math.log2(((mn + 1) / (m_den + 2)) / ((u_num + 1) / (u_den + 2)))
            * 1e6
        )
        wd[f] = round(
            math.log2(
                ((m_den - mn + 1) / (m_den + 2))
                / ((u_den - u_num + 1) / (u_den + 2))
            )
            * 1e6
        )
    names = sorted(m_groups)
    cand = [
        (a, b)
        for i, a in enumerate(names)
        for b in names[i + 1 :]
        if abs(len(a) - len(b)) <= EDIT_D and _edit_dist(a, b) <= EDIT_D
    ]
    by_name = defaultdict(list)
    for p in parts:
        by_name[p.p_name].append(p)
    pat_n: Counter = Counter()
    for a, b in cand:
        for pa in by_name[a]:
            for pb in by_name[b]:
                pat_n[tuple(int(pa[f] == pb[f]) for f in FS_FIELDS)] += 1
    got = fs_linkage_scores(spark, sf_dir).collect()
    assert got, "candidate blocks must produce at least one pattern"
    got_map = {
        tuple(r[f"agree_{f}"] for f in FS_FIELDS): (r.n_pairs, r.score_bits)
        for r in got
    }
    assert set(got_map) == set(pat_n)
    for pat, n_pairs in pat_n.items():
        want_score = (
            sum(wa[f] if g else wd[f] for f, g in zip(FS_FIELDS, pat)) / 1e6
        )
        assert got_map[pat][0] == n_pairs
        assert math.isclose(got_map[pat][1], want_score, abs_tol=2e-6)
    # full agreement must outscore full disagreement
    full = tuple(1 for _ in FS_FIELDS)
    none = tuple(0 for _ in FS_FIELDS)
    if full in got_map and none in got_map:
        assert got_map[full][1] > got_map[none][1]


# --- JL projection recall ----------------------------------------------------


def test_jl_projection_recall_contract(spark, sf_dir):
    from spec_search_spark.operators.similarity import N_PROBES, TOP_K
    from spec_search_spark.operators.vector_quant import (
        JL_DIM,
        JL_SIGNS,
        jl_projection_recall,
    )

    assert len(JL_SIGNS) == JL_DIM and all(len(r) == 64 for r in JL_SIGNS)
    # signs must not be the degenerate alternating pattern
    flat = [s for row in JL_SIGNS for s in row]
    assert 0.3 < sum(1 for s in flat if s > 0) / len(flat) < 0.7
    rows = jl_projection_recall(spark, sf_dir).collect()
    assert len(rows) == N_PROBES
    for r in rows:
        assert 0 <= r.n_hits <= TOP_K
        assert math.isclose(r.recall_6, round(r.n_hits / TOP_K * 1e6) / 1e6)
    # JL with m=16 on this corpus must preserve a meaningful fraction
    # of the true neighborhood (sanity floor, not a tuned number)
    assert sum(r.n_hits for r in rows) > 0


def test_jl_projection_matches_numpy(spark, sf_dir):
    import numpy as np

    from spec_search_spark.operators.vector_quant import JL_SIGNS, JL_DIM
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.vector_quant import _jl_component

    emb = load_table(spark, sf_dir, "embeddings").limit(5)
    got = emb.selectExpr(
        "vec_id",
        "array("
        + ", ".join(_jl_component("embedding", k, 0) for k in range(JL_DIM))
        + ") AS pv",
        "embedding",
    ).collect()
    s = np.array(JL_SIGNS, dtype=np.float64)
    for r in got:
        v = np.array(r.embedding, dtype=np.float64)
        want = s @ v
        assert np.allclose(np.array(r.pv), want, atol=1e-9)


# --- model evaluation pack ---------------------------------------------------


def _scored_lr(spark, sf_dir):
    from spec_search_spark.operators.ml import _LR_P6, _trained_logreg

    feats, beta = _trained_logreg(spark, sf_dir)
    return (
        feats.crossJoin(F.broadcast(beta))
        .selectExpr("y", f"{_LR_P6} AS p6")
        .collect()
    )


def test_roc_auc_matches_python(spark, sf_dir):
    from spec_search_spark.operators.ml import roc_auc_doc_model

    rows = _scored_lr(spark, sf_dir)
    pos = sorted(r.p6 for r in rows if r.y == 1)
    neg = sorted(r.p6 for r in rows if r.y == 0)
    # O(n^2) exact tie-aware U on the fixture
    num2 = 0
    for p in pos:
        for q in neg:
            if p > q:
                num2 += 2
            elif p == q:
                num2 += 1
    want = round(num2 / (2.0 * len(pos) * len(neg)) * 1e6) / 1e6
    got = roc_auc_doc_model(spark, sf_dir).collect()[0]
    assert got.n_pos == len(pos) and got.n_neg == len(neg)
    assert math.isclose(got.auc_6, want, abs_tol=2e-6)
    assert 0.0 <= got.auc_6 <= 1.0


def test_brier_decomposition_matches_python(spark, sf_dir):
    from spec_search_spark.operators.ml import (
        BRIER_SCALE,
        brier_decomposition,
    )

    rows = _scored_lr(spark, sf_dir)
    n = len(rows)
    # raw Brier from exact integers
    se2 = sum((r.p6 - 1_000_000 * r.y) ** 2 for r in rows)
    brier = round(se2 / (n * 1e12) * 1e6) / 1e6
    bins: dict = defaultdict(lambda: [0, 0, 0])
    for r in rows:
        b = int(math.floor(r.p6 / 100000.0))
        bins[b][0] += 1
        bins[b][1] += r.y
        bins[b][2] += r.p6
    ybar = sum(v[1] for v in bins.values()) / n
    rel_n = sum(
        round(
            v[0]
            * (v[2] / (v[0] * 1e6) - v[1] / v[0]) ** 2
            / n
            * BRIER_SCALE
        )
        for v in bins.values()
    )
    res_n = sum(
        round(v[0] * (v[1] / v[0] - ybar) ** 2 / n * BRIER_SCALE)
        for v in bins.values()
    )
    got = brier_decomposition(spark, sf_dir).collect()[0]
    assert got.n_docs == n
    assert math.isclose(got.brier_6, brier, abs_tol=2e-6)
    assert math.isclose(
        got.reliability_6, round(rel_n / BRIER_SCALE * 1e6) / 1e6, abs_tol=2e-6
    )
    assert math.isclose(
        got.resolution_6, round(res_n / BRIER_SCALE * 1e6) / 1e6, abs_tol=2e-6
    )
    unc = round(ybar * (1 - ybar) * 1e6) / 1e6
    assert math.isclose(got.uncertainty_6, unc, abs_tol=2e-6)
    # Murphy: binned Brier = unc - res + rel; raw Brier adds the
    # (nonnegative) within-bin variance of p, so raw >= unc - res + rel
    # only up to that variance term -- check both directions loosely
    assert got.reliability_6 >= 0 and got.resolution_6 >= 0
    assert got.uncertainty_6 >= got.resolution_6 - 2e-6


def test_isotonic_pav_matches_sklearn_free_reference(spark, sf_dir):
    from spec_search_spark.operators.ml import isotonic_calibration_pav

    rows = _scored_lr(spark, sf_dir)
    bins: dict = defaultdict(lambda: [0, 0])
    for r in rows:
        b = int(math.floor(r.p6 / 100000.0))
        bins[b][0] += 1
        bins[b][1] += r.y
    order = sorted(bins)
    # classic sequential PAV pooling
    pools = [[bins[b][0], bins[b][1]] for b in order]  # [n, sum_y]
    i = 0
    while i < len(pools) - 1:
        if pools[i][1] * pools[i + 1][0] > pools[i + 1][1] * pools[i][0]:
            pools[i][0] += pools[i + 1][0]
            pools[i][1] += pools[i + 1][1]
            del pools[i + 1]
            i = max(i - 1, 0)
        else:
            i += 1
    want = []
    for p in pools:
        # expand each pool back to its member bins
        pass
    # rebuild per-bin fitted values by walking pools over bin counts
    fitted = {}
    bi = 0
    for p in pools:
        consumed = 0
        while consumed < p[0]:
            bkey = order[bi]
            fitted[bkey] = p[1] * 1e6 / p[0]
            consumed += bins[bkey][0]
            bi += 1
    got = isotonic_calibration_pav(spark, sf_dir).collect()
    assert [r.bin for r in got] == order
    prev = -1
    for r in got:
        assert r.n_docs == bins[r.bin][0]
        assert r.iso_rate_ppm == round(fitted[r.bin])
        assert r.iso_rate_ppm >= prev  # monotone non-decreasing
        prev = r.iso_rate_ppm


def test_stream_sprt_equals_batch(spark, sf_dir):
    from spec_search_spark.operators.drift import sprt_conversion_hourly
    from spec_search_spark.streaming.incremental import (
        stream_sprt_decision_query,
    )

    batch = sprt_conversion_hourly(spark, sf_dir).collect()
    stream = stream_sprt_decision_query(spark, sf_dir).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


# --- semantic decontamination ------------------------------------------------


def test_semantic_decontamination_matches_numpy(spark, sf_dir):
    import numpy as np

    from spec_search_spark.operators.pipeline_ops import (
        SEMDECON_N_BENCH,
        SEMDECON_TAU,
        semantic_decontamination,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding", "label")
        .collect()
    )
    V = {r.vec_id: (np.array(r.embedding, dtype=np.float64), r.label) for r in rows}
    bench = [v for i, (v, _) in V.items() if i < SEMDECON_N_BENCH]
    per_label: dict = defaultdict(lambda: [0, 0, -2.0])
    for i, (v, lab) in V.items():
        if i < SEMDECON_N_BENCH:
            continue
        mx = max(
            round(float(v @ b / (np.linalg.norm(v) * np.linalg.norm(b))), 4)
            for b in bench
        )
        per_label[lab][0] += 1
        per_label[lab][1] += int(mx >= SEMDECON_TAU)
        per_label[lab][2] = max(per_label[lab][2], mx)
    got = semantic_decontamination(spark, sf_dir).collect()
    assert [r.label for r in got] == sorted(per_label)
    removed_total = 0
    for r in got:
        n, rem, hot = per_label[r.label]
        assert r.n_corpus == n and r.n_removed == rem
        assert r.n_kept == n - rem
        assert math.isclose(r.hottest_sim, hot, abs_tol=2e-4)
        removed_total += r.n_removed
    assert removed_total > 0  # the fixture-scale tau must not be vacuous


# --- position-based attribution ----------------------------------------------


def test_attribution_position_based_matches_python(spark, sf_dir):
    from spec_search_spark.operators.behavior import (
        PB_EDGE_PPM,
        PB_MID_PPM,
        attribution_position_based,
    )

    ev = sorted(
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("user_id", "event_type", "ts", "event_id", "value")
        .collect(),
        key=lambda r: (r.user_id, r.ts, r.event_id),
    )
    chan: dict = defaultdict(lambda: [0, 0, 0])  # n, ppm, cv
    path: dict = defaultdict(list)
    for r in ev:
        if r.event_type == "purchase":
            cents = round(r.value * 100)
            p = path.pop(r.user_id, [])
            k = len(p)
            if k == 0:
                chan["direct"][0] += 1
                chan["direct"][1] += 1_000_000
                chan["direct"][2] += cents * 1_000_000
            else:
                for pos, c in enumerate(p, 1):
                    if k == 1:
                        cr = 1_000_000
                    elif k == 2:
                        cr = 500_000
                    elif pos in (1, k):
                        cr = PB_EDGE_PPM
                    else:
                        # floor + deterministic remainder: the first
                        # (PB_MID_PPM mod (k-2)) middles get +1 so the
                        # conversion's credits sum to exactly 1e6 ppm
                        cr = PB_MID_PPM // (k - 2) + (
                            1 if pos - 1 <= PB_MID_PPM % (k - 2) else 0
                        )
                    chan[c][0] += 1
                    chan[c][1] += cr
                    chan[c][2] += cents * cr
        else:
            path[r.user_id].append(r.event_type)
    got = attribution_position_based(spark, sf_dir).collect()
    assert [r.channel for r in got] == sorted(chan)
    for r in got:
        n, ppm, cv = chan[r.channel]
        assert r.n_credits == n
        assert r.credit_ppm == ppm
        assert math.isclose(
            r.credited_dollars, round(cv / 1e8 * 1e4) / 1e4, abs_tol=2e-4
        )


# --- audio silence runs ------------------------------------------------------


def test_audio_silence_runs_matches_python(spark, sf_dir):
    from spec_search_spark.operators.multimodal import (
        SILENCE_THRESH,
        audio_silence_runs,
        make_wav,
    )
    import struct

    got = {r.doc_id: r for r in audio_silence_runs(spark, sf_dir).collect()}
    doc_ids = [
        r.doc_id
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id")
        .collect()
        if r.doc_id % 2 == 1
    ]
    assert set(got) == set(doc_ids)
    some_runs = 0
    for d in doc_ids[:50]:
        payload = make_wav(8000 + d % 100, 1 + d % 2, d % 50, seed=d)
        (data_len,) = struct.unpack("<I", payload[40:44])
        raw = payload[44 : 44 + data_len]
        samples = [
            struct.unpack("<h", raw[2 * i : 2 * i + 2])[0]
            for i in range(len(raw) // 2)
        ]
        mask = [abs(s) < SILENCE_THRESH for s in samples]
        runs, cur = [], 0
        for m in mask:
            if m:
                cur += 1
            elif cur:
                runs.append(cur)
                cur = 0
        if cur:
            runs.append(cur)
        r = got[d]
        assert r.n_silent == sum(mask)
        assert r.n_runs == len(runs)
        assert r.longest_run == (max(runs) if runs else 0)
        some_runs += len(runs)
    assert some_runs > 0  # threshold must not be vacuous


# --- embedding drift monitor -------------------------------------------------


def test_embedding_drift_matches_numpy(spark, sf_dir):
    import numpy as np

    from spec_search_spark.operators.drift import (
        EMB_COMP_SCALE,
        EMB_DRIFT_TOP,
        embedding_drift_monitor,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    )
    sa = Counter()
    sb = Counter()
    na = nb = 0
    for r in rows:
        tgt = sa if r.vec_id % 2 == 0 else sb
        if r.vec_id % 2 == 0:
            na += 1
        else:
            nb += 1
        for d, x in enumerate(r.embedding):
            tgt[d] += round(float(np.float64(x)) * EMB_COMP_SCALE)
    dims = sorted(sa.keys() | sb.keys())
    ma = np.array([sa[d] / na for d in dims])
    mb = np.array([sb[d] / nb for d in dims])
    shifts = sorted(
        ((round(abs(sa[d] / na - sb[d] / nb)), d) for d in dims),
        key=lambda t: (-t[0], t[1]),
    )
    got = embedding_drift_monitor(spark, sf_dir).collect()
    assert len(got) == EMB_DRIFT_TOP
    assert [(r.abs_shift_micro, r.dim) for r in got] == shifts[:EMB_DRIFT_TOP]
    cos = float(ma @ mb / (np.linalg.norm(ma) * np.linalg.norm(mb)))
    for r in got:
        assert math.isclose(r.mean_cosine_6, cos, abs_tol=1e-3)
        assert r.mean_a_micro == round(sa[r.dim] / na)
        assert r.mean_b_micro == round(sb[r.dim] / nb)


def test_stream_seasonal_decompose_equals_batch(spark, sf_dir):
    from spec_search_spark.operators.drift import seasonal_decompose_hourly
    from spec_search_spark.streaming.incremental import (
        stream_seasonal_decompose_query,
    )

    batch = seasonal_decompose_hourly(spark, sf_dir).collect()
    stream = stream_seasonal_decompose_query(spark, sf_dir).collect()
    assert [tuple(r) for r in stream] == [tuple(r) for r in batch]


# --- DBSCAN on the candidate graph -------------------------------------------


def test_dbscan_matches_python_reference(spark, sf_dir):
    import numpy as np

    from spec_search_spark.operators.kmeans import (
        DBSCAN_EPS,
        DBSCAN_ITERS,
        DBSCAN_MIN_PTS,
        dbscan_clusters,
        kmeans_assign,
    )

    assign = {
        r.vec_id: r.cluster for r in kmeans_assign(spark, sf_dir).collect()
    }
    emb = {
        r.vec_id: np.array(r.embedding, dtype=np.float64)
        for r in spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        .select("vec_id", "embedding")
        .collect()
    }
    ne = {i: v / np.linalg.norm(v) for i, v in emb.items()}
    by_cluster: dict = defaultdict(list)
    for i, c in assign.items():
        by_cluster[c].append(i)
    nbrs: dict = defaultdict(set)
    for c, ids in by_cluster.items():
        for i in ids:
            for j in ids:
                if i != j and round(float(ne[i] @ ne[j]), 6) >= DBSCAN_EPS:
                    nbrs[i].add(j)
    core = {i for i, ns in nbrs.items() if len(ns) >= DBSCAN_MIN_PTS}
    label = {i: i for i in core}
    for _ in range(DBSCAN_ITERS):
        label = {
            i: min(
                [label[i]] + [label[j] for j in nbrs[i] if j in core]
            )
            for i in core
        }
    want = {}
    for i in emb:
        if i in core:
            want[i] = ("core", label[i])
        else:
            cn = [label[j] for j in nbrs.get(i, ()) if j in core]
            want[i] = ("border", min(cn)) if cn else ("noise", None)
    got = dbscan_clusters(spark, sf_dir).collect()
    assert len(got) == len(emb)
    for r in got:
        assert (r.role, r.label) == want[r.vec_id], r.vec_id
    roles = {r.role for r in got}
    assert roles == {"core", "border", "noise"}  # all three non-empty


# --- Page-Hinkley -------------------------------------------------------------


def test_page_hinkley_matches_python(spark, sf_dir):
    import calendar

    from spec_search_spark.operators.drift import (
        PH_LAMBDA,
        PH_SCALE,
        page_hinkley_hourly,
    )
    from spec_search_spark.streaming.incremental import (
        stream_page_hinkley_query,
    )

    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .select("ts", "value")
        .collect()
    )
    per_h: Counter = Counter()
    for r in rows:
        h = r.ts.replace(minute=0, second=0, microsecond=0)
        per_h[calendar.timegm(h.timetuple()) // 3600] += round(r.value * 100)
    def round_half_away(v: float) -> int:
        # Spark/DuckDB round() is half-away-from-zero; python's round()
        # is banker's (half-even) — they differ on exact .5 doubles
        return int(math.floor(v + 0.5)) if v >= 0 else -int(math.floor(-v + 0.5))

    i0, i1 = min(per_h), max(per_h)
    s = m = 0
    mn = 0
    ph_max = 0
    alarm = None
    for n, i in enumerate(range(i0, i1 + 1), 1):
        x = per_h.get(i, 0)
        s += x
        m += round_half_away((x - s / n) * PH_SCALE)
        mn = min(mn, m)
        ph = m - mn
        ph_max = max(ph_max, ph)
        if alarm is None and ph > PH_LAMBDA:
            alarm = i
    got = page_hinkley_hourly(spark, sf_dir).collect()[0]
    assert got.n_hours == i1 - i0 + 1
    assert got.ph_max_micro == ph_max
    assert got.alarm_epoch_hour == alarm
    assert got.decision == ("alarm" if alarm is not None else "no_alarm")
    stream = stream_page_hinkley_query(spark, sf_dir).collect()[0]
    assert tuple(stream) == tuple(got)
