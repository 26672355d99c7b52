"""Rank-stats + corpus-info invariants (value parity vs DuckDB is
selfcheck's job) — each statistic is re-derived from the collected raw
sample with an independent pure-Python reference implementation."""

from __future__ import annotations

import math


def _collect_cents(spark, sf_dir, priority):
    from spec_search_spark.catalog import load_table
    from pyspark.sql import functions as F

    return [
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == priority)
        .select(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .collect()
    ]


def test_mannwhitney_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.operators.rank_stats import (
        MW_A,
        MW_B,
        mannwhitney_priority_revenue,
    )

    row = mannwhitney_priority_revenue(spark, sf_dir).first()
    a = _collect_cents(spark, sf_dir, MW_A)
    b = _collect_cents(spark, sf_dir, MW_B)
    n1, n2 = len(a), len(b)
    assert (row["n1"], row["n2"]) == (n1, n2)

    # direct tie-averaged rank-sum over the merged sample
    merged = sorted([(v, 0) for v in a] + [(v, 1) for v in b])
    r1x2 = 0  # doubled rank-sum of sample A
    tie3 = 0
    i = 0
    while i < len(merged):
        j = i
        while j < len(merged) and merged[j][0] == merged[i][0]:
            j += 1
        c = j - i
        dr = 2 * i + c + 1  # doubled average rank (ranks are 1-based)
        r1x2 += dr * sum(1 for k in range(i, j) if merged[k][1] == 0)
        tie3 += c**3 - c
        i = j
    u1x2 = r1x2 - n1 * (n1 + 1)
    assert row["u1x2"] == u1x2

    n = n1 + n2
    mu2 = n1 * n2  # doubled mean of U
    var = (n1 * n2 / 12) * ((n + 1) - tie3 / (n * (n - 1)))
    z = (u1x2 - mu2) / (2 * math.sqrt(var))
    assert abs(row["z_6"] - z) < 2e-6
    assert row["reject_05"] == (abs(z) > 1.959964)


def _avg_ranks(values):
    """value -> tie-averaged rank (float), 1-based."""
    out = {}
    s = sorted(values)
    i = 0
    while i < len(s):
        j = i
        while j < len(s) and s[j] == s[i]:
            j += 1
        out[s[i]] = (i + 1 + j) / 2
        i = j
    return out


def test_spearman_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.rank_stats import spearman_qty_price
    from pyspark.sql import functions as F

    row = spearman_qty_price(spark, sf_dir).first()
    pairs = [
        (r[0], r[1])
        for r in load_table(spark, sf_dir, "lineitem")
        .select(
            F.expr("cast(round(l_quantity) as bigint)"),
            F.expr("cast(round(l_extendedprice * 100) as bigint)"),
        )
        .collect()
    ]
    assert row["n"] == len(pairs)
    rx = _avg_ranks([p[0] for p in pairs])
    ry = _avg_ranks([p[1] for p in pairs])
    xs = [rx[p[0]] for p in pairs]
    ys = [ry[p[1]] for p in pairs]
    n = len(pairs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    rho = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy)
    )
    assert abs(row["rho_6"] - rho) < 2e-6
    assert -1.0 <= row["rho_6"] <= 1.0


def test_mad_outliers_match_direct_reference(spark, sf_dir):
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.rank_stats import (
        MAD_K,
        mad_outlier_orders,
    )
    from pyspark.sql import functions as F

    row = mad_outlier_orders(spark, sf_dir).first()
    xs = sorted(
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .select(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .collect()
    )
    n = len(xs)
    med = xs[(n + 1) // 2 - 1]  # lower median
    devs = sorted(abs(x - med) for x in xs)
    mad = devs[(n + 1) // 2 - 1]
    thr = round(MAD_K * mad)
    n_out = sum(1 for d in devs if d > thr)
    assert (row["n"], row["med_cents"], row["mad_cents"]) == (n, med, mad)
    assert (row["thr_cents"], row["n_outliers"]) == (thr, n_out)
    assert abs(row["outlier_share_6"] - n_out / n) < 2e-6


def _lang_counts(spark, sf_dir, langs=None):
    from spec_search_spark.catalog import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    if langs:
        docs = docs.filter(F.col("lang").isin(*langs))
    counts: dict = {}
    for lang, text in docs.collect():
        for tok in text.strip().split():
            counts.setdefault(lang, {})
            counts[lang][tok] = counts[lang].get(tok, 0) + 1
    return counts


def test_entropy_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.operators.corpus_info import token_entropy_by_lang

    rows = {r["lang"]: r for r in token_entropy_by_lang(spark, sf_dir).collect()}
    counts = _lang_counts(spark, sf_dir)
    assert set(rows) == set(counts)
    for lang, cs in counts.items():
        n = sum(cs.values())
        h = -sum((c / n) * math.log(c / n) for c in cs.values())
        r = rows[lang]
        assert (r["n_tokens"], r["n_types"]) == (n, len(cs))
        assert abs(r["entropy_nats_6"] - h) < 2e-6
        assert 0.0 <= r["entropy_nats_6"] <= math.log(n) + 1e-9


def test_js_divergence_matches_direct_pooled_reference(spark, sf_dir):
    """The ln-identity form must equal the textbook sample-weighted JS:
    JS_pi = H(pooled) - pi1*H(P) - pi2*H(Q)."""
    from spec_search_spark.operators.corpus_info import (
        JS_A,
        JS_B,
        js_divergence_en_de,
    )

    row = js_divergence_en_de(spark, sf_dir).first()
    counts = _lang_counts(spark, sf_dir, [JS_A, JS_B])
    c1, c2 = counts[JS_A], counts[JS_B]
    n1, n2 = sum(c1.values()), sum(c2.values())
    assert (row["n1"], row["n2"]) == (n1, n2)
    assert row["shared_types"] == len(set(c1) & set(c2))

    def h(cs):
        n = sum(cs.values())
        return -sum((c / n) * math.log(c / n) for c in cs.values())

    pooled: dict = {}
    for t, c in list(c1.items()) + list(c2.items()):
        pooled[t] = pooled.get(t, 0) + c
    n = n1 + n2
    js = h(pooled) - (n1 / n) * h(c1) - (n2 / n) * h(c2)
    assert abs(row["js_nats_6"] - js) < 2e-6
    # bounded by the entropy of the weights (<= ln 2)
    assert -1e-9 <= row["js_nats_6"] <= math.log(2) + 1e-9


def test_vocab_growth_invariants(spark, sf_dir):
    from spec_search_spark.operators.corpus_info import vocab_growth_by_source

    rows = vocab_growth_by_source(spark, sf_dir).collect()
    assert len(rows) == 20
    for r in rows:
        assert 1 <= r["hapax"] or r["hapax"] == 0
        assert r["hapax"] <= r["n_types"] <= r["n_tokens"]
        assert 0.0 < r["ttr_6"] <= 1.0
        assert 0.0 <= r["hapax_share_6"] <= 1.0


def test_containment_is_pair_symmetric_in_counts(spark, sf_dir):
    """n_common must be symmetric (it's an intersection size); the
    ratio is directional by design."""
    from spec_search_spark.operators.corpus_info import (
        source_shingle_containment,
    )

    rows = source_shingle_containment(spark, sf_dir).collect()
    common = {(r["src_a"], r["src_b"]): r["n_common"] for r in rows}
    for (a, b), c in common.items():
        assert common.get((b, a)) == c
    for r in rows:
        assert 0 < r["n_common"] <= r["n_sh_a"]
        assert 0.0 < r["containment_6"] <= 1.0


def test_gini_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.operators.corpus_info import token_gini_by_source

    rows = {r["source"]: r for r in token_gini_by_source(spark, sf_dir).collect()}
    from spec_search_spark.catalog import load_table

    counts: dict = {}
    for source, text in (
        load_table(spark, sf_dir, "documents").select("source", "text").collect()
    ):
        for tok in text.strip().split():
            counts.setdefault(source, {})
            counts[source][tok] = counts[source].get(tok, 0) + 1
    assert set(rows) == set(counts)
    for source, cs in counts.items():
        xs = sorted(cs.values())
        n = len(xs)
        t = sum(xs)
        g = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * t) - (n + 1) / n
        r = rows[source]
        assert (r["n_types"], r["n_tokens"]) == (n, t)
        assert abs(r["gini_6"] - g) < 2e-6
        assert 0.0 <= r["gini_6"] < 1.0


def test_zipf_slope_matches_direct_reference(spark, sf_dir):
    import math

    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.corpus_info import zipf_slope_by_source

    rows = {r["source"]: r for r in zipf_slope_by_source(spark, sf_dir).collect()}
    counts: dict = {}
    for source, text in (
        load_table(spark, sf_dir, "documents").select("source", "text").collect()
    ):
        for tok in text.strip().split():
            counts.setdefault(source, {})
            counts[source][tok] = counts[source].get(tok, 0) + 1
    for source, cs in counts.items():
        # frequency spectrum: m types at count c; descending avg ranks
        spec: dict = {}
        for c in cs.values():
            spec[c] = spec.get(c, 0) + 1
        if len(spec) < 2:
            assert source not in rows
            continue
        pts = []
        cumb = 0
        for c in sorted(spec, reverse=True):
            m = spec[c]
            avg_rank = (2 * cumb + m + 1) / 2
            pts.append((m, math.log(avg_rank), math.log(c)))
            cumb += m
        w = sum(m for m, _, _ in pts)
        sx = sum(m * x for m, x, _ in pts)
        sy = sum(m * y for m, _, y in pts)
        sxx = sum(m * x * x for m, x, _ in pts)
        sxy = sum(m * x * y for m, x, y in pts)
        slope = (w * sxy - sx * sy) / (w * sxx - sx * sx)
        r = rows[source]
        assert r["n_types"] == w
        assert r["n_freq_levels"] == len(spec)
        assert abs(r["zipf_slope_6"] - slope) < 5e-6
        assert r["zipf_slope_6"] < 0  # frequency falls with rank


def test_decision_stump_is_the_true_argmin(spark, sf_dir):
    """Exhaustive pure-Python re-search over the identical binned
    candidate space must reproduce the chosen split and its counts."""
    from spec_search_spark.catalog import load_table
    from spec_search_spark.functions.text import STOPWORDS
    from spec_search_spark.operators.ml import (
        STUMP_BINS,
        STUMP_LANG,
        decision_stump_lang,
    )
    import re

    row = decision_stump_lang(spark, sf_dir).first()

    feats = []
    for lang, text, n_chars in (
        load_table(spark, sf_dir, "documents")
        .select("lang", "text", "n_chars")
        .collect()
    ):
        y = 1 if lang == STUMP_LANG else 0
        n_tok = len(text.strip().split()) if text.strip() else 0
        low = text.lower()
        n_stop = sum(len(re.findall(rf"\b{w}\b", low)) for w in STOPWORDS)
        feats.append((y, {"n_chars": n_chars, "n_tok": n_tok, "n_stop": n_stop}))

    best = None
    for feature in ("n_chars", "n_tok", "n_stop"):
        vs = [f[feature] for _, f in feats]
        lo, hi = min(vs), max(vs)
        bins = [[0, 0] for _ in range(STUMP_BINS)]
        for y, f in feats:
            b = min(STUMP_BINS - 1, (f[feature] - lo) * STUMP_BINS // (hi - lo + 1))
            bins[b][0] += 1
            bins[b][1] += y
        nn = sum(b[0] for b in bins)
        pp = sum(b[1] for b in bins)
        nl = pl = 0
        for b in range(STUMP_BINS):
            nl += bins[b][0]
            pl += bins[b][1]
            nr, pr = nn - nl, pp - pl
            if nl == 0 or nr == 0:
                continue
            gini = (
                nl
                - (pl * pl + (nl - pl) * (nl - pl)) / nl
                + nr
                - (pr * pr + (nr - pr) * (nr - pr)) / nr
            ) / nn
            g_n = round(gini * 1_000_000_000)
            key = (g_n, feature, b)
            if best is None or key < best[0]:
                best = (key, nl, pl, nr, pr)
    (g_n, feature, b), nl, pl, nr, pr = best
    assert (row["feature"], row["bin"]) == (feature, b)
    assert (row["n_left"], row["pos_left"]) == (nl, pl)
    assert (row["n_right"], row["pos_right"]) == (nr, pr)
    assert abs(row["gini_6"] - g_n / 1e9) < 2e-6
    # a split must beat or match the root's impurity on training data
    n_all = nl + nr
    p_all = pl + pr
    root = 1 - (p_all / n_all) ** 2 - ((n_all - p_all) / n_all) ** 2
    assert row["gini_6"] <= root + 1e-9


def test_partitioned_scan_prunes_at_the_directory_level(spark, sf_dir):
    """The partitioned copy must answer identically to the raw table
    AND carry the predicate as a PartitionFilter (no full-table read)."""
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.layout import (
        PRUNE_LANG,
        partitioned_scan_prune,
    )
    from spec_search_spark.plans.audit import plan_of
    from pyspark.sql import functions as F

    df = partitioned_scan_prune(spark, sf_dir)
    row = df.first()
    raw = (
        load_table(spark, sf_dir, "documents")
        .filter(F.col("lang") == PRUNE_LANG)
        .agg(
            F.count(F.lit(1)),
            F.sum("n_chars"),
            F.countDistinct("source"),
        )
        .first()
    )
    assert (row["n_docs"], row["n_chars_total"], row["n_sources"]) == tuple(raw)
    plan = plan_of(df)
    assert "PartitionFilters: [isnotnull(lang" in plan


def test_token_lang_mi_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.operators.corpus_info import token_lang_mi

    row = token_lang_mi(spark, sf_dir).first()
    counts = _lang_counts(spark, sf_dir)
    ct: dict = {}
    cg: dict = {}
    nn = 0
    cells = 0
    for lang, cs in counts.items():
        for t, c in cs.items():
            ct[t] = ct.get(t, 0) + c
            cg[lang] = cg.get(lang, 0) + c
            nn += c
            cells += 1
    mi = sum(
        (c / nn) * math.log(c * nn / (ct[t] * cg[lang]))
        for lang, cs in counts.items()
        for t, c in cs.items()
    )
    assert (row["n_tokens"], row["n_cells"]) == (nn, cells)
    assert abs(row["mi_nats_6"] - mi) < 2e-6
    # MI is bounded by the lang-marginal entropy
    hg = -sum((c / nn) * math.log(c / nn) for c in cg.values())
    assert -1e-9 <= row["mi_nats_6"] <= hg + 1e-9


def test_label_centroid_similarity_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.corpus_info import (
        CENTROID_SCALE,
        label_centroid_similarity,
    )

    rows = {
        (r["la"], r["lb"]): r["cos_6"]
        for r in label_centroid_similarity(spark, sf_dir).collect()
    }

    def round_half_away(x):  # SQL round, not Python's banker's round
        return int(math.copysign(math.floor(abs(x) + 0.5), x))

    sums: dict = {}
    ns: dict = {}
    for label, emb in (
        load_table(spark, sf_dir, "embeddings").select("label", "embedding").collect()
    ):
        xi = [round_half_away(float(x) * CENTROID_SCALE) for x in emb]
        if label not in sums:
            sums[label] = [0] * len(xi)
        ns[label] = ns.get(label, 0) + 1
        for i, v in enumerate(xi):
            sums[label][i] += v
    cent = {
        lb: [round_half_away(s / ns[lb]) for s in arr] for lb, arr in sums.items()
    }
    labels = sorted(cent)
    assert len(rows) == len(labels) * (len(labels) - 1) // 2
    for i, la in enumerate(labels):
        for lb in labels[i + 1 :]:
            dot = sum(a * b for a, b in zip(cent[la], cent[lb]))
            na2 = sum(a * a for a in cent[la])
            nb2 = sum(b * b for b in cent[lb])
            cos = dot / math.sqrt(na2 * nb2)
            assert abs(rows[(la, lb)] - cos) < 2e-6
            assert -1.0 <= rows[(la, lb)] <= 1.0


def test_kruskal_wallis_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.operators.rank_stats import (
        CHI2_CRIT_DF4,
        KW_GROUPS,
        kruskal_wallis_priority,
    )

    row = kruskal_wallis_priority(spark, sf_dir).first()
    samples = {g: _collect_cents(spark, sf_dir, g) for g in KW_GROUPS}
    n = sum(len(s) for s in samples.values())
    assert row["n"] == n
    for j, g in enumerate(KW_GROUPS, start=1):
        assert row[f"n{j}"] == len(samples[g])

    ranks = _avg_ranks([v for s in samples.values() for v in s])
    # tie term over the pooled sample
    from collections import Counter

    cnt = Counter(v for s in samples.values() for v in s)
    tie3 = sum(c**3 - c for c in cnt.values())
    h = (
        12 / (n * (n + 1))
        * sum(
            sum(ranks[v] for v in s) ** 2 / len(s)
            for s in samples.values()
        )
        - 3 * (n + 1)
    ) / (1 - tie3 / (n**3 - n))
    assert abs(row["h_6"] - h) < 2e-6
    assert row["reject_05"] == (h > CHI2_CRIT_DF4)


def test_cochran_armitage_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.rank_stats import (
        KW_GROUPS,
        cochran_armitage_trend,
    )

    row = cochran_armitage_trend(spark, sf_dir).first()
    data = [
        (KW_GROUPS.index(r[0]) + 1, 1 if r[1] == "F" else 0)
        for r in load_table(spark, sf_dir, "orders")
        .select("o_orderpriority", "o_orderstatus")
        .collect()
    ]
    n = len(data)
    rr = sum(y for _, y in data)
    swn = sum(w for w, _ in data)
    swr = sum(w * y for w, y in data)
    sww = sum(w * w for w, _ in data)
    assert (row["n"], row["n_events"]) == (n, rr)
    t = swr - rr * swn / n
    var = (rr / n) * (1 - rr / n) * (sww - swn * swn / n)
    z = t / math.sqrt(var)
    assert abs(row["z_6"] - z) < 2e-6
    assert row["reject_05"] == (abs(z) > 1.959964)


def test_grouped_mad_doclen_matches_direct_reference(spark, sf_dir):
    from collections import defaultdict

    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.rank_stats import (
        MAD_K,
        grouped_mad_doclen,
    )

    rows = {r["lang"]: r for r in grouped_mad_doclen(spark, sf_dir).collect()}
    per_lang = defaultdict(list)
    for r in (
        load_table(spark, sf_dir, "documents").select("lang", "n_chars").collect()
    ):
        per_lang[r[0]].append(r[1])
    assert set(rows) == set(per_lang)

    def lower_median(xs):
        s = sorted(xs)
        return s[(len(s) + 1) // 2 - 1]

    for lang, xs in per_lang.items():
        r = rows[lang]
        med = lower_median(xs)
        mad = lower_median([abs(x - med) for x in xs])
        thr = int(math.copysign(math.floor(abs(MAD_K * mad) + 0.5), 1))
        n_out = sum(1 for x in xs if abs(x - med) > thr)
        assert (r["n_docs"], r["med_chars"], r["mad_chars"]) == (
            len(xs), med, mad,
        )
        assert (r["thr_chars"], r["n_outliers"]) == (thr, n_out)
        assert abs(r["outlier_share_6"] - n_out / len(xs)) < 1e-6


def test_median_ci_matches_direct_reference(spark, sf_dir):
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.rank_stats import (
        Z_CRIT,
        median_ci_orders,
    )
    from pyspark.sql import functions as F

    row = median_ci_orders(spark, sf_dir).first()
    xs = sorted(
        r[0]
        for r in load_table(spark, sf_dir, "orders")
        .select(F.expr("cast(round(o_totalprice * 100) as bigint)"))
        .collect()
    )
    n = len(xs)
    assert row["n"] == n
    assert row["median_cents"] == xs[(n + 1) // 2 - 1]
    k_lo = max(1, math.floor((n - Z_CRIT * math.sqrt(n)) / 2))
    k_hi = min(n, math.ceil((n + Z_CRIT * math.sqrt(n)) / 2) + 1)
    assert row["ci_lo_cents"] == xs[k_lo - 1]
    assert row["ci_hi_cents"] == xs[k_hi - 1]
    assert row["ci_lo_cents"] <= row["median_cents"] <= row["ci_hi_cents"]


def test_quantile_normalize_is_rank_preserving_and_pooled(spark, sf_dir):
    from pyspark.sql import functions as F

    from spec_search_spark.operators.rank_stats import quantile_normalize_scores

    out = quantile_normalize_scores(spark, sf_dir)
    rows = out.collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert len(rows) == docs_n
    # within a source, normalization preserves the score order
    by_src: dict = {}
    for r in rows:
        by_src.setdefault(r.source, []).append(r)
    for src, rs in by_src.items():
        rs.sort(key=lambda r: (r.score, r.doc_id))
        norms = [r.norm_score for r in rs]
        assert norms == sorted(norms), src
    # the top-ranked doc of every source maps to the pooled maximum
    pooled_max = max(r.score for r in rows)
    for src, rs in by_src.items():
        assert rs[-1].norm_score == pooled_max, src


def test_hourly_percentiles_match_brute_force(spark, sf_dir):
    from spec_search_spark.operators.rank_stats import hourly_value_percentiles

    got = {r.hod: r for r in hourly_value_percentiles(spark, sf_dir).collect()}
    rows = (
        spark.read.parquet(f"{sf_dir}/events.parquet")
        .selectExpr("hour(ts) as hod", "cast(round(value * 100) as bigint) as v")
        .collect()
    )
    by_h: dict = {}
    for r in rows:
        by_h.setdefault(r.hod, []).append(r.v)
    for hod, vs in by_h.items():
        vs.sort()
        n = len(vs)
        assert got[hod].n == n
        assert got[hod].p50_cents == vs[(n + 1) // 2 - 1], hod
        assert got[hod].p90_cents == vs[(9 * n + 9) // 10 - 1], hod
        assert got[hod].p50_cents <= got[hod].p90_cents
