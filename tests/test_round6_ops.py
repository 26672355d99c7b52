"""Semantic invariants for the round-6 operators (value parity vs the
DuckDB oracles is covered by tools/selfcheck.py): weighted multiset
Jaccard, RAKE keywords, k-core peel, split-conformal intervals, and the
skew-proof stratified sample rewrite."""

from __future__ import annotations

import math
import re
from collections import Counter

from pyspark.sql import functions as F

from spec_search_spark.functions.text import STOPWORDS
from spec_search_spark.operators import graph as g
from spec_search_spark.operators.dedup import (
    minhash_lsh_candidates,
    weighted_jaccard_pairs,
)


# --- weighted (multiset) Jaccard --------------------------------------------


def test_weighted_jaccard_bounds_and_identity(spark, sf_dir):
    rows = weighted_jaccard_pairs(spark, sf_dir).collect()
    assert rows
    cand = {
        (r.doc1, r.doc2)
        for r in minhash_lsh_candidates(spark, sf_dir).collect()
    }
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }
    for r in rows:
        # refinement never invents pairs: candidates only
        assert (r.doc1, r.doc2) in cand
        # integer skeleton: Σmin ≤ min(tot1, tot2); union = t1+t2−Σmin > 0
        assert 0 <= r.sum_min <= min(r.tot1, r.tot2)
        union = r.tot1 + r.tot2 - r.sum_min
        assert union > 0
        assert math.isclose(r.wjaccard, round(r.sum_min / union, 4))
        assert 0.0 <= r.wjaccard <= 1.0
        if texts[r.doc1].split() == texts[r.doc2].split():
            # identical token streams (none at sf0.001, guarded): full
            # mass overlap — the brute-force twin below pins the rest
            assert r.wjaccard == 1.0


def test_weighted_jaccard_matches_python_multiset(spark, sf_dir):
    """Brute-force the multiset Jaccard over the SAME capped shingle
    support set (the postings table defines which shingles count)."""
    from spec_search_spark.operators.dedup import hashed_shingle_postings

    support: dict[int, set[str]] = {}
    for r in hashed_shingle_postings(spark, sf_dir).collect():
        support.setdefault(r.doc_id, set()).add(r.shingle)
    texts = {
        r.doc_id: r.text
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    }

    def bag(doc_id: int) -> Counter:
        toks = texts[doc_id].split()
        grams = [
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        ]
        return Counter(
            s for s in grams if s in support.get(doc_id, set())
        )

    for r in weighted_jaccard_pairs(spark, sf_dir).collect():
        b1, b2 = bag(r.doc1), bag(r.doc2)
        sum_min = sum(min(b1[s], b2[s]) for s in b1.keys() & b2.keys())
        assert r.sum_min == sum_min
        assert r.tot1 == sum(b1.values())
        assert r.tot2 == sum(b2.values())


# --- RAKE keywords -----------------------------------------------------------


def test_rake_keywords_shape_and_score_floor(spark, sf_dir):
    from spec_search_spark.operators.text_analysis import (
        RAKE_TOP,
        rake_keywords,
    )

    rows = rake_keywords(spark, sf_dir).collect()
    assert len(rows) == RAKE_TOP
    stop = set(STOPWORDS)
    prev = None
    for r in rows:
        assert r.phrase and re.fullmatch(r"[a-z0-9]+( [a-z0-9]+)*", r.phrase)
        # candidate phrases are maximal non-stopword runs
        assert not (set(r.phrase.split()) & stop)
        assert r.n >= 1
        # deg(w) ≥ freq(w) (every occurrence sits in a phrase of len ≥ 1)
        # ⇒ ratio-of-sums score ≥ 1
        assert r.score >= 1.0
        # output ordering contract: (score desc, n desc, phrase asc)
        if prev is not None:
            assert (-r.score, -r.n, r.phrase) >= (-prev.score, -prev.n, prev.phrase)
        prev = r


def test_rake_matches_python_reference(spark, sf_dir):
    """Full independent python RAKE (ratio-of-sums variant) over the
    fixture corpus; compares the top-K table exactly."""
    from spec_search_spark.operators.text_analysis import (
        RAKE_TOP,
        rake_keywords,
    )

    stop = set(STOPWORDS)
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .collect()
    )
    phrases: list[tuple[int, list[str]]] = []  # (doc_id, words)
    for d in docs:
        run: list[str] = []
        for tok in d.text.split():
            w = re.sub(r"[^a-z0-9]", "", tok.lower())
            if not w or w in stop:
                if run:
                    phrases.append((d.doc_id, run))
                    run = []
            else:
                run.append(w)
        if run:
            phrases.append((d.doc_id, run))
    freq: Counter = Counter()
    deg: Counter = Counter()
    for _, ws in phrases:
        for w in ws:
            freq[w] += 1
            deg[w] += len(ws)
    scored: dict[str, list] = {}
    for _, ws in phrases:
        p = " ".join(ws)
        s = round(sum(deg[w] for w in ws) / sum(freq[w] for w in ws), 4)
        if p not in scored:
            scored[p] = [0, s]
        scored[p][0] += 1
        scored[p][1] = max(scored[p][1], s)
    want = sorted(
        ((p, n, s) for p, (n, s) in scored.items()),
        key=lambda t: (-t[2], -t[1], t[0]),
    )[:RAKE_TOP]
    got = [
        (r.phrase, r.n, r.score)
        for r in rake_keywords(spark, sf_dir).collect()
    ]
    assert got == want


# --- k-core decomposition ----------------------------------------------------


def test_kcore_matches_python_peel(spark, sf_dir):
    edges = [
        (r.a, r.b) for r in g._edges_deg(spark, sf_dir)[0].collect()
    ]
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
    alive = {v for v, ns in nbrs.items() if len(ns) >= g.K_CORE}
    for _ in range(g.KC_ITERS):
        alive = {
            v
            for v in alive
            if len(nbrs.get(v, set()) & alive) >= g.K_CORE
        }
    want = sorted(
        (v, len(nbrs[v] & alive)) for v in alive
    )
    got = [
        (r.doc_id, r.core_deg)
        for r in g.kcore_decomposition(spark, sf_dir).collect()
    ]
    assert got == want


def test_kcore_subset_of_min_degree_vertices(spark, sf_dir):
    core = g.kcore_decomposition(spark, sf_dir).collect()
    _, deg = g._edges_deg(spark, sf_dir)
    full_deg = {r.doc_id: r.deg for r in deg.collect()}
    for r in core:
        # in-core degree never exceeds full-graph degree, and survivors
        # meet the threshold against the FINAL survivor set
        assert g.K_CORE <= r.core_deg <= full_deg[r.doc_id]


# --- split-conformal interval ------------------------------------------------


def test_conformal_interval_contract(spark, sf_dir):
    from spec_search_spark.operators.ml import (
        CONF_COV_DEN,
        CONF_COV_NUM,
        conformal_interval_orders,
    )

    row = conformal_interval_orders(spark, sf_dir).collect()[0]
    n_li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").count()
    assert row.n_train + row.n_calib == n_li
    assert row.n_calib > 0 and row.n_train > row.n_calib  # ~80/20 hash split
    # k = ⌈(1−α)(n+1)⌉ with α = 1 − NUM/DEN
    k_want = -(-(CONF_COV_NUM * (row.n_calib + 1)) // CONF_COV_DEN)
    assert row.k == k_want
    assert row.qhat_r8 >= 0
    # the defining conformal guarantee, exact on the calibration fold
    assert row.coverage_calib >= CONF_COV_NUM / CONF_COV_DEN


def test_conformal_qhat_is_kth_order_statistic(spark, sf_dir):
    """Recompute the calibration residuals in python from the snapped
    β and check q̂ is exactly the k-th smallest |residual|."""
    from spec_search_spark.operators.ml import (
        CONF_SPLIT_MOD,
        conformal_interval_orders,
    )
    from spec_search_spark.operators.dedup import _poly_hash

    row = conformal_interval_orders(spark, sf_dir).collect()[0]
    li = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .select(
            F.pmod(
                _poly_hash(
                    F.concat(
                        F.lit("conf:"),
                        F.col("l_orderkey").cast("string"),
                        F.lit(":"),
                        F.col("l_linenumber").cast("string"),
                    )
                ),
                F.lit(CONF_SPLIT_MOD),
            ).alias("fold"),
            F.expr("cast(round(l_quantity * 100) as bigint)").alias("q100"),
            F.expr("cast(round(l_discount * 100) as bigint)").alias("d100"),
            F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("p100"),
        )
        .collect()
    )
    resid = sorted(
        abs(
            r.p100 * 1_000_000
            - row.b0m * 100
            - row.b1m * r.q100
            - row.b2m * r.d100
        )
        for r in li
        if r.fold == 0
    )
    assert row.n_calib == len(resid)
    assert row.qhat_r8 == resid[row.k - 1]


# --- skew-proof stratified sample -------------------------------------------


def test_stratified_sample_exact_per_source_cutoff(spark, sf_dir):
    """The bucketed rank must reproduce the exact per-source top-1/5 by
    (quality desc, doc_id) — brute-forced from the scored table."""
    from spec_search_spark.functions.text import quality_score
    from spec_search_spark.operators.text_analysis import (
        KEEP_PCT_DEN,
        KEEP_PCT_NUM,
        stratified_quality_sample,
    )

    scored = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(
            "doc_id", "source", quality_score(F.col("text")).alias("quality")
        )
        .collect()
    )
    by_src: dict[str, list] = {}
    for r in scored:
        by_src.setdefault(r.source, []).append((-r.quality, r.doc_id))
    want = set()
    for src, items in by_src.items():
        items.sort()
        keep = (KEEP_PCT_NUM * len(items) + KEEP_PCT_DEN - 1) // KEEP_PCT_DEN
        want |= {(src, doc) for _, doc in items[:keep]}
    got = {
        (r.source, r.doc_id)
        for r in stratified_quality_sample(spark, sf_dir).collect()
    }
    assert got == want
