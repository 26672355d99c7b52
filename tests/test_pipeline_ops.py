"""Semantic invariants for the training-pipeline pack (value-level
parity is covered by tools/selfcheck.py oracles; these pin the
properties the oracle comparison alone wouldn't explain)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spec_search_spark.operators import pipeline_ops as po


def test_decontaminate_excludes_benchmark_and_flags_consistently(spark, sf_dir):
    out = po.decontaminate(spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    bench_ids = {r.doc_id for r in out} & {
        i for i in range(docs_n * 100) if i % po.CONTAM_BENCH_MOD == po.CONTAM_BENCH_REM
    }
    # benchmark docs never appear in the train verdict set
    assert not any(
        r.doc_id % po.CONTAM_BENCH_MOD == po.CONTAM_BENCH_REM for r in out
    ), bench_ids
    # the flag is exactly the threshold rule, and both classes occur
    assert all(r.contaminated == (r.n_overlap >= po.CONTAM_MIN_OVERLAP) for r in out)
    flags = {r.contaminated for r in out}
    assert flags == {True, False}


def test_dedup_survivors_partition_docs(spark, sf_dir):
    surv = po.dedup_survivors(spark, sf_dir)
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    agg = surv.agg(
        F.sum("n_members").alias("members"), F.count(F.lit(1)).alias("n_clusters")
    ).first()
    # every doc belongs to exactly one cluster; clusters are non-trivial
    assert agg.members == docs_n
    assert 0 < agg.n_clusters <= docs_n
    # canonical ids are cluster minima: no survivor is a member elsewhere
    assert surv.filter(F.col("n_members") < 1).count() == 0


def test_repetition_filters_verdict_rule(spark, sf_dir):
    out = po.repetition_filters(spark, sf_dir).collect()
    for r in out:
        assert 0.0 <= r.distinct_ratio <= 1.0
        assert 0.0 <= r.top_bigram_frac <= 1.0
        assert r.keep == (
            r.top_bigram_frac <= po.TOP_BIGRAM_MAX
            and r.distinct_ratio >= po.DISTINCT_RATIO_MIN
        )


def test_hash_split_report_partitions_corpus(spark, sf_dir):
    out = po.hash_split_report(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    assert out.agg(F.sum("n_docs")).first()[0] == docs.count()
    splits = {r.split for r in out.select("split").distinct().collect()}
    assert splits == {"train", "val"}
    # deterministic: a second run assigns identically
    a = {(r.source, r.split): r.n_docs for r in out.collect()}
    b = {
        (r.source, r.split): r.n_docs
        for r in po.hash_split_report(spark, sf_dir).collect()
    }
    assert a == b


def test_tfidf_topk_shape_and_order(spark, sf_dir):
    out = po.tfidf_top_terms(spark, sf_dir).collect()
    by_doc: dict = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    for rows in by_doc.values():
        rows.sort(key=lambda r: r.rnk)
        assert [r.rnk for r in rows] == list(range(1, len(rows) + 1))
        assert len(rows) <= po.TFIDF_TOP_K
        # scores non-increasing with rank
        scores = [r.score for r in rows]
        assert scores == sorted(scores, reverse=True)


def test_token_pack_blocks_conserve_tokens(spark, sf_dir):
    out = po.token_pack_blocks(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    total = out.agg(F.sum("block_tokens")).first()[0]
    expect = docs.select(
        F.sum(po._token_count(F.col("text"))).alias("t")
    ).first()[0]
    assert total == expect
    # blocks start at 0 per source
    assert out.groupBy("source").agg(F.min("block_id").alias("m")).filter(
        F.col("m") != 0
    ).count() == 0
    # a doc lands in block b iff its exclusive prefix sum is in
    # [B*b, B*(b+1)): so the tokens BEFORE block b total >= B*b
    rows = sorted(out.collect(), key=lambda r: (r.source, r.block_id))
    prefix: dict = {}
    for r in rows:
        before = prefix.get(r.source, 0)
        if r.block_id > 0:
            assert before >= po.PACK_BUDGET * r.block_id, (r.source, r.block_id)
            assert before < po.PACK_BUDGET * (r.block_id + 1)
        prefix[r.source] = before + r.block_tokens


def test_weighted_sample_respects_weights(spark, sf_dir):
    weights = {r.source: r.weight for r in po.source_mix_weights(spark, sf_dir).collect()}
    out = po.weighted_sample(spark, sf_dir).collect()
    for r in out:
        assert 0 <= r.n_kept <= r.n_total
        if weights[r.source] == 1.0:
            assert r.n_kept == r.n_total, r.source


def test_normalize_text_idempotent(spark, sf_dir):
    # normalizing already-normalized text is a fixed point: re-apply
    # the same expressions to a normalized projection and compare fps
    from pyspark.sql import functions as F2
    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.dedup import _poly_hash

    docs = load_table(spark, sf_dir, "documents")
    norm = F2.trim(
        F2.regexp_replace(
            F2.regexp_replace(F2.lower(F2.col("text")), "[^a-z0-9 ]", ""), " +", " "
        )
    )
    once = docs.select("doc_id", norm.alias("text"))
    twice = once.select("doc_id", norm.alias("text"))
    a = {r.doc_id: r.fp for r in once.select("doc_id", _poly_hash("text").alias("fp")).collect()}
    b = {r.doc_id: r.fp for r in twice.select("doc_id", _poly_hash("text").alias("fp")).collect()}
    assert a == b


def test_training_pipeline_funnel_monotone(spark, sf_dir):
    out = po.training_pipeline_e2e(spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_raw for r in out) == docs_n
    for r in out:
        assert (
            r.n_raw >= r.n_quality >= r.n_canonical >= r.n_clean
            >= r.n_train >= r.n_final >= 0
        ), r
        if r.n_final == 0:
            assert r.tokens_final == 0


def test_source_mix_weights_bounds(spark, sf_dir):
    out = po.source_mix_weights(spark, sf_dir).collect()
    assert all(0.0 < r.weight <= 1.0 for r in out)
    # sources at or below the uniform share keep everything
    target = sum(r.src_tokens for r in out) / len(out)
    for r in out:
        if r.src_tokens <= target:
            assert r.weight == 1.0


def test_containment_is_asymmetric_and_thresholded(spark, sf_dir):
    """Containment pairs: bench side only bench docs, train side only
    train docs, values in [tau, 1], and the measure is strictly more
    sensitive than symmetric Jaccard for the pairs it reports —
    containment >= Jaccard always, since |B∩T|/|B| >= |B∩T|/|B∪T|."""
    out = po.contamination_containment(spark, sf_dir).collect()
    assert out, "the near-dup corpus must produce at least one pair"
    for r in out:
        assert r.bench_doc % po.CONTAM_BENCH_MOD == po.CONTAM_BENCH_REM
        assert r.train_doc % po.CONTAM_BENCH_MOD != po.CONTAM_BENCH_REM
        assert po.CONTAIN_TAU <= r.containment <= 1.0
    # cross-check against the symmetric strict-Jaccard pairs: any
    # (bench, train) pair both report must satisfy jaccard <= containment
    from spec_search_spark.operators.dedup import ngram_jaccard_pairs

    jac = {
        (min(r.doc1, r.doc2), max(r.doc1, r.doc2)): r.jaccard
        for r in ngram_jaccard_pairs(spark, sf_dir).collect()
    }
    cont = {
        (min(r.bench_doc, r.train_doc), max(r.bench_doc, r.train_doc)): r.containment
        for r in out
    }
    shared = set(jac) & set(cont)
    assert all(jac[p] <= cont[p] + 1e-9 for p in shared)


def test_leakage_safe_split_never_splits_a_cluster(spark, sf_dir):
    """The invariant the operator exists for: every near-dup cluster
    lands wholly in train or wholly in val — recomputed per-doc, not
    from the aggregated report."""
    from spec_search_spark.operators.dedup import _poly_hash, dedup_clusters

    cl = dedup_clusters(spark, sf_dir).select("doc_id", "cluster_id")
    h = _poly_hash(F.concat(F.lit("split:"), F.col("cluster_id").cast("string")))
    split = F.when(
        F.pmod(h, F.lit(po.SPLIT_BUCKETS)) < po.TRAIN_CUT, F.lit("train")
    ).otherwise(F.lit("val"))
    per_cluster = (
        cl.select("cluster_id", split.alias("split"))
        .groupBy("cluster_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .agg(F.max("n_splits").alias("mx"))
        .collect()[0]
    )
    assert per_cluster.mx == 1
    # and the aggregated report accounts for every document exactly once
    rep = po.leakage_safe_split(spark, sf_dir).collect()
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert sum(r.n_docs for r in rep) == docs_n


def test_weighted_reservoir_is_exact_size_and_length_biased(spark, sf_dir):
    """A-ES with weight = token count must return exactly k docs and a
    sample whose mean token count exceeds the corpus mean (long docs
    are proportionally more likely to be drawn)."""
    out = po.weighted_reservoir_sample(spark, sf_dir).collect()
    assert len(out) == po.WRS_K
    assert len({r.doc_id for r in out}) == po.WRS_K  # without replacement
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus_mean = (
        docs.select(F.size(F.split(F.trim("text"), r"\s+")).alias("nt"))
        .agg(F.avg("nt"))
        .collect()[0][0]
    )
    sample_mean = sum(r.n_tokens for r in out) / len(out)
    assert sample_mean > corpus_mean


def test_target_encoding_is_out_of_fold_exact(spark, sf_dir):
    # reconstruct each (source, fold) encoding from raw per-fold counts
    # in exact Python arithmetic: the operator's value must equal the
    # leave-this-fold-out smoothed mean, proving no own-fold leakage
    from pyspark.sql import functions as F

    from spec_search_spark.catalog import load_table
    from spec_search_spark.operators.dedup import _poly_hash
    from spec_search_spark.operators.pipeline_ops import (
        TE_ALPHA,
        TE_FOLDS,
        TE_LABEL_CHARS,
        target_encoding_oof,
    )

    docs = load_table(spark, sf_dir, "documents")
    fold = F.pmod(
        _poly_hash(F.concat(F.lit("te:"), F.col("doc_id").cast("string"))),
        F.lit(TE_FOLDS),
    )
    raw = (
        docs.select(
            "source",
            fold.alias("fold"),
            (F.col("n_chars") >= TE_LABEL_CHARS).cast("int").alias("y"),
        )
        .groupBy("source", "fold")
        .agg(F.count("*").alias("n"), F.sum("y").alias("s"))
        .collect()
    )
    n = {(r["source"], r["fold"]): r["n"] for r in raw}
    s = {(r["source"], r["fold"]): r["s"] for r in raw}
    n_src = {}
    s_src = {}
    for (src, f), v in n.items():
        n_src[src] = n_src.get(src, 0) + v
        s_src[src] = s_src.get(src, 0) + s[(src, f)]
    n_g, s_g = sum(n_src.values()), sum(s_src.values())
    for r in target_encoding_oof(spark, sf_dir).collect():
        key = (r["source"], r["fold"])
        expect = (
            s_src[r["source"]] - s[key] + TE_ALPHA * (s_g / n_g)
        ) / (n_src[r["source"]] - n[key] + TE_ALPHA)
        assert abs(r["encoding"] - round(expect, 6)) < 1e-9, key


def test_quality_funnel_first_fail_partitions_corpus(spark, sf_dir):
    out = po.quality_funnel_report(spark, sf_dir)
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # first-fail attribution: per-gate counts partition every document
    assert out.agg(F.sum("n_docs")).first()[0] == docs.count()
    stages = {r.stage for r in out.select("stage").distinct().collect()}
    assert stages <= {"len", "ntok", "wordlen", "stop", "rep", "pass"}
    assert "pass" in stages  # the funnel keeps something
    assert stages - {"pass"}  # ... and rejects something
    # shares sum to ~1 per source (snapped to the 1e-6 grid)
    per_src = out.groupBy("source").agg(F.sum("share").alias("s")).collect()
    assert all(abs(r.s - 1.0) < 5e-6 for r in per_src)


def test_quality_funnel_stage_order_is_first_fail(spark, sf_dir):
    # a doc failing the length gate must never be charged downstream:
    # recompute gate 1 directly and compare the 'len' count
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_short = docs.filter(F.col("n_chars") < po.FUNNEL_MIN_CHARS).count()
    out = po.quality_funnel_report(spark, sf_dir)
    got = (
        out.filter(F.col("stage") == "len").agg(F.sum("n_docs")).first()[0] or 0
    )
    assert got == n_short


def test_stream_quality_funnel_equals_batch(spark, sf_dir):
    from spec_search_spark.streaming.incremental import stream_quality_funnel_query

    batch = {
        (r.source, r.stage): (r.n_docs, r.share)
        for r in po.quality_funnel_report(spark, sf_dir).collect()
    }
    stream = {
        (r.source, r.stage): (r.n_docs, r.share)
        for r in stream_quality_funnel_query(spark, sf_dir).collect()
    }
    # the drained (source, stage) state scores identically to batch
    assert stream == batch


def _write_docs(tmp_path, rows):
    """rows: (doc_id, text). Single-file documents parquet readable by
    both engines (the test_behavior3 _write_events pattern)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    table = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array(["en"] * len(rows), pa.string()),
            "source": pa.array(["src0"] * len(rows), pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_quality_funnel_wordlen_gate_fires_on_fixture(spark, tmp_path):
    """The shipped corpus never trips the mean-word-length gate (word
    soup averages ~4.2 chars inside [3, 10]) — synthetic docs with
    1-char and 30-char words prove the gate and its first-fail
    ordering, and the DuckDB oracle must agree on the fixture."""
    import duckdb

    from spec_search_spark.operators.pipeline_ops import (
        QUALITY_FUNNEL_SQL,
        quality_funnel_report,
    )

    short_words = "b " * 60            # 60 tokens of len 1 -> mean 1 < 3
    long_words = ("x" * 30 + " ") * 25  # 25 tokens of len 30 -> mean 30 > 10
    passing = "the a " + " ".join(f"word{i:02d}" for i in range(38))
    sf = _write_docs(
        tmp_path,
        [(1, short_words.strip()), (2, long_words.strip()), (3, passing.strip())],
    )
    got = {
        (r.source, r.stage): r.n_docs
        for r in quality_funnel_report(spark, sf).collect()
    }
    assert got[("src0", "wordlen")] == 2  # both extremes charged HERE
    assert got[("src0", "pass")] == 1
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    oracle = {
        (r[0], r[1]): r[2] for r in con.sql(QUALITY_FUNNEL_SQL).fetchall()
    }
    assert oracle == got


def test_corpus_build_funnel_invariants(spark, sf_dir):
    """The composed funnel is monotone (each stage's survivors are a
    subset of the previous stage's, per source, docs AND tokens) and
    the shard stage is exactly balanced (|max - min| <= 1 docs) and
    conserves the mix_sample survivors."""
    from collections import defaultdict

    from spec_search_spark.operators.corpus_build import corpus_build_pipeline

    rows = corpus_build_pipeline(spark, sf_dir).collect()
    by_stage = defaultdict(dict)
    for r in rows:
        by_stage[r["stage_idx"]][r["grp"]] = (r["docs"], r["tokens"])
    for i in range(1, 6):
        for grp, (d, t) in by_stage[i].items():
            pd, pt = by_stage[i - 1][grp]
            assert d <= pd and t <= pt, (i, grp, d, pd, t, pt)
    shard_docs = [d for d, _t in by_stage[6].values()]
    final_docs = sum(d for d, _t in by_stage[5].values())
    final_toks = sum(t for _d, t in by_stage[5].values())
    assert sum(shard_docs) == final_docs
    assert sum(t for _d, t in by_stage[6].values()) == final_toks
    if shard_docs:
        assert max(shard_docs) - min(shard_docs) <= 1, shard_docs
