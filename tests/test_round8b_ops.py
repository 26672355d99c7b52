"""Round-8 ops: winnowing fingerprints (guarantee property + python
reference) and MMR diversified retrieval (greedy reference)."""

from __future__ import annotations

from spec_search_spark.functions.text import FP_BASE, FP_MOD
from spec_search_spark.operators.winnowing import K, W, winnow


def _poly(s: str) -> int:
    acc = 0
    for ch in s:
        acc = (acc * FP_BASE + ord(ch)) % FP_MOD
    return acc


def _winnow_ref(t: str) -> set[int]:
    """Straight-from-the-paper reference: for every full window of W
    k-gram hashes pick the min (rightmost on ties); return the
    selected hash set."""
    hs = [_poly(t[i : i + K]) for i in range(len(t) - K + 1)]
    sel = set()
    for e in range(W - 1, len(hs)):
        win = hs[e - W + 1 : e + 1]
        m = min(win)
        # rightmost occurrence of the min within the window
        idx = max(i for i, h in enumerate(win) if h == m)
        sel.add((e - W + 1 + idx, m))
    return {h for _pos, h in sel}


def _run(spark, texts):
    docs = spark.createDataFrame(
        [(i, "s", t) for i, t in enumerate(texts)],
        "doc_id bigint, source string, t string",
    )
    rows = winnow(docs).collect()
    out: dict[int, set[int]] = {}
    for r in rows:
        out.setdefault(r["doc_id"], set()).add(r["h"])
    return out


def test_winnow_matches_paper_reference(spark):
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "aaaaaaaaaaaaaaaa",  # degenerate: all k-grams identical (ties)
        "short",  # < K chars: no fingerprints
        "merge join order scan fast merge join order",
    ]
    got = _run(spark, texts)
    for i, t in enumerate(texts):
        assert got.get(i, set()) == _winnow_ref(t), f"doc {i}"


def test_winnow_shared_passage_guarantee(spark):
    """Any shared substring of length >= K + W - 1 must produce at
    least one shared fingerprint (the winnowing guarantee)."""
    passage = "xqzvkwjpyhbd"  # K + W - 1 = 11 < len = 12
    a = "unrelated prefix one " + passage + " tail a"
    b = "completely different start " + passage + " other end"
    got = _run(spark, [a, b])
    assert got[0] & got[1], "no shared fingerprint for a shared passage"


def test_mmr_greedy_properties(spark, sf_dir):
    from spec_search_spark.operators.mmr import (
        SELECT_K,
        mmr_diversified_topk,
    )

    rows = mmr_diversified_topk(spark, sf_dir).collect()
    assert [r["rank"] for r in rows] == list(range(1, SELECT_K + 1))
    # rank 1 is the pure-relevance argmax: its mmr is 7*rel exactly
    assert rows[0]["mmr_e5"] == 7 * rows[0]["rel_e4"]
    assert rows[0]["rel_e4"] == max(r["rel_e4"] for r in rows)
    # later scores are 7*rel - 3*pen; pen may be NEGATIVE (anti-
    # correlated picks earn a diversity bonus), so only rank 1 is
    # penalty-free by construction — assert the picks are distinct and
    # the selection actually diverges from pure relevance order
    assert len({r["vec_id"] for r in rows}) == SELECT_K
    import duckdb

    top_rel = {
        r[0]
        for r in duckdb.sql(
            f"""
        WITH probe AS (SELECT embedding AS p
                       FROM '{sf_dir}/embeddings.parquet' WHERE vec_id = 0)
        SELECT vec_id FROM '{sf_dir}/embeddings.parquet', probe
        WHERE vec_id <> 0
        ORDER BY list_dot_product(embedding, p)
              / (sqrt(list_dot_product(embedding, embedding))
                 * sqrt(list_dot_product(p, p))) DESC, vec_id
        LIMIT {SELECT_K}
        """
        ).fetchall()
    }
    assert {r["vec_id"] for r in rows} != top_rel


def test_unigram_viterbi_matches_python_dp(spark):
    """Spark level-synchronous Viterbi == straight python DP on a
    synthetic vocabulary."""
    from pyspark.sql import functions as F

    from spec_search_spark.operators.unigram_lm import MAXP, _viterbi

    words = spark.createDataFrame(
        [("abab", 3), ("abc", 2), ("aaaa", 1)], "word string, wcnt int"
    ).select("word", F.col("wcnt").cast("bigint").alias("wcnt"))
    vocab_rows = [("a", -10), ("b", -12), ("c", -20), ("ab", -15), ("aba", -32)]
    vocab = spark.createDataFrame(
        vocab_rows, "piece string, score_e6 bigint"
    )
    got = {
        r["word"]: (r["total"], r["seg"])
        for r in _viterbi(words, vocab).collect()
    }

    scores = dict(vocab_rows)

    def dp(w):
        best = {0: (0, "")}
        for j in range(1, len(w) + 1):
            cands = []
            for i in range(max(0, j - MAXP), j):
                p = w[i:j]
                if i in best and p in scores:
                    seg = best[i][1]
                    cands.append(
                        (best[i][0] + scores[p], -i, (seg + "·" + p) if seg else p)
                    )
            if cands:
                best[j] = (max(cands)[0], max(cands)[2])
        return best[len(w)]

    for w in ("abab", "abc", "aaaa"):
        assert got[w] == dp(w), w
    # sanity: 'ab'+'ab' (-30) beats 'a b a b' (-44) and 'aba'+'b' (-44)
    assert got["abab"] == (-30, "ab·ab")


def test_rm3_expansion_behavior(spark, sf_dir):
    from spec_search_spark.operators.bm25 import _QTOKS, bm25_search
    from spec_search_spark.operators.rm3 import (
        FB_TERMS,
        rm3_expanded_search,
        rm3_expansion_terms,
    )

    terms = rm3_expansion_terms(spark, sf_dir).collect()
    names = [r["term"] for r in terms]
    # every original query token is in the expanded query...
    assert set(_QTOKS) <= set(names)
    # ...plus exactly FB_TERMS new expansion terms
    assert len(names) == len(_QTOKS) + FB_TERMS
    assert all(r["weight"] >= 0 for r in terms)
    # feedback changes the ranking relative to plain BM25
    plain = [r["doc_id"] for r in bm25_search(spark, sf_dir).collect()]
    expanded = [r["doc_id"] for r in rm3_expanded_search(spark, sf_dir).collect()]
    assert plain != expanded


def test_unigram_em_report_guarantees(spark, sf_dir):
    """EM monotonicity: iteration-2 corpus log-likelihood (under its
    own model) must not decrease, the vocabulary must shrink or hold
    (pruning), and token totals stay consistent."""
    from spec_search_spark.operators.unigram_lm import unigram_lm_em_report

    r1, r2 = unigram_lm_em_report(spark, sf_dir).collect()
    assert (r1["iteration"], r2["iteration"]) == (1, 2)
    assert r2["ll_e6"] >= r1["ll_e6"]
    assert r2["vocab_pieces"] <= r1["vocab_pieces"]
    assert r1["n_tokens"] > 0 and r2["n_tokens"] > 0
