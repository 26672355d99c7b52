"""Corpus information-theoretic diagnostics — the entropy / divergence /
vocabulary-growth numbers a training-data pipeline tracks per source and
per language to catch collapsed, duplicated, or drifting text feeds
(reference north star: corpus curation; the reference ships no corpus
statistics — `/root/reference/README.md:12-17`).

* `token_entropy_by_lang` — Shannon entropy (nats) of each language's
  unigram token distribution: H = ln N − (1/N)·Σ c·ln c. Every ln sees
  an integer count (FIXTURES rule 5); each Σ-term is snapped to integer
  nano-nats BEFORE the sum and accumulated in DECIMAL(38,0) so the fold
  is order-independent at any parallelism and any corpus size.
* `js_divergence_en_de` — generalized (sample-weighted) Jensen–Shannon
  divergence between the EN and DE token distributions, via the
  identity JS_π = ln N − (n1·ln n1 + n2·ln n2)/N + T/N with
  T = Σ_tok [c1·ln c1 + c2·ln c2 − (c1+c2)·ln(c1+c2)] — again every
  transcendental sees an integer count and every Σ-term is snapped.
  (JS_π with π = sample shares is exactly the token↔group mutual
  information, so this doubles as an association score.)
* `vocab_growth_by_source` — per-source vocabulary report: token count,
  type count, hapax count (tokens seen once), type-token ratio and
  hapax share (6dp snap) — the Heaps-law health check that catches a
  source whose text generator collapsed.

Scale notes: everything reduces to (group, token) count tables —
partial-agg shuffles keyed by token, no row-level windows, no driver
collects. The per-term nano-nat snap keeps transcendental sums exact
across engines AND across partitionings; DECIMAL(38,0) accumulators
survive 1e12-token groups (c·ln c·1e9 overflows int64 near c ≈ 7e8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.functions.text import tokens
from spec_search_spark.session import tune

NAT_SCALE = 1_000_000_000  # per-term snap: integer nano-nats

#: c·ln(c) snapped to nano-nats, as SQL text identical in both engines
#: (ln of an integer count only — FIXTURES rule 5).
_CLNC = f"cast(round({{c}} * ln({{c}}) * {NAT_SCALE}) as bigint)"

JS_A, JS_B = "en", "de"


def _lang_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("lang", "text")
    return (
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("lang", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def token_entropy_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per lang: token count, type count, Shannon entropy in
    nats (6dp snap) of the unigram distribution."""
    tune(spark)
    per = _lang_token_counts(spark, sf_dir)
    acc = per.groupBy("lang").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(
            F.expr(f"cast({_CLNC.format(c='c')} as decimal(38,0))")
        ).alias("s_clnc"),
    )
    return acc.select(
        "lang",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.expr(
            "cast(round((ln(n_tokens)"
            f" - cast(s_clnc as double) / {NAT_SCALE} / n_tokens) * 1e6)"
            " as bigint) / 1e6"
        ).alias("entropy_nats_6"),
    ).orderBy("lang")


ENTROPY_SQL = f"""
WITH toks AS (
  SELECT lang, unnest(
    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents
), per AS (
  SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok
), acc AS (
  SELECT lang, sum(c) AS n_tokens, count(*) AS n_types,
         sum(CAST(CAST(round(c * ln(c) * {NAT_SCALE}) AS BIGINT)
                  AS DECIMAL(38,0))) AS s_clnc
  FROM per GROUP BY lang
)
SELECT lang, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types,
       CAST(round((ln(n_tokens)
            - CAST(s_clnc AS DOUBLE) / {NAT_SCALE} / n_tokens) * 1e6)
            AS BIGINT) / 1e6 AS entropy_nats_6
FROM acc ORDER BY lang
"""


def js_divergence_en_de(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: token totals for both languages, shared type count, and
    the sample-weighted Jensen–Shannon divergence in nats (6dp snap).

    Per-token term c1·ln c1 + c2·ln c2 − (c1+c2)·ln(c1+c2) is snapped
    to nano-nats and summed exactly; the three global ln's combine in
    one final fixed-arity double expression, snapped."""
    tune(spark)
    per = (
        _lang_token_counts(spark, sf_dir)
        .filter(F.col("lang").isin(JS_A, JS_B))
        .groupBy("tok")
        .agg(
            F.sum(F.when(F.col("lang") == JS_A, F.col("c")).otherwise(0)).alias(
                "c1"
            ),
            F.sum(F.when(F.col("lang") == JS_B, F.col("c")).otherwise(0)).alias(
                "c2"
            ),
        )
    )
    term = (
        f"cast(round(((case when c1 > 0 then c1 * ln(c1) else 0.0 end)"
        f" + (case when c2 > 0 then c2 * ln(c2) else 0.0 end)"
        f" - (c1 + c2) * ln(c1 + c2)) * {NAT_SCALE}) as bigint)"
    )
    acc = per.groupBy().agg(
        F.sum("c1").alias("n1"),
        F.sum("c2").alias("n2"),
        F.sum(F.expr("case when c1 > 0 and c2 > 0 then 1 else 0 end")).alias(
            "shared_types"
        ),
        F.sum(F.expr(f"cast({term} as decimal(38,0))")).alias("t_n"),
    )
    return acc.select(
        F.col("n1").cast("bigint").alias("n1"),
        F.col("n2").cast("bigint").alias("n2"),
        F.col("shared_types").cast("bigint").alias("shared_types"),
        F.expr(
            "cast(round((ln(n1 + n2)"
            " - (n1 * ln(n1) + n2 * ln(n2)) / (n1 + n2)"
            f" + cast(t_n as double) / {NAT_SCALE} / (n1 + n2)) * 1e6)"
            " as bigint) / 1e6"
        ).alias("js_nats_6"),
    )


JS_SQL = f"""
WITH toks AS (
  SELECT lang, unnest(
    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents WHERE lang IN ('{JS_A}', '{JS_B}')
), lt AS (
  SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok
), per AS (
  SELECT tok,
         sum(CASE WHEN lang = '{JS_A}' THEN c ELSE 0 END) AS c1,
         sum(CASE WHEN lang = '{JS_B}' THEN c ELSE 0 END) AS c2
  FROM lt GROUP BY tok
), acc AS (
  SELECT sum(c1) AS n1, sum(c2) AS n2,
         sum(CASE WHEN c1 > 0 AND c2 > 0 THEN 1 ELSE 0 END) AS shared_types,
         sum(CAST(CAST(round(((CASE WHEN c1 > 0 THEN c1 * ln(c1) ELSE 0.0 END)
               + (CASE WHEN c2 > 0 THEN c2 * ln(c2) ELSE 0.0 END)
               - (c1 + c2) * ln(c1 + c2)) * {NAT_SCALE}) AS BIGINT)
             AS DECIMAL(38,0))) AS t_n
  FROM per
)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(shared_types AS BIGINT) AS shared_types,
       CAST(round((ln(n1 + n2)
            - (n1 * ln(n1) + n2 * ln(n2)) / (n1 + n2)
            + CAST(t_n AS DOUBLE) / {NAT_SCALE} / (n1 + n2)) * 1e6)
            AS BIGINT) / 1e6 AS js_nats_6
FROM acc
"""


def vocab_growth_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row per source: n_tokens, n_types, hapax count, type-token
    ratio and hapax share (6dp snaps) — ordered by source."""
    tune(spark)
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    acc = per.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.expr("case when c = 1 then 1 else 0 end")).alias("hapax"),
    )
    return acc.select(
        "source",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_types").cast("bigint").alias("n_types"),
        F.col("hapax").cast("bigint").alias("hapax"),
        F.expr(
            "cast(round(n_types / cast(n_tokens as double) * 1e6) as bigint) / 1e6"
        ).alias("ttr_6"),
        F.expr(
            "cast(round(hapax / cast(n_types as double) * 1e6) as bigint) / 1e6"
        ).alias("hapax_share_6"),
    ).orderBy("source")


VOCAB_GROWTH_SQL = """
WITH toks AS (
  SELECT source, unnest(
    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents
), per AS (
  SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok
), acc AS (
  SELECT source, sum(c) AS n_tokens, count(*) AS n_types,
         sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS hapax
  FROM per GROUP BY source
)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_types AS BIGINT) AS n_types, CAST(hapax AS BIGINT) AS hapax,
       CAST(round(n_types / CAST(n_tokens AS DOUBLE) * 1e6) AS BIGINT) / 1e6
         AS ttr_6,
       CAST(round(hapax / CAST(n_types AS DOUBLE) * 1e6) AS BIGINT) / 1e6
         AS hapax_share_6
FROM acc ORDER BY source
"""


def source_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source 3-gram containment matrix: for each ordered source
    pair (a, b) sharing at least one distinct word-3-gram,
    containment(a→b) = |shingles(a) ∩ shingles(b)| / |shingles(a)|
    (6dp snap) — the cheap "is source A a subset of source B" probe a
    feed-dedup pass runs before committing to MinHash.

    Plan: distinct (source, shingle) → self-join keyed on shingle
    (shuffle ∝ postings, never all-pairs of documents) → per-pair
    counts joined to the broadcast per-source totals (≤ #sources rows).
    """
    tune(spark)
    from spec_search_spark.operators.dedup import _shingles_from_toks

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    sh = (
        docs.select("source", tokens(F.col("text")).alias("toks"))
        .select(
            "source", F.explode(_shingles_from_toks(F.col("toks"))).alias("sh")
        )
        .distinct()
    )
    totals = sh.groupBy("source").agg(F.count(F.lit(1)).alias("n_sh"))
    pairs = (
        sh.alias("a")
        .join(
            sh.alias("b"),
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.source") != F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    return (
        pairs.join(
            F.broadcast(totals.withColumnRenamed("source", "src_a")), "src_a"
        )
        .select(
            "src_a",
            "src_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.col("n_sh").cast("bigint").alias("n_sh_a"),
            F.expr(
                "cast(round(n_common / cast(n_sh as double) * 1e6) as bigint)"
                " / 1e6"
            ).alias("containment_6"),
        )
        .orderBy("src_a", "src_b")
    )


CONTAINMENT_SQL = """
WITH toks AS (
  SELECT source,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '\\s+') END AS tk
  FROM documents
), sh AS (
  SELECT DISTINCT source,
         tk[i + 1] || ' ' || tk[i + 2] || ' ' || tk[i + 3] AS sh
  FROM toks, LATERAL unnest(range(0, greatest(len(tk) - 2, 0))) AS t(i)
), totals AS (
  SELECT source, count(*) AS n_sh FROM sh GROUP BY source
), pairs AS (
  SELECT a.source AS src_a, b.source AS src_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.sh = b.sh AND a.source <> b.source
  GROUP BY a.source, b.source
)
SELECT src_a, src_b, CAST(n_common AS BIGINT) AS n_common,
       CAST(n_sh AS BIGINT) AS n_sh_a,
       CAST(round(n_common / CAST(n_sh AS DOUBLE) * 1e6) AS BIGINT) / 1e6
         AS containment_6
FROM pairs JOIN totals ON totals.source = pairs.src_a
ORDER BY src_a, src_b
"""


def token_gini_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gini coefficient of token mass across types — how
    concentrated a source's vocabulary usage is (0 = uniform, → 1 =
    a few types carry all the mass; a spiking Gini flags a generator
    loop or boilerplate flood).

    Exact arithmetic: with type-multiplicities m per distinct count c,
    the ascending-sort rank sum Σ i·x_i is tie-order-invariant and
    2·Σ i·x_i = Σ c·m·(2·cum_before + m + 1) — pure integers through
    the group-wise bucketed rank walk; one final snapped double."""
    tune(spark)
    from spec_search_spark.operators.rank_stats import _bucketed_cum_by

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per_tok = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_c = per_tok.groupBy("source", "c").agg(F.count(F.lit(1)).alias("m"))
    cum = _bucketed_cum_by(per_c, "source", "c", ["m"])
    acc = cum.groupBy("source").agg(
        F.sum("m").alias("v"),
        F.sum(F.expr("cast(c as decimal(38,0)) * m")).alias("t"),
        F.sum(
            F.expr(
                "cast(c as decimal(38,0)) * m * (2 * (cum_m - m) + m + 1)"
            )
        ).alias("s2"),
    )
    return acc.select(
        "source",
        F.col("v").cast("bigint").alias("n_types"),
        F.expr("cast(t as bigint)").alias("n_tokens"),
        F.expr(
            "cast(round((cast(s2 as double) / v / cast(t as double)"
            " - (v + 1.0) / v) * 1e6) as bigint) / 1e6"
        ).alias("gini_6"),
    ).orderBy("source")


GINI_SQL = """
WITH toks AS (
  SELECT source, unnest(
    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents
), per_tok AS (
  SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok
), per_c AS (
  SELECT source, c, count(*) AS m FROM per_tok GROUP BY source, c
), cum AS (
  SELECT source, c, m,
         sum(m) OVER (PARTITION BY source ORDER BY c
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS cumb
  FROM per_c
), acc AS (
  SELECT source, sum(m) AS v,
         sum(CAST(c AS DECIMAL(38,0)) * m) AS t,
         sum(CAST(c AS DECIMAL(38,0)) * m
             * (2 * coalesce(cumb, 0) + m + 1)) AS s2
  FROM cum GROUP BY source
)
SELECT source, CAST(v AS BIGINT) AS n_types, CAST(t AS BIGINT) AS n_tokens,
       CAST(round((CAST(s2 AS DOUBLE) / v / CAST(t AS DOUBLE)
            - (v + 1.0) / v) * 1e6) AS BIGINT) / 1e6 AS gini_6
FROM acc ORDER BY source
"""

ZIPF_SCALE = 1_000_000_000  # ln values snapped to integer nano-units


def zipf_slope_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Zipf exponent: weighted OLS slope of ln(frequency) on
    ln(rank) over the type-frequency spectrum (natural text ≈ −1; a
    flat slope flags near-uniform synthetic text, a cliff flags
    boilerplate). Ranks are tie-averaged DESCENDING frequency ranks
    from the group-wise bucketed walk; both regression coordinates are
    transcendentals of integers snapped to nano-units, and every
    moment accumulates in DECIMAL(38,0) (FIXTURES rules 1/5). Sources
    with fewer than two distinct frequencies are excluded (slope
    undefined)."""
    tune(spark)
    from spec_search_spark.operators.rank_stats import _bucketed_cum_by

    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    per_c = (
        docs.select("source", F.explode(tokens(F.col("text"))).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("source", "c")
        .agg(F.count(F.lit(1)).alias("m"))
    )
    # descending-frequency ranks: walk the negated count
    cum = _bucketed_cum_by(
        per_c.withColumn("negc", -F.col("c")), "source", "negc", ["m"]
    )
    pts = cum.select(
        "source",
        "m",
        # doubled tie-averaged descending rank
        (2 * (F.col("cum_m") - F.col("m")) + F.col("m") + 1).alias("dr"),
        "c",
    ).select(
        "source",
        "m",
        F.expr(f"cast(round((ln(dr) - ln(2)) * {ZIPF_SCALE}) as bigint)").alias(
            "x_n"
        ),
        F.expr(f"cast(round(ln(c) * {ZIPF_SCALE}) as bigint)").alias("y_n"),
    )
    acc = pts.groupBy("source").agg(
        F.sum("m").alias("w"),
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(F.expr("cast(x_n as decimal(38,0)) * m")).alias("sx"),
        F.sum(F.expr("cast(y_n as decimal(38,0)) * m")).alias("sy"),
        F.sum(F.expr("cast(x_n as decimal(38,0)) * x_n * m")).alias("sxx"),
        F.sum(F.expr("cast(x_n as decimal(38,0)) * y_n * m")).alias("sxy"),
    )
    return (
        acc.filter(F.col("n_pts") >= 2)
        .select(
            "source",
            F.col("w").cast("bigint").alias("n_types"),
            F.col("n_pts").cast("bigint").alias("n_freq_levels"),
            F.expr(
                "cast(round(((cast(w as double) * cast(sxy as double)"
                " - cast(sx as double) * cast(sy as double))"
                " / (cast(w as double) * cast(sxx as double)"
                " - cast(sx as double) * cast(sx as double))) * 1e6)"
                " as bigint) / 1e6"
            ).alias("zipf_slope_6"),
        )
        .orderBy("source")
    )


ZIPF_SQL = f"""
WITH toks AS (
  SELECT source, unnest(
    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents
), per_c AS (
  SELECT source, c, count(*) AS m FROM (
    SELECT source, tok, count(*) AS c FROM toks GROUP BY source, tok
  ) GROUP BY source, c
), cum AS (
  SELECT source, c, m,
         coalesce(sum(m) OVER (PARTITION BY source ORDER BY c DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cumb
  FROM per_c
), pts AS (
  SELECT source, m,
         CAST(round((ln(2 * cumb + m + 1) - ln(2)) * {ZIPF_SCALE}) AS BIGINT)
           AS x_n,
         CAST(round(ln(c) * {ZIPF_SCALE}) AS BIGINT) AS y_n
  FROM cum
), acc AS (
  SELECT source, sum(m) AS w, count(*) AS n_pts,
         sum(CAST(x_n AS DECIMAL(38,0)) * m) AS sx,
         sum(CAST(y_n AS DECIMAL(38,0)) * m) AS sy,
         sum(CAST(x_n AS DECIMAL(38,0)) * x_n * m) AS sxx,
         sum(CAST(x_n AS DECIMAL(38,0)) * y_n * m) AS sxy
  FROM pts GROUP BY source
)
SELECT source, CAST(w AS BIGINT) AS n_types,
       CAST(n_pts AS BIGINT) AS n_freq_levels,
       CAST(round(((CAST(w AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
            / (CAST(w AS DOUBLE) * CAST(sxx AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))) * 1e6)
            AS BIGINT) / 1e6 AS zipf_slope_6
FROM acc WHERE n_pts >= 2 ORDER BY source
"""


def token_lang_mi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One row: mutual information I(token; lang) in nats (6dp snap) —
    how much the token distribution identifies the language (the
    all-groups generalization of `js_divergence_en_de`: sample-weighted
    multi-way JS IS this MI). High MI = cleanly separated languages;
    collapsing MI flags cross-lingual contamination.

    Every transcendental sees an integer count: the per-(token, lang)
    cell term c·(ln c + ln N − ln c_tok − ln c_lang) is snapped to
    nano-nats before the DECIMAL(38,0) sum. Cell counts join their
    token marginal on the token key (shuffle ∝ vocabulary, the same
    key the groupBy already shuffled on); the ≤#langs marginal and the
    one-row total broadcast."""
    tune(spark)
    lt = _lang_token_counts(spark, sf_dir)
    ct = lt.groupBy("tok").agg(F.sum("c").alias("c_tok"))
    cg = lt.groupBy("lang").agg(F.sum("c").alias("c_lang"))
    nn = lt.groupBy().agg(F.sum("c").alias("nn"))
    term = (
        "cast(round(c * (ln(c) + ln(nn) - ln(c_tok) - ln(c_lang))"
        f" * {NAT_SCALE}) as bigint)"
    )
    acc = (
        lt.join(ct, "tok")
        .join(F.broadcast(cg), "lang")
        .crossJoin(F.broadcast(nn))
        .groupBy()
        .agg(
            F.max("nn").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(F.expr(f"cast({term} as decimal(38,0))")).alias("t_n"),
        )
    )
    return acc.select(
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("n_cells").cast("bigint").alias("n_cells"),
        F.expr(
            f"cast(round(cast(t_n as double) / {NAT_SCALE} / n_tokens * 1e6)"
            " as bigint) / 1e6"
        ).alias("mi_nats_6"),
    )


MI_SQL = f"""
WITH toks AS (
  SELECT lang, unnest(
    CASE WHEN trim(text) = '' THEN []::VARCHAR[]
         ELSE regexp_split_to_array(trim(text), '\\s+') END) AS tok
  FROM documents
), lt AS (
  SELECT lang, tok, count(*) AS c FROM toks GROUP BY lang, tok
), ct AS (SELECT tok, sum(c) AS c_tok FROM lt GROUP BY tok),
cg AS (SELECT lang, sum(c) AS c_lang FROM lt GROUP BY lang),
nn AS (SELECT sum(c) AS nn FROM lt),
acc AS (
  SELECT max(nn.nn) AS n_tokens, count(*) AS n_cells,
         sum(CAST(CAST(round(c * (ln(c) + ln(nn.nn) - ln(c_tok) - ln(c_lang))
                 * {NAT_SCALE}) AS BIGINT) AS DECIMAL(38,0))) AS t_n
  FROM lt JOIN ct USING (tok) JOIN cg USING (lang) CROSS JOIN nn
)
SELECT CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(n_cells AS BIGINT) AS n_cells,
       CAST(round(CAST(t_n AS DOUBLE) / {NAT_SCALE} / n_tokens * 1e6)
         AS BIGINT) / 1e6 AS mi_nats_6
FROM acc
"""

CENTROID_SCALE = 10_000  # embedding elements snapped to the 1e-4 grid


def label_centroid_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine similarity between per-label embedding
    centroids (one row per unordered label pair) — the class-confusion
    geometry probe: two labels whose centroids sit near cos=1 are
    candidates for merging or for mislabeled data.

    Exact shape: elements snap to the 1e-4 integer grid FIRST, so the
    per-(label, dim) sums are order-independent BIGINTs; centroids are
    the PCA-style round(s/n) integers; dot products and norms are
    DECIMAL(38,0) sums over the 64-dim centroid table (≤ labels×64
    rows — broadcast self-join); one final snapped double per pair."""
    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings").select(
        "label",
        F.expr(
            "posexplode(transform(embedding,"
            f" x -> cast(round(cast(x as double) * {CENTROID_SCALE}) as bigint)))"
        ).alias("dim", "xi"),
    )
    cent = emb.groupBy("label", "dim").agg(
        F.expr("cast(round(sum(xi) / count(*)) as bigint)").alias("m")
    )
    a = cent.select(
        F.col("label").alias("la"), "dim", F.col("m").alias("ma")
    )
    b = cent.select(
        F.col("label").alias("lb"), "dim", F.col("m").alias("mb")
    )
    pairs = (
        a.join(F.broadcast(b), "dim")
        .filter(F.col("la") < F.col("lb"))
        .groupBy("la", "lb")
        .agg(
            F.sum(F.expr("cast(ma as decimal(38,0)) * mb")).alias("dot"),
            F.sum(F.expr("cast(ma as decimal(38,0)) * ma")).alias("na2"),
            F.sum(F.expr("cast(mb as decimal(38,0)) * mb")).alias("nb2"),
        )
    )
    return pairs.select(
        F.col("la").cast("bigint").alias("la"),
        F.col("lb").cast("bigint").alias("lb"),
        F.expr(
            "cast(round(cast(dot as double)"
            " / sqrt(cast(na2 as double) * cast(nb2 as double)) * 1e6)"
            " as bigint) / 1e6"
        ).alias("cos_6"),
    ).orderBy("la", "lb")


CENTROID_SIM_SQL = f"""
WITH x AS (
  SELECT label, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(round(unnest(embedding)::DOUBLE * {CENTROID_SCALE}) AS BIGINT)
           AS xi
  FROM embeddings
), cent AS (
  SELECT label, dim, CAST(round(sum(xi) / count(*)) AS BIGINT) AS m
  FROM x GROUP BY label, dim
), pairs AS (
  SELECT a.label AS la, b.label AS lb,
         sum(CAST(a.m AS DECIMAL(38,0)) * b.m) AS dot,
         sum(CAST(a.m AS DECIMAL(38,0)) * a.m) AS na2,
         sum(CAST(b.m AS DECIMAL(38,0)) * b.m) AS nb2
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY a.label, b.label
)
SELECT CAST(la AS BIGINT) AS la, CAST(lb AS BIGINT) AS lb,
       CAST(round(CAST(dot AS DOUBLE)
            / sqrt(CAST(na2 AS DOUBLE) * CAST(nb2 AS DOUBLE)) * 1e6)
            AS BIGINT) / 1e6 AS cos_6
FROM pairs ORDER BY la, lb
"""


QUERIES = {
    "token_entropy_by_lang": token_entropy_by_lang,
    "js_divergence_en_de": js_divergence_en_de,
    "vocab_growth_by_source": vocab_growth_by_source,
    "source_shingle_containment": source_shingle_containment,
    "token_gini_by_source": token_gini_by_source,
    "zipf_slope_by_source": zipf_slope_by_source,
    "token_lang_mi": token_lang_mi,
    "label_centroid_similarity": label_centroid_similarity,
}

ORACLES = {
    "token_entropy_by_lang": ENTROPY_SQL,
    "js_divergence_en_de": JS_SQL,
    "vocab_growth_by_source": VOCAB_GROWTH_SQL,
    "source_shingle_containment": CONTAINMENT_SQL,
    "token_gini_by_source": GINI_SQL,
    "zipf_slope_by_source": ZIPF_SQL,
    "token_lang_mi": MI_SQL,
    "label_centroid_similarity": CENTROID_SIM_SQL,
}
