"""Fuzzy string matching: edit-distance self-join over a name
vocabulary (the character-level sibling of dedup.py's token-level
similarity family; the reference's only string matching is exact cell
equality, `/root/reference/project_search.py:50-52` — this is the
engine extension a catalog-cleaning / entity-resolution user needs).

Scale design, outside-in:

1. **Collapse to the vocabulary first.** Part names repeat heavily
   (64 distinct among 20k rows at sf0.1); matching row-level pairs is
   quadratic in the duplication factor for zero information. The join
   runs over DISTINCT names carrying member counts — the same
   collapse simhash applies to fingerprints.
2. **Lossless blocking, then exact verify.** Candidates come from
   (a) the length filter |len(a)−len(b)| ≤ d (edit distance ≥ length
   difference) and (b) a positional q-gram filter (Gravano et al.,
   VLDB'01): strings within edit distance d share at least
   max(len)−q+1−q·d q-grams aligned within position shift ≤ d. The
   q-gram match count here may double-count a gram matching multiple
   positions — that only ADMITS extra candidates (safe), never drops
   a true pair. Survivors are verified with the exact
   `levenshtein()` builtin; the oracle is the naive banded all-pairs
   join, so the blocked plan must reproduce it bit-for-bit.
3. At 100 TB the q-gram inverted index is the shuffle key (short
   string fragments), the vocabulary is corpus-sublinear, and no
   unblocked pair join exists in the plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

EDIT_D = 2  # max edit distance
QGRAM = 3

# For max(len) ≤ SHORT_LEN the q-gram count bound max(len)−q+1−q·d is
# ≤ 0 — two such strings can be within EDIT_D while sharing ZERO
# q-grams, so the gram index is powerless there and those pairs must be
# enumerated directly (bounded: the ≤SHORT_LEN name subset is a tiny,
# alphabet-bounded slice of any vocabulary).
SHORT_LEN = QGRAM - 1 + QGRAM * EDIT_D


def fuzzy_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct part-name pairs within edit distance EDIT_D, with
    member counts. Output identical to the naive banded all-pairs
    levenshtein join (the oracle)."""
    tune(spark)
    part = load_table(spark, sf_dir, "part")
    vocab = part.groupBy(F.col("p_name").alias("name")).agg(
        F.count(F.lit(1)).alias("members")
    )
    v = vocab.withColumn("len", F.length("name"))

    # positional q-gram postings over the vocabulary
    grams = v.select(
        "name",
        "len",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, greatest(length(name) - {QGRAM - 1}, 1)),"
                f" i -> substring(name, i, {QGRAM}))"
            )
        ).alias("pos", "gram"),
    )
    ga, gb = grams.alias("a"), grams.alias("b")
    matched = (
        ga.join(
            gb,
            (F.col("a.gram") == F.col("b.gram"))
            & (F.col("a.name") < F.col("b.name"))
            & (F.abs(F.col("a.len") - F.col("b.len")) <= EDIT_D)
            & (F.abs(F.col("a.pos") - F.col("b.pos")) <= EDIT_D),
        )
        .groupBy(
            F.col("a.name").alias("name1"),
            F.col("b.name").alias("name2"),
            F.col("a.len").alias("len1"),
            F.col("b.len").alias("len2"),
        )
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    # q-gram count lower bound: max(len)−q+1−q·d (admits supersets —
    # double-matched grams only add candidates, verified exactly below)
    cand = matched.filter(
        F.col("n_matched")
        >= F.greatest("len1", "len2") - F.lit(QGRAM - 1) - F.lit(QGRAM * EDIT_D)
    ).select("name1", "name2")

    # short-string fallback: pairs the gram bound cannot prune
    sh = v.filter(F.col("len") <= SHORT_LEN)
    sa, sb = sh.alias("sa"), sh.alias("sb")
    short_pairs = sa.join(
        sb,
        (F.col("sa.name") < F.col("sb.name"))
        & (F.abs(F.col("sa.len") - F.col("sb.len")) <= EDIT_D)
        & (F.greatest(F.col("sa.len"), F.col("sb.len")) <= SHORT_LEN),
    ).select(F.col("sa.name").alias("name1"), F.col("sb.name").alias("name2"))

    verified = (
        cand.unionByName(short_pairs)
        .distinct()
        .withColumn("dist", F.levenshtein("name1", "name2"))
        .filter(F.col("dist") <= EDIT_D)
    )
    m1 = vocab.select(F.col("name").alias("name1"), F.col("members").alias("members1"))
    m2 = vocab.select(F.col("name").alias("name2"), F.col("members").alias("members2"))
    return (
        verified.join(m1, "name1")
        .join(m2, "name2")
        .select("name1", "name2", "dist", "members1", "members2")
    )


FUZZY_SQL = f"""
WITH vocab AS (
  SELECT p_name AS name, count(*) AS members FROM part GROUP BY p_name
)
SELECT a.name AS name1, b.name AS name2,
       CAST(levenshtein(a.name, b.name) AS INT) AS dist,
       a.members AS members1, b.members AS members2
FROM vocab a JOIN vocab b
  ON a.name < b.name
 AND abs(length(a.name) - length(b.name)) <= {EDIT_D}
 AND levenshtein(a.name, b.name) <= {EDIT_D}
"""


QUERIES = {
    "fuzzy_name_pairs": fuzzy_name_pairs,
}

ORACLES = {
    "fuzzy_name_pairs": FUZZY_SQL,
}
