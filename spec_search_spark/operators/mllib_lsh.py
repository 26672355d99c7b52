"""MLlib LSH operators (SURVEY.md §7 step 4, §2.9 V2/V5): the
built-in approximate similarity machinery — BucketedRandomProjectionLSH
for L2 ANN and MinHashLSH for Jaccard near-dup joins.

These complement the hand-rolled variants (operators.similarity
hyperplane LSH, operators.dedup banded MinHash): the MLlib estimators
bring multi-table `approxSimilarityJoin` / `approxNearestNeighbors`
with hash-table amplification out of the box, at the cost of opaque
(seeded, version-dependent) hash families — hence rows-only entries
with recall property tests instead of SQL oracles.

Scale: both estimators are narrow transforms (hash columns) + an
equi-join on hash buckets — the same shuffle-friendly layout as the
hand-rolled versions; `numHashTables` trades recall for join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spec_search_spark.catalog import load_table
from spec_search_spark.session import tune

SEED_BRP = 42
SEED_MINHASH = 7


def _emb_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.functions import array_to_vector

    tune(spark)
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", "label", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )


def mllib_brp_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approxSimilarityJoin of the embedding table against 5 probe
    vectors within an L2 radius, top-10 per probe."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.sql.window import Window as W

    data = _emb_vectors(spark, sf_dir)
    probes = data.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("probe_id"), F.col("features").alias("p_features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=4, seed=SEED_BRP
    )
    model = lsh.fit(data)
    joined = model.approxSimilarityJoin(
        data, probes.withColumnRenamed("p_features", "features"), 10.0, distCol="dist"
    )
    out = joined.select(
        F.col("datasetB.probe_id").alias("probe_id"),
        F.col("datasetA.vec_id").alias("vec_id"),
        F.round(F.col("dist"), 4).alias("dist"),
    ).filter(F.col("vec_id") != F.col("probe_id"))
    w = W.partitionBy("probe_id").orderBy(F.asc("dist"), F.asc("vec_id"))
    return (
        out.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= 10)
    )


def mllib_minhash_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHashLSH approxSimilarityJoin over binary shingle vectors:
    doc pairs with estimated Jaccard distance ≤ 0.2."""
    from pyspark.ml.feature import CountVectorizer, MinHashLSH

    tune(spark)
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.array_distinct(F.split(F.trim(F.col("text")), r"\s+")).alias("tokens"),
    ).filter(F.size("tokens") > 0)
    cv = CountVectorizer(inputCol="tokens", outputCol="features", binary=True, minDF=1.0)
    model_cv = cv.fit(toks)
    vecs = model_cv.transform(toks).select("doc_id", "features")
    mh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8, seed=SEED_MINHASH)
    model = mh.fit(vecs)
    pairs = model.approxSimilarityJoin(vecs, vecs, 0.2, distCol="jaccard_dist")
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc1"),
            F.col("datasetB.doc_id").alias("doc2"),
            F.round(F.col("jaccard_dist"), 4).alias("jaccard_dist"),
        )
        .filter(F.col("doc1") < F.col("doc2"))
    )


QUERIES = {
    "mllib_brp_ann": mllib_brp_ann,           # rows-only (seeded hash family)
    "mllib_minhash_near_dup": mllib_minhash_near_dup,  # rows-only
}

ORACLES: dict[str, str] = {}
