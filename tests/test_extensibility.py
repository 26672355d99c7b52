"""UDTF/UDAF surface tests (SURVEY.md §2.11): the UDTF chunker must be
row-identical to the pure-expression chunker, and the grouped-agg UDAF
centroid must equal the numpy mean of the same vectors."""

from __future__ import annotations

import numpy as np

from spec_search_spark.operators.extensibility import (
    udaf_label_centroid,
    udtf_chunk_explode,
)
from spec_search_spark.operators.text_analysis import chunk_fixed


def test_udtf_matches_expression_chunker(spark, sf_dir):
    udtf_rows = {
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in udtf_chunk_explode(spark, sf_dir).collect()
    }
    expr_rows = {
        (r["doc_id"], r["chunk_idx"], r["chunk"])
        for r in chunk_fixed(spark, sf_dir).collect()
    }
    assert udtf_rows == expr_rows
    assert len(udtf_rows) > 0


def test_udaf_centroid_equals_numpy_mean(spark, sf_dir):
    from spec_search_spark.catalog import load_table

    got = {
        r["label"]: [int(x) for x in r["centroid_sig"].split(",")]
        for r in udaf_label_centroid(spark, sf_dir).collect()
    }
    by_label: dict[int, list] = {}
    for r in load_table(spark, sf_dir, "embeddings").collect():
        by_label.setdefault(r["label"], []).append(
            np.asarray(r["embedding"], dtype=np.float64)
        )
    assert set(got) == set(by_label)
    for label, vecs in by_label.items():
        # centroid_sig = per-component round(mean * 1e4) as ints
        want = np.stack(vecs).mean(axis=0) * 1e4
        np.testing.assert_allclose(got[label], want, atol=0.51)
