"""The real-model embedder swap point (reference: MiniLM-384 via
Chroma, `/root/reference/app.py:35-36`, `indexer.py:11`):
make_model_embed_udf must drive ANY object exposing
``.encode(list[str]) -> ndarray`` through the same pandas_udf surface
as the hash embedder, loading the model ONCE per python worker (the
iterator-of-batches pattern), not once per Arrow batch.

Run with a fake encoder here; the optional sentence-transformers test
below is skipped when the library is absent (this container). The
encoder/loader are defined INSIDE the test so cloudpickle ships them
by value — executors cannot import pytest test modules."""

from __future__ import annotations

import glob
import os
import tempfile
import uuid

import numpy as np
import pytest
from pyspark.sql import functions as F

FAKE_DIM = 4


def _fake_encode_one(t: str) -> np.ndarray:
    """Reference implementation for the assertion side."""
    return np.array(
        [
            float(len(t)),
            float(len(t.split())),
            float(ord(t[0])) if t else 0.0,
            float(ord(t[-1])) if t else 0.0,
        ],
        dtype=np.float32,
    )


def test_model_swap_fake_encoder(spark):
    from spec_search_spark.functions.vector import make_model_embed_udf

    load_log_dir = os.path.join(tempfile.gettempdir(), f"model_loads_{uuid.uuid4().hex}")

    def load_fake_model():  # pickled by value (closure), runs on workers
        import os as _os
        import uuid as _uuid

        import numpy as _np

        class FakeEncoder:
            def encode(self, texts):
                return _np.stack(
                    [
                        _np.array(
                            [
                                float(len(t)),
                                float(len(t.split())),
                                float(ord(t[0])) if t else 0.0,
                                float(ord(t[-1])) if t else 0.0,
                            ],
                            dtype=_np.float32,
                        )
                        for t in texts
                    ]
                )

        _os.makedirs(load_log_dir, exist_ok=True)
        with open(
            _os.path.join(load_log_dir, f"{_os.getpid()}_{_uuid.uuid4().hex}"), "w"
        ):
            pass
        return FakeEncoder()

    texts = [f"doc number {i} with some words" for i in range(100)]
    df = spark.createDataFrame([(t,) for t in texts], "text string").repartition(4)
    # force many small Arrow batches so load-per-batch would be visible
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "10")
    try:
        embed = make_model_embed_udf(load_fake_model, batch_size=8)
        rows = df.select("text", embed(F.col("text")).alias("emb")).collect()
    finally:
        spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")

    # correctness: every vector matches the fake encoding of its text
    assert len(rows) == 100
    for r in rows:
        expected = _fake_encode_one(r["text"])
        assert len(r["emb"]) == FAKE_DIM
        assert np.allclose(r["emb"], expected), (r["text"], r["emb"], expected)

    # load-once-per-worker: ≥10 batches ran (100 rows / batch cap 10),
    # but the model loaded at most once per partition's worker — far
    # fewer loads than batches proves the iterator pattern held.
    n_loads = len(glob.glob(os.path.join(load_log_dir, "*")))
    assert 1 <= n_loads <= 4, n_loads


SWAP_DIM = 64  # same dim as the hash embedder so plans stay comparable


def _seeded_encoder_cls():
    """A tiny deterministic numpy 'real model' (r9 verdict task 6):
    projection matrix fixed by seed, `.encode(list[str]) -> ndarray`
    with batch semantics — the encoder contract sentence-transformers
    exposes, with zero dependencies. Defined inside a factory so the
    loader closure ships by value to workers."""
    import numpy as _np

    class SeededEncoder:
        def __init__(self, seed: int = 7):
            rng = _np.random.RandomState(seed)
            self.w = rng.standard_normal((SWAP_DIM, 256)).astype(_np.float64)

        def encode(self, texts):
            out = _np.zeros((len(texts), SWAP_DIM), dtype=_np.float64)
            for i, t in enumerate(texts):
                hist = _np.bincount(
                    _np.frombuffer(t.encode("utf-8", "ignore"), dtype=_np.uint8),
                    minlength=256,
                ).astype(_np.float64)
                v = self.w @ hist
                n = _np.linalg.norm(v)
                out[i] = v / n if n else v
            return out.astype(_np.float32)

    return SeededEncoder


def test_model_swap_full_v1_v2_pipeline(spark, sf_dir):
    """Run the FULL V1 index-build + V2 search pipeline through the
    seeded encoder via the seam and prove the swap changes DATA only:
    identical plan shape (operator sequence of the formatted explain),
    identical index structure (ids, chunks, row count), different
    vectors and therefore different distances."""
    import re as _re

    from spec_search_spark.catalog import load_table
    from spec_search_spark.functions.vector import make_model_embed_udf
    from spec_search_spark.operators.similarity import (
        TOP_K,
        build_index_df,
        search_index,
    )
    from spec_search_spark.plans.audit import plan_of

    enc_cls = _seeded_encoder_cls()

    def load_model():  # pickled by value; one instance per worker
        return enc_cls()

    docs = load_table(spark, sf_dir, "documents")
    idx_hash = build_index_df(docs)
    idx_model = build_index_df(docs, embed_udf=make_model_embed_udf(load_model))

    def shape(df) -> list[str]:
        return _re.findall(r"\(\d+\) ([A-Za-z]+)", plan_of(df))

    # 1. the swap leaves the V1 plan SHAPE untouched
    assert shape(idx_hash) == shape(idx_model)
    assert idx_hash.schema == idx_model.schema

    h = {r["id"]: r for r in idx_hash.collect()}
    m = {r["id"]: r for r in idx_model.collect()}
    # 2. identical index structure: same ids, same chunk text
    assert set(h) == set(m) and len(h) > 0
    some = sorted(h)[:50]
    assert all(h[i]["chunk"] == m[i]["chunk"] for i in some)
    # 3. ...but different vector DATA (and the model's dim held)
    assert all(len(m[i]["embedding"]) == SWAP_DIM for i in some)
    assert any(
        list(h[i]["embedding"]) != list(m[i]["embedding"]) for i in some
    )

    # 4. V2: the same query through both encoders — identical search
    # plan shape, different distances/ranking
    query = "fast merge join order"
    from spec_search_spark.functions.vector import embed_text_local

    probe_hash = embed_text_local(query, SWAP_DIM)
    encoder = enc_cls()
    probe_model = [float(x) for x in encoder.encode([query])[0]]
    s_hash = search_index(idx_hash, probe_hash, TOP_K)
    s_model = search_index(idx_model, probe_model, TOP_K)
    assert shape(s_hash) == shape(s_model)
    r_hash = s_hash.collect()
    r_model = s_model.collect()
    assert len(r_hash) == TOP_K and len(r_model) == TOP_K
    assert [r["dist2"] for r in r_hash] != [r["dist2"] for r in r_model]


def test_model_swap_sentence_transformers(spark):
    pytest.importorskip("sentence_transformers")
    from sentence_transformers import SentenceTransformer  # pragma: no cover

    from spec_search_spark.functions.vector import make_model_embed_udf

    def load():  # pragma: no cover
        return SentenceTransformer("all-MiniLM-L6-v2")

    embed = make_model_embed_udf(load)  # pragma: no cover
    df = spark.createDataFrame([("hello world",)], "text string")  # pragma: no cover
    out = df.select(embed(F.col("text")).alias("emb")).collect()  # pragma: no cover
    assert len(out[0]["emb"]) == 384  # pragma: no cover
