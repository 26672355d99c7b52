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
