"""IVFADC composition: numpy-pinned recall + structural invariants.
Full value parity (coarse Lloyd, residual-PQ training, ADC fold,
re-rank — loops unrolled) vs the DuckDB oracle is covered by
tools/selfcheck.py; here the recall arithmetic is pinned against an
INDEPENDENT numpy brute force reading the parquet directly."""

from __future__ import annotations

from spec_search_spark.operators.ivfpq import (
    IVFPQ_NPROBE,
    N_PROBES,
    SWEEP_NPROBES,
    TOP_K,
    ivfpq_recall_report,
    ivfpq_search,
)


def _numpy_exact_topk(sf_dir: str) -> dict[int, list[int]]:
    """Exact L2 top-k per probe: left-fold squared distance (the same
    summation order as the engine's aggregate fold) rounded to the
    1e-6 grid, ties broken by vec_id."""
    import pyarrow.parquet as paq

    t = paq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pydict()
    vecs = {
        int(vid): [float(x) for x in emb]
        for vid, emb in zip(t["vec_id"], t["embedding"])
    }

    def l2(a: list[float], b: list[float]) -> float:
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return round(acc, 6)

    out = {}
    for pid in range(N_PROBES):
        q = vecs[pid]
        scored = sorted(
            (l2(v, q), vid) for vid, v in vecs.items() if vid != pid
        )
        out[pid] = [vid for _d, vid in scored[:TOP_K]]
    return out


def test_recall_report_pinned_to_numpy_exact(spark, sf_dir):
    """The report's n_hits/recall at the search nprobe must equal the
    overlap between ivfpq_search's own result and the NUMPY exact
    top-k — recall is measured, not asserted-by-construction."""
    exact = _numpy_exact_topk(sf_dir)
    res = ivfpq_search(spark, sf_dir).collect()
    per_probe: dict[int, set[int]] = {}
    for r in res:
        per_probe.setdefault(int(r["probe_id"]), set()).add(int(r["vec_id"]))
    report = {
        (int(r["nprobe"]), int(r["probe_id"])): (int(r["n_hits"]), float(r["recall"]))
        for r in ivfpq_recall_report(spark, sf_dir).collect()
    }
    assert set(report) == {
        (p, pid) for p in SWEEP_NPROBES for pid in range(N_PROBES)
    }
    for pid, ex in exact.items():
        hits = len(per_probe.get(pid, set()) & set(ex))
        n_hits, recall = report[(IVFPQ_NPROBE, pid)]
        assert n_hits == hits, (pid, n_hits, hits)
        assert recall == round(hits / TOP_K, 4)
    for (p, pid), (n_hits, recall) in report.items():
        assert 0 <= n_hits <= TOP_K
        assert recall == round(n_hits / TOP_K, 4)


def test_search_shape_and_exactness_bound(spark, sf_dir):
    """Per probe: ≤ TOP_K rows, rn dense from 1, d2 monotone in rn, and
    every reranked distance ≥ the numpy-exact distance at that rank
    (candidates ⊆ corpus: pruned search can never beat exact kNN)."""
    import pyarrow.parquet as paq

    exact = _numpy_exact_topk(sf_dir)
    t = paq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).to_pydict()
    vecs = {
        int(vid): [float(x) for x in emb]
        for vid, emb in zip(t["vec_id"], t["embedding"])
    }

    def l2(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += (x - y) * (x - y)
        return round(acc, 6)

    rows = ivfpq_search(spark, sf_dir).collect()
    by_probe: dict[int, list] = {}
    for r in rows:
        by_probe.setdefault(int(r["probe_id"]), []).append(r)
    assert set(by_probe) <= set(range(N_PROBES))
    for pid, rs in by_probe.items():
        rs = sorted(rs, key=lambda r: r["rn"])
        assert [r["rn"] for r in rs] == list(range(1, len(rs) + 1))
        d2s = [float(r["d2"]) for r in rs]
        assert d2s == sorted(d2s)
        q = vecs[pid]
        ex_d = sorted(l2(vecs[v], q) for v in exact[pid])
        for rank, r in enumerate(rs[: len(ex_d)]):
            assert float(r["d2"]) >= ex_d[rank] - 1e-9, (pid, rank)


def test_recall_grows_with_probe_budget(spark, sf_dir):
    """MEAN recall over probes at the largest sweep point must be
    usable (> 0) and no worse than the smallest point — the curve the
    report exists to measure. Per-probe monotonicity is NOT asserted:
    a vector can fall out of the bounded ADC candidate set when more
    clusters compete (textbook IVFADC behavior)."""
    report = ivfpq_recall_report(spark, sf_dir).collect()
    mean = {
        p: sum(float(r["recall"]) for r in report if r["nprobe"] == p) / N_PROBES
        for p in SWEEP_NPROBES
    }
    assert mean[max(SWEEP_NPROBES)] > 0.0
    assert mean[max(SWEEP_NPROBES)] >= mean[min(SWEEP_NPROBES)] - 0.1
