"""Semantic invariants for fixed-point PageRank (value parity vs the
unrolled DuckDB CTEs is covered by tools/selfcheck.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from spec_search_spark.operators import graph as g
from spec_search_spark.operators.dedup import minhash_lsh_candidates


def test_pagerank_mass_and_bounds(spark, sf_dir):
    rows = g.graph_pagerank(spark, sf_dir).collect()
    assert rows
    n = len(rows)
    base = g.SCALE // n
    teleport = (15 * base) // 100
    total = sum(r.pr_fixed for r in rows)
    for r in rows:
        # every vertex keeps at least the teleport mass, and no vertex
        # exceeds the total
        assert teleport <= r.pr_fixed <= g.SCALE
        assert r.deg >= 1
    # integer-div leaks mass monotonically: total is ≤ SCALE but the
    # leak is bounded (each div loses < 1 unit per operand per round)
    assert total <= g.SCALE
    assert total > 0.8 * g.SCALE


def test_pagerank_vertices_match_candidate_graph(spark, sf_dir):
    pr_ids = {r.doc_id for r in g.graph_pagerank(spark, sf_dir).collect()}
    pairs = minhash_lsh_candidates(spark, sf_dir).collect()
    edge_ids = {r.doc1 for r in pairs} | {r.doc2 for r in pairs}
    assert pr_ids == edge_ids


def test_lpa_partitions_the_vertex_set(spark, sf_dir):
    from spec_search_spark.operators.graph import (
        _edges_deg,
        label_propagation_communities,
    )

    comm = label_propagation_communities(spark, sf_dir).collect()
    _, deg = _edges_deg(spark, sf_dir)
    n_vertices = deg.count()
    vertex_ids = {r["doc_id"] for r in deg.collect()}
    # every vertex lands in exactly one community
    assert sum(r["n_members"] for r in comm) == n_vertices
    for r in comm:
        assert r["n_members"] >= 1
        # community ids are propagated doc_ids from the graph
        assert r["community"] in vertex_ids
    # propagation merges labels: strictly fewer communities than vertices
    # (the near-dup graph always has at least one multi-node neighborhood)
    assert len(comm) < n_vertices


def test_weighted_shortest_paths_match_python_bellman_ford(spark, sf_dir):
    from spec_search_spark.operators.graph import (
        SP_ROUNDS,
        _edges_deg,
        weighted_shortest_paths,
    )

    got = {r.doc_id: r.dist for r in weighted_shortest_paths(spark, sf_dir).collect()}
    edges, deg = _edges_deg(spark, sf_dir)
    nchars = {
        r.doc_id: r.n_chars
        for r in spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "n_chars")
        .collect()
    }
    e = [
        (r.a, r.b, abs(nchars[r.a] - nchars[r.b]) + 1)
        for r in edges.collect()
    ]
    degs = {}
    for a, _, _ in e:
        degs[a] = degs.get(a, 0) + 1
    src = min(sorted(degs, key=lambda v: (-degs[v], v))[:1])
    dist = {src: 0}
    for _ in range(SP_ROUNDS):
        nxt = dict(dist)
        for a, b, w in e:
            if a in dist and dist[a] + w < nxt.get(b, float("inf")):
                nxt[b] = dist[a] + w
        dist = nxt
    assert got == dist
    assert len(got) >= 2 and got[src] == 0
