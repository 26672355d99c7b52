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
