"""Operator packs. Each module exports QUERIES (name → fn(spark, sf_dir)
→ DataFrame) and ORACLES (name → DuckDB SQL). The driver contract
(`/root/repo/__spark_entry__.py`) aggregates them.
"""

from __future__ import annotations


def all_queries():
    from spec_search_spark.operators import (
        affinity,
        agent_tools,
        behavior,
        bm25,
        bucketed,
        corpus_build,
        corpus_info,
        dedup,
        drift,
        extensibility,
        fuzzy,
        graph,
        graph_ann,
        hard_negatives,
        ivf,
        ivfpq,
        kmeans,
        layout,
        lm_quality,
        maintenance,
        ml,
        mllib_lsh,
        mmr,
        multimodal,
        pii,
        pipeline_ops,
        pq,
        psl,
        rank_stats,
        relational,
        rm3,
        runtime_filter,
        scalar_sql,
        search_pipeline,
        sheets_connector,
        sheets_pipeline,
        similarity,
        sketches,
        skew,
        span_dedup,
        text_analysis,
        tpch_extra,
        unigram_lm,
        url_ops,
        vector_quant,
        windows,
        winnowing,
    )
    from spec_search_spark.sources import formats

    q: dict = {}
    o: dict = {}
    for mod in (
        relational,
        affinity,
        agent_tools,
        behavior,
        bm25,
        bucketed,
        windows,
        sheets_pipeline,
        sheets_connector,
        text_analysis,
        lm_quality,
        dedup,
        drift,
        rank_stats,
        corpus_info,
        corpus_build,
        span_dedup,
        similarity,
        multimodal,
        scalar_sql,
        ivf,
        ivfpq,
        kmeans,
        layout,
        maintenance,
        ml,
        mmr,
        search_pipeline,
        rm3,
        runtime_filter,
        sketches,
        skew,
        mllib_lsh,
        tpch_extra,
        unigram_lm,
        url_ops,
        extensibility,
        fuzzy,
        graph,
        graph_ann,
        hard_negatives,
        pii,
        pipeline_ops,
        pq,
        psl,
        vector_quant,
        winnowing,
        formats,
    ):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    from spec_search_spark.streaming import incremental as streaming_inc
    from spec_search_spark.streaming import stateful as streaming_stateful

    for mod in (streaming_inc, streaming_stateful):
        q.update(mod.QUERIES)
        o.update(mod.ORACLES)
    return q, o
