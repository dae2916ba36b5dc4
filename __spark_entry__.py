"""Driver contract for the spark-graft builder (PySpark target).

entry():       flagship frontier scheduling round at sf0.001.
queries():     implemented operators from SURVEY.md §2 (+ north_rule
               frontier ops and training-data-pipeline ops).
oracle_sql():  DuckDB equivalents over the same portable synthetic
               derivation (cmoncrawl_spark/datagen.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from cmoncrawl_spark import queries as q

    return q.q_frontier_round(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from cmoncrawl_spark import queries as q

    return {
        "q_index_exact": q.q_index_exact,
        "q_index_prefix": q.q_index_prefix,
        "q_index_host": q.q_index_host,
        "q_index_domain": q.q_index_domain,
        "q_index_daterange": q.q_index_daterange,
        "q_index_limit": q.q_index_limit,
        "q_index_extra_where": q.q_index_extra_where,
        "q_unify_url_id": q.q_unify_url_id,
        "q_url_seen_dedup": q.q_url_seen_dedup,
        "q_exact_dedup_docs": q.q_exact_dedup_docs,
        "q_dedup_keep_longest": q.q_dedup_keep_longest,
        "q_frontier_round": q.q_frontier_round,
        "q_frontier_round_exact": q.q_frontier_round_exact,
        "q_frontier_round_domain": q.q_frontier_round_domain,
        "q_politeness_budgets": q.q_politeness_budgets,
        "q_fetch_schedule": q.q_fetch_schedule,
        "q_robots_policies": q.q_robots_policies,
        "q_opic_round": q.q_opic_round,
        "q_robots_allowed": q.q_robots_allowed,
        "q_token_count": q.q_token_count,
        "q_quality_stats": q.q_quality_stats,
        "q_lang_agg": q.q_lang_agg,
        "q_doc_fingerprint": q.q_doc_fingerprint,
        "q_events_hourly": q.q_events_hourly,
        "q_extract_page": q.q_extract_page,
        "q_route_match": q.q_route_match,
        "q_warc_roundtrip": q.q_warc_roundtrip,
        "q_minhash_dedup": q.q_minhash_dedup,
        "q_dedup_clusters": q.q_dedup_clusters,
        "q_bpe_token_count": q.q_bpe_token_count,
        "q_cache_key": q.q_cache_key,
        "q_registered_domain": q.q_registered_domain,
        "q_lang_id": q.q_lang_id,
        "q_rolling_fingerprint": q.q_rolling_fingerprint,
        "q_image_features": q.q_image_features,
        "q_audio_features": q.q_audio_features,
        "q_curation_pipeline": q.q_curation_pipeline,
        "q_fixture_title": q.q_fixture_title,
        "q_config_extract": q.q_config_extract,
        "q_extract_valid": q.q_extract_valid,
        "q_sessionize": q.q_sessionize,
        "q_asof_join": q.q_asof_join,
        "q_ivf_topk": q.q_ivf_topk,
        "q_simhash": q.q_simhash,
        "q_simhash_pairs": q.q_simhash_pairs,
        "q_ngram_jaccard": q.q_ngram_jaccard,
        "q_embed_dup_pairs": q.q_embed_dup_pairs,
        "q_cosine_topk": q.q_cosine_topk,
        "q_ann_topk": q.q_ann_topk,
    }


def oracle_sql() -> dict[str, str]:
    from cmoncrawl_spark.oracles import oracles

    return oracles()
