"""Query library.  Each submodule exposes

- ``QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]]``
- ``ORACLE:  dict[str, str]`` — DuckDB-runnable SQL with identical output
  columns (same names, same aliasing) for hash-comparison.

``all_queries()`` / ``all_oracles()`` merge every submodule for the driver
contract in ``__spark_entry__.py``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


# The driver hard-checks only the FIRST 50 queries in dict order, so
# registration order decides which operators get a driver correctness row.
# _WINDOW is the explicit r11 rotation (policy: pin the reference-parity
# cardano family; include everything whose code or shared helpers CHANGED
# this round; fill the rest strictly oldest-first by last driver-green
# round, computed from the union of CORRECTNESS_r1..r10).  All 147
# registered queries are ever-driver-green; r11 is the r10 verdict's
# "Next round" #5 ask verbatim: cardano family pinned + the ENTIRE
# 27-query r7-vintage block (the oldest remaining) + the three queries
# rewritten this round (lang_id_scores/lang_id_confusion — packed-long
# stopword fold; revenue_by_region — shuffle_hash over forced broadcast)
# + the 5 alphabetically-first of the r8 block — leaving no query's last
# driver row older than r8.  The pytest oracle suite still hash-checks
# every query every round regardless of position.
_WINDOW = (
    # reference parity (pinned every round)
    "cardano_high_fee_txs",
    "cardano_tx_summary",
    "cardano_token_transfers",
    "cardano_token_transfers_windowed",
    "cardano_mint_totals",
    "cardano_address_utxo_stats",
    "cardano_cert_counts",
    "cardano_datum_stats",
    "cardano_fee_by_slot_group",
    "cardano_governance_activity",
    "cardano_redeemer_costs",
    "cardano_proposal_deposits",
    "cardano_transfer_summary_stats",
    "cardano_transfer_type_stats",
    "cardano_address_clusters",
    # CHANGED this round (r10 verdict #2/#3): re-verify under the driver
    "lang_id_scores",
    "lang_id_confusion",
    "revenue_by_region",
    # last driver row r7 — the entire oldest block (r10 verdict #5)
    "cross_source_dup_leakage",
    "doc_chunks",
    "doc_regex_features",
    "duplicated_ngram_coverage",
    "embedding_dim_stats",
    "embedding_norm_stats",
    "exact_dedup_groups",
    "frame_sample_features",
    "image_decode_features",
    "image_resize_features",
    "ivf_topk",
    "kmeans_silhouette_eval",
    "lsh_bucket_assignments",
    "lsh_bucketed_near_dup_pairs",
    "near_dup_doc_clusters",
    "near_dup_survivors",
    "order_brand_sets",
    "part_name_levenshtein_pairs",
    "part_name_tokens",
    "payload_metadata",
    "pq_recall_eval",
    "pq_topk",
    "repeat_buyer_custkeys",
    "simhash_fingerprints",
    "simhash_recall_eval",
    "sq8_recall_eval",
    "sq8_topk",
    # last driver row r8 — alphabetically-first 5 of the next-oldest block
    "address_credentials",
    "approx_user_stats",
    "audio_waveform_features",
    "benchmark_contamination",
    "corpus_stats_by_source",
)
# Still in the oldest-first backlog for r12 (last row r8, rotated out only
# because the window is 50): curated_corpus_sample, event_props_json,
# event_value_histogram, event_value_outliers, events_asof_purchase,
# events_sliding_10min, events_within_minute_pairs, ivf_recall_eval,
# knn_join_topk, large_volume_customers, lineitem_column_profile,
# lineitem_rollup, lsh_multiband_near_dup_pairs, order_status_unpivot,
# price_decile_stats, repetition_scores, revenue_grouping_sets,
# sequence_packing_bins, source_mix_weights, status_price_range_frame,
# stratified_split_counts, tfidf_top_terms, top_revenue_suppliers,
# user_conversion_funnel, user_event_gaps, user_hourly_gapfill,
# user_running_value, vocab_top_tokens, weekly_cohort_retention — then
# the r9 block.  All stay pytest-oracle-green every round.


def _ordered(pick) -> dict:
    merged = {}
    for mod in _modules():
        merged.update(pick(mod))
    out = {k: merged[k] for k in _WINDOW if k in merged}
    out.update(merged)  # existing keys keep their (front) position
    return out


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _ordered(lambda m: m.QUERIES)


def all_oracles() -> dict[str, str]:
    return _ordered(lambda m: m.ORACLE)


def _modules():
    from ..streaming import windows as stream_windows
    from . import (
        addresses,
        analytic,
        cardano,
        dedup,
        graph,
        mixing,
        multimodal,
        relational,
        reports,
        similarity,
        temporal,
        textops,
        windows,
    )

    return [
        cardano,
        reports,
        addresses,
        graph,
        dedup,
        similarity,
        textops,
        mixing,
        multimodal,
        stream_windows,
        windows,
        temporal,
        analytic,
        relational,
    ]
