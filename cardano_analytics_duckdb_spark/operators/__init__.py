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
# _WINDOW is the explicit r8 rotation (policy: pin the reference-parity
# cardano family; include everything NEW or whose shared helpers CHANGED
# this round; fill the rest strictly oldest-first by last driver-green
# round, computed from CORRECTNESS_r1..r7).  After r7 all 133 registered
# queries are ever-driver-green; r8 is pure freshness — the entire
# r4-vintage tail (17 queries, the oldest rows in the attestation
# union) plus the oldest 18 of the r5 block, exactly the r7 verdict's
# "Next round" #1 ask.  The pytest oracle suite still hash-checks every
# query every round regardless of position.
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
    # last driver row r4 — the whole vintage, verdict-named first
    "approx_user_stats",
    "curated_corpus_sample",
    "knn_join_topk",
    "benchmark_contamination",
    "events_asof_purchase",
    "events_sliding_10min",
    "events_within_minute_pairs",
    "order_status_unpivot",
    "price_decile_stats",
    "revenue_grouping_sets",
    "status_price_range_frame",
    "top_revenue_suppliers",
    "user_conversion_funnel",
    "user_event_gaps",
    "user_hourly_gapfill",
    "user_running_value",
    "weekly_cohort_retention",
    # last driver row r5 — oldest-first fill (verdict-named leaders first)
    "lsh_multiband_near_dup_pairs",
    "tfidf_top_terms",
    "address_credentials",
    "audio_waveform_features",
    "corpus_stats_by_source",
    "event_props_json",
    "event_value_histogram",
    "event_value_outliers",
    "ivf_recall_eval",
    "lang_id_confusion",
    "large_volume_customers",
    "lineitem_column_profile",
    "lineitem_rollup",
    "repetition_scores",
    "sequence_packing_bins",
    "source_mix_weights",
    "stratified_split_counts",
    "vocab_top_tokens",
)
# Still in the oldest-first backlog for r9 (last row r5, rotated out only
# because the window is 50): events_tumbling_5min, high_value_orders,
# pricing_summary, revenue_by_region, shipping_priority,
# status_price_position, streaming_click_purchase_join,
# streaming_dedup_events, streaming_session_windows,
# streaming_stateful_sessions, streaming_tumbling_counts,
# top_orders_per_customer, user_sessions — then the r6 block.  All stay
# pytest-oracle-green every round.


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
