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
# _WINDOW is the explicit r12 rotation (policy: pin the reference-parity
# cardano family — all 15 also CHANGED this round via the flagship's
# size-gated broadcasts; include everything whose code or shared helpers
# changed; fill the rest strictly oldest-first by last driver-green
# round).  r12 is the r11 verdict's "Next round" #4 ask: cardano family
# pinned + the queries rewritten this round (lang_id pair — 65535-token
# lane-saturation slice in fold AND oracle; forecast_revenue_change —
# pushdown-friendly timestamp bounds; gopher_quality_flags — shared flag
# projection refactor; pii_redaction_stats — Arrow subn kernel adopted;
# revenue_by_region — layout_for hints + the r11 #7 ask) + the ENTIRE 29-query
# r8-vintage block — leaving no query's last driver row older than r9.
# The five other layout-hinted tpch queries (late_ship_priority_counts,
# nation_part_profit, customer_order_distribution, promo_revenue_share,
# distinct_supplier_part_counts) carry an inert hint at driver scale (no
# layout declared there) — lower re-verification value than the pii
# kernel swap, which changes the execution path outright — and stay
# pytest-oracle-green every round like all 147.
_WINDOW = (
    # reference parity (pinned every round; all changed: broadcast gate)
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
    # CHANGED this round: re-verify under the driver
    "lang_id_scores",
    "lang_id_confusion",
    "forecast_revenue_change",
    "gopher_quality_flags",
    "pii_redaction_stats",
    "revenue_by_region",
    # last driver row r8 — the entire oldest block (r11 verdict #4)
    "curated_corpus_sample",
    "event_props_json",
    "event_value_histogram",
    "event_value_outliers",
    "events_asof_purchase",
    "events_sliding_10min",
    "events_within_minute_pairs",
    "ivf_recall_eval",
    "knn_join_topk",
    "large_volume_customers",
    "lineitem_column_profile",
    "lineitem_rollup",
    "lsh_multiband_near_dup_pairs",
    "order_status_unpivot",
    "price_decile_stats",
    "repetition_scores",
    "revenue_grouping_sets",
    "sequence_packing_bins",
    "source_mix_weights",
    "status_price_range_frame",
    "stratified_split_counts",
    "tfidf_top_terms",
    "top_revenue_suppliers",
    "user_conversion_funnel",
    "user_event_gaps",
    "user_hourly_gapfill",
    "user_running_value",
    "vocab_top_tokens",
    "weekly_cohort_retention",
)
# Freshness state entering r13: the r8 backlog is CLEARED (everything
# above).  Oldest remaining block is r9 — rotate it in next (minus
# whatever changes in r13), e.g. address_credentials, approx_user_stats,
# audio_waveform_features, benchmark_contamination,
# corpus_stats_by_source went green in r11; the r9-vintage set
# (bigram LM, BPE family, streaming-window family, graph family, ...)
# is next-oldest.  All 147 stay pytest-oracle-green every round.


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
