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
# _WINDOW is the explicit r13 rotation (policy unchanged: pin the
# reference-parity cardano family; include everything whose code or
# shared helpers changed this round; fill the rest strictly oldest-first
# by last driver-green round).  r13 is the r12 verdict's "Next round" #4
# ask: cardano family pinned + the six queries whose execution path
# changed in r13 (gopher_quality_flags — range shuffle dropped in front
# of the narrow Arrow kernel; pii_redaction_stats — same shuffle drop
# adopted after the equal-cache A/B; distinct_supplier_part_counts — layout-
# gated bucket-local pair-dedup, measured-rejected and reverted;
# lang_id_scores — leading range shuffle dropped; events_sliding_10min
# — rewritten agg-first, 3.1x, measured in r13_events_ab;
# knn_join_topk — batch-matmul Arrow kernel adopted, 2.7x, measured in
# r13_knn_ab) + 29 of the 33-query r9-vintage block.  Four documented
# r9 carryovers head r14's rotation:
# image_dup_cluster_summary (a strict downstream aggregation of
# image_dup_clusters — same pHash/banding pipeline,
# operators/multimodal.py — which IS in the window, so the shared path
# gets its driver row) and status_price_position (whose
# operators/windows.py window-frame machinery is covered by r12-green
# status_price_range_frame; displaced by the changed lang_id_scores)
# and streaming_tumbling_counts (streaming/windows.py keeps four other
# r9 entries in-window; displaced by the changed events_sliding_10min)
# and image_phash_near_dup_pairs (in-window image_dup_clusters builds
# directly on the same pairs helper; displaced by the changed
# knn_join_topk).
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
    # CHANGED this round: re-verify under the driver
    "gopher_quality_flags",
    "pii_redaction_stats",
    "distinct_supplier_part_counts",
    "lang_id_scores",
    "events_sliding_10min",
    "knn_join_topk",
    # last driver row r9 — the oldest block (r12 verdict #4), minus the
    # four documented carryovers above
    "alpha_token_stats",
    "brand_shipment_stats",
    "cardano_address_cluster_summary",
    "cheapest_supplier_per_part",
    "customers_with_high_value_orders",
    "customers_without_orders",
    "disjunctive_brand_revenue",
    "doc_quality_scores",
    "embedding_near_dup_pairs",
    "events_tumbling_5min",
    "first_half_only_custkeys",
    "high_value_orders",
    "image_dup_clusters",
    "kmeans_cluster_profile",
    "minhash_band_buckets",
    "minhash_recall_eval",
    "nation_market_share",
    "nation_pair_volume",
    "ngram_jaccard_pairs",
    "order_summary_stats",
    "packing_efficiency_eval",
    "pricing_summary",
    "shipping_priority",
    "streaming_click_purchase_join",
    "streaming_dedup_events",
    "streaming_session_windows",
    "streaming_stateful_sessions",
    "top_orders_per_customer",
    "user_sessions",
)
# Freshness state entering r14: r9 vintage cleared except the four
# carryovers above (head of the r14 fill).  Next-oldest block
# is r10 (bigram LM, BPE family, cosine/IVF hints, cube/rollup family,
# slot_time_conversion, ... — 32 queries).  All 147 stay
# pytest-oracle-green every round regardless of window position.


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
