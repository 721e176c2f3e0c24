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
# _WINDOW is the explicit r9 rotation (policy: pin the reference-parity
# cardano family; include everything NEW or whose shared helpers CHANGED
# this round; fill the rest strictly oldest-first by last driver-green
# round, computed from CORRECTNESS_r1..r8).  After r7 all 133 registered
# queries are ever-driver-green; r9 is the r8 verdict's "Next round" #2
# ask verbatim: cardano family pinned + the entire 13-query r5-vintage
# backlog + the oldest 22 (alphabetical within equal vintage) of the r6
# block — leaving no query's last driver row older than r6.  The pytest
# oracle suite still hash-checks every query every round regardless of
# position.
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
    # last driver row r5 — the whole backlog named in the r8 verdict
    "events_tumbling_5min",
    "high_value_orders",
    "pricing_summary",
    "revenue_by_region",
    "shipping_priority",
    "status_price_position",
    "streaming_click_purchase_join",
    "streaming_dedup_events",
    "streaming_session_windows",
    "streaming_stateful_sessions",
    "streaming_tumbling_counts",
    "top_orders_per_customer",
    "user_sessions",
    # last driver row r6 — oldest 22 (alphabetical within equal vintage);
    # kmeans_cluster_profile's trainer changed this round (train-loop
    # input persistence + documented round-trip cost model), so its
    # presence here doubles as the changed-code re-attestation
    "alpha_token_stats",
    "brand_shipment_stats",
    "cardano_address_cluster_summary",
    "cheapest_supplier_per_part",
    "customers_with_high_value_orders",
    "customers_without_orders",
    "disjunctive_brand_revenue",
    "doc_quality_scores",
    "embedding_near_dup_pairs",
    "first_half_only_custkeys",
    "image_dup_cluster_summary",
    "image_dup_clusters",
    "image_phash_near_dup_pairs",
    "kmeans_cluster_profile",
    "lang_id_scores",
    "minhash_band_buckets",
    "minhash_recall_eval",
    "nation_market_share",
    "nation_pair_volume",
    "ngram_jaccard_pairs",
    "order_summary_stats",
    "packing_efficiency_eval",
)
# Still in the oldest-first backlog for r10 (last row r6, rotated out only
# because the window is 50): price_percentiles, priority_order_union,
# priority_returned_order_counts, returned_item_customers,
# returned_without_accepted_orders, rich_inactive_customers,
# rolling_fingerprints, semantic_dedup_pairs, slot_time_conversion,
# small_quantity_part_revenue, status_price_matrix,
# stratified_order_sample, supplier_volume_by_nation — then the r7 block.
# All stay pytest-oracle-green every round.


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
