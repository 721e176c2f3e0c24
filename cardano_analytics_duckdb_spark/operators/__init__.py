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
# _WINDOW is the explicit r6 rotation (policy: pin the reference-parity
# cardano family; include everything NEW or whose shared helpers CHANGED
# this round; fill the rest with the longest-unchecked queries — r1-vintage
# relational/analytic rows and the r3-vintage textops/similarity family
# whose helpers have evolved since their last driver row).  Every r4/r5
# green query whose code is untouched rotates out; the pytest oracle suite
# still covers every query regardless of position.
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
    # r6-new (bounded cluster reports + packing eval)
    "cardano_address_cluster_summary",
    "image_dup_cluster_summary",
    "packing_efficiency_eval",
    "kmeans_cluster_profile",
    # r6-changed: minhash candidate generation grew the signature-level
    # hot-bucket collapse; pHash banding was re-parameterized
    "minhash_band_buckets",
    "minhash_recall_eval",
    "semantic_dedup_pairs",
    "image_phash_near_dup_pairs",
    "image_dup_clusters",
    # longest-unchecked: last driver row r1 (window rotation, all
    # pytest-green since) — relational/analytic/sampling families
    "small_quantity_part_revenue",
    "priority_returned_order_counts",
    "disjunctive_brand_revenue",
    "nation_pair_volume",
    "nation_market_share",
    "rich_inactive_customers",
    "stratified_order_sample",
    "returned_without_accepted_orders",
    "cheapest_supplier_per_part",
    "order_summary_stats",
    "customers_with_high_value_orders",
    "customers_without_orders",
    "priority_order_union",
    "first_half_only_custkeys",
    "slot_time_conversion",
    "status_price_matrix",
    "supplier_volume_by_nation",
    "returned_item_customers",
    "brand_shipment_stats",
    "price_percentiles",
    # longest-unchecked r3-vintage: the textops family + the two
    # similarity pair queries the r5 verdict called out
    "ngram_jaccard_pairs",
    "embedding_near_dup_pairs",
    "doc_quality_scores",
    "lang_id_scores",
    "alpha_token_stats",
    "rolling_fingerprints",
)
# out this round for the three r6-new queries: part_name_tokens (r1),
# repeat_buyer_custkeys (r1), bpe_token_counts (r3) — all simple
# single-shape queries over columns whose loaders have no r6 diff; all
# stay pytest-oracle-green.


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
