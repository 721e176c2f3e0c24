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
# _WINDOW is the explicit r10 rotation (policy: pin the reference-parity
# cardano family; include everything NEW or whose shared helpers CHANGED
# this round; fill the rest strictly oldest-first by last driver-green
# round, computed from CORRECTNESS_r1..r9).  All 135 registered queries
# are ever-driver-green (133) or new this round (2); r10 is the r9
# verdict's "Next round" #1 ask verbatim: cardano family pinned + the two
# NEW null-aware NOT IN queries + the entire 13-query r6-vintage backlog
# + the oldest 20 (alphabetical within equal vintage) of the r7 block —
# leaving no query's last driver row older than r7.  The pytest oracle
# suite still hash-checks every query every round regardless of position.
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
    # NEW this round (r9 verdict ask #7: Q16 shape + null-poisoned NOT IN)
    "distinct_supplier_part_counts",
    "not_in_null_semantics",
    # NEW this round: the remaining uncovered TPC-H decision-support
    # shapes — Q6, and adapted (no partsupp/shipmode columns in the
    # testdata) Q9/Q11/Q12/Q13/Q14/Q20
    "forecast_revenue_change",
    "nation_part_profit",
    "late_ship_priority_counts",
    "customer_order_distribution",
    "promo_revenue_share",
    "significant_parts_value",
    "excess_volume_suppliers",
    # NEW this round: rule-based corpus curation (Gopher-style quality
    # flags) and PII redaction with audit counts
    "gopher_quality_flags",
    "pii_redaction_stats",
    # NEW this round: watermarked stream-stream LEFT OUTER interval join
    "streaming_click_nopurchase_join",
    # NEW this round: FULL OUTER join shape + CUBE (completing the join
    # inventory and the rollup/grouping-sets/cube trio)
    "nation_balance_coverage",
    "returnflag_status_cube",
    # last driver row r6 — the whole backlog named in the r9 verdict
    "price_percentiles",
    "priority_order_union",
    "priority_returned_order_counts",
    "returned_item_customers",
    "returned_without_accepted_orders",
    "rich_inactive_customers",
    "rolling_fingerprints",
    "semantic_dedup_pairs",
    "slot_time_conversion",
    "small_quantity_part_revenue",
    "status_price_matrix",
    "stratified_order_sample",
    "supplier_volume_by_nation",
    # last driver row r7 — oldest 8 (alphabetical within equal vintage;
    # 12 slots of the r9-planned 20 ceded to the NEW queries above)
    "bigram_logprob_scores",
    "bpe_merge_candidates",
    "bpe_token_counts",
    "bpe_vocab_merges",
    "cardano_address_pagerank",
    "corpus_keep_decisions",
    "cosine_topk",
    "cross_nation_orders",
)
# Still in the oldest-first backlog for r11 (last row r7, rotated out only
# because the window is 50): cross_source_dup_leakage, doc_chunks,
# doc_regex_features, duplicated_ngram_coverage,
# embedding_dim_stats, embedding_norm_stats, exact_dedup_groups,
# frame_sample_features, image_decode_features, image_resize_features,
# ivf_topk, kmeans_silhouette_eval, lsh_bucket_assignments,
# lsh_bucketed_near_dup_pairs, near_dup_doc_clusters, near_dup_survivors,
# order_brand_sets, part_name_levenshtein_pairs, part_name_tokens,
# payload_metadata, pq_recall_eval, pq_topk, repeat_buyer_custkeys,
# simhash_fingerprints, simhash_recall_eval, sq8_recall_eval, sq8_topk —
# then the r8 block.  All stay pytest-oracle-green every round.


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
