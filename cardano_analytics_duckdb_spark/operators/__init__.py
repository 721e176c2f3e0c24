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
# _WINDOW is the explicit r7 rotation (policy: pin the reference-parity
# cardano family; include everything NEW or whose shared helpers CHANGED
# this round; fill the rest strictly oldest-first by last driver-green
# round, computed from CORRECTNESS_r1..r6).  Every r5/r6 green query whose
# code is untouched rotates out; the pytest oracle suite still covers
# every query regardless of position.  After r7 every one of the 121
# queries registered before this round has a driver row in some round;
# the queries added mid-r7 are in this window for their first row.
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
    # never driver-checked (added after the r6 window froze) — the r6
    # verdict's #2 ask
    "bigram_logprob_scores",
    "near_dup_survivors",
    "simhash_recall_eval",
    # new in r7 (never driver-checked)
    "sq8_topk",
    "sq8_recall_eval",
    "duplicated_ngram_coverage",
    "bpe_merge_candidates",
    "cardano_address_pagerank",
    "doc_chunks",
    "corpus_keep_decisions",
    "kmeans_silhouette_eval",
    "cross_source_dup_leakage",
    "pq_topk",
    "pq_recall_eval",
    "bpe_vocab_merges",
    # last driver row r1
    "part_name_tokens",
    "repeat_buyer_custkeys",
    # last driver row r3
    "bpe_token_counts",
    "cosine_topk",
    "cross_nation_orders",
    "doc_regex_features",
    "embedding_dim_stats",
    "embedding_norm_stats",
    "exact_dedup_groups",
    "frame_sample_features",
    "image_decode_features",
    "image_resize_features",
    "ivf_topk",
    "lsh_bucket_assignments",
    "lsh_bucketed_near_dup_pairs",
    "near_dup_doc_clusters",
    "order_brand_sets",
    "part_name_levenshtein_pairs",
    "payload_metadata",
    "simhash_fingerprints",
)
# Displaced by the five r7-late additions above under the
# never-checked-first policy (a query with NO driver row ever outranks
# an attested one): the 2 r6-verdict-named r5 rows
# (`lsh_multiband_near_dup_pairs`, `tfidf_top_terms`) and 3 r4 rows
# (`approx_user_stats`, `curated_corpus_sample`, `knn_join_topk`).  The
# r8 oldest-first backlog leads with those five, then
# `benchmark_contamination` (r4) and the r5 block.
# out this round: every r5/r6-green row with no r7 code diff (cluster
# reports, minhash family, the r1-vintage relational block re-attested in
# r6, ...).  Still in the oldest-first backlog for r8: user_hourly_gapfill,
# user_running_value, user_conversion_funnel, user_event_gaps,
# weekly_cohort_retention, status_price_range_frame, top_revenue_suppliers,
# order_status_unpivot, price_decile_stats, revenue_grouping_sets,
# events_within_minute_pairs, events_sliding_10min, events_asof_purchase,
# benchmark_contamination (r4 — displaced mid-r7 by the new sq8 /
# span-dedup / bpe-merge / pagerank / doc-chunking / keep-decision
# queries) and
# the r5 block.  All stay pytest-oracle-green every round.


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
