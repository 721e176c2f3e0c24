"""Batched BPE training contract (r7 verdict item #5).

``bpe_vocab_merges(batch=1)`` — the registered default — is the exact
serial argmax the unrolled DuckDB oracle replays (covered by the oracle
suite).  ``batch=m`` is the scale path: ~m-fold fewer driver round-trips
by greedily merging up to m top-scoring SYMBOL-DISJOINT pairs per Spark
job.  These tests pin the invariants that make that approximation safe.
"""

from __future__ import annotations

import pytest

from cardano_analytics_duckdb_spark.operators.textops import bpe_vocab_merges


@pytest.fixture(scope="module")
def serial(spark, sf_dir):
    return [tuple(r) for r in bpe_vocab_merges(spark, sf_dir).collect()]


def test_batch_one_is_the_registered_default(spark, sf_dir, serial):
    explicit = [
        tuple(r) for r in bpe_vocab_merges(spark, sf_dir, batch=1).collect()
    ]
    assert explicit == serial


def test_batched_first_merge_is_the_global_argmax(spark, sf_dir, serial):
    """The first pick of the first batch is the same unconstrained argmax
    serial training takes — batching can only affect later picks."""
    batched = [
        tuple(r) for r in bpe_vocab_merges(spark, sf_dir, batch=3).collect()
    ]
    assert batched[0] == serial[0]


def test_batched_merges_are_well_formed_and_deterministic(spark, sf_dir):
    rounds = 6
    a = [
        tuple(r)
        for r in bpe_vocab_merges(
            spark, sf_dir, rounds=rounds, batch=3
        ).collect()
    ]
    b = [
        tuple(r)
        for r in bpe_vocab_merges(
            spark, sf_dir, rounds=rounds, batch=3
        ).collect()
    ]
    assert a == b, "batched training must be deterministic"
    assert [m[0] for m in a] == list(range(1, rounds + 1))
    seen_merged = set()
    for _, left, right, merged, score in a:
        assert left + right == merged
        assert score > 0
        assert merged not in seen_merged, "a symbol merged twice"
        seen_merged.add(merged)


def test_batch_respects_symbol_disjointness_within_a_batch(spark, sf_dir):
    """One batch of size `rounds` == exactly one scoring job; every pick
    shares no symbol with an earlier pick of the same batch (that is what
    makes the in-batch replaces order-independent)."""
    rounds = 5
    one_batch = [
        tuple(r)
        for r in bpe_vocab_merges(
            spark, sf_dir, rounds=rounds, batch=rounds
        ).collect()
    ]
    used: set[str] = set()
    for _, left, right, merged, _ in one_batch:
        assert left not in used and right not in used
        used.update((left, right))
