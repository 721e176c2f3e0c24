"""Every Arrow-kernel query with a kept zero-Python twin must agree
with it ROW-FOR-ROW: the twin is a deployment fallback, not
documentation, so its results are held to the same bar as the shipped
path (the oracle suite hash-checks only whichever variant is
registered).  The unshipped measured-rejected twins (cosine_topk_arrow,
_simhash_frame_fold) are covered too — a rejected-but-kept variant
that silently diverges would poison any future re-measurement."""

from __future__ import annotations


def _rows(df):
    cols = sorted(df.columns)
    return sorted(
        tuple(str(x) for x in r) for r in df.select(*cols).collect()
    )


def test_gopher_twin_parity(spark, sf_dir):
    from cardano_analytics_duckdb_spark.operators.textops import (
        gopher_quality_flags,
        gopher_quality_flags_jvm,
    )

    assert _rows(gopher_quality_flags(spark, sf_dir)) == _rows(
        gopher_quality_flags_jvm(spark, sf_dir)
    )


def test_pii_twin_parity(spark, sf_dir):
    from cardano_analytics_duckdb_spark.operators.textops import (
        pii_redaction_stats,
        pii_redaction_stats_jvm,
    )

    assert _rows(pii_redaction_stats(spark, sf_dir)) == _rows(
        pii_redaction_stats_jvm(spark, sf_dir)
    )


def test_bpe_twin_parity(spark, sf_dir):
    from cardano_analytics_duckdb_spark.operators.textops import (
        bpe_token_counts,
        bpe_token_counts_jvm,
    )

    assert _rows(bpe_token_counts(spark, sf_dir)) == _rows(
        bpe_token_counts_jvm(spark, sf_dir)
    )


def test_knn_twin_parity(spark, sf_dir):
    from cardano_analytics_duckdb_spark.operators.similarity import (
        knn_join_topk,
        knn_join_topk_jvm,
    )

    assert _rows(knn_join_topk(spark, sf_dir)) == _rows(
        knn_join_topk_jvm(spark, sf_dir)
    )


def test_cosine_rejected_twin_parity(spark, sf_dir):
    from cardano_analytics_duckdb_spark.operators.similarity import (
        cosine_topk,
        cosine_topk_arrow,
    )

    assert _rows(cosine_topk(spark, sf_dir)) == _rows(
        cosine_topk_arrow(spark, sf_dir)
    )


def test_simhash_rejected_twin_parity(spark, sf_dir):
    from cardano_analytics_duckdb_spark.lake.tables import load_table
    from cardano_analytics_duckdb_spark.operators.dedup import (
        _simhash_frame,
        _simhash_frame_fold,
    )

    docs = load_table(spark, sf_dir, "documents")
    assert _rows(_simhash_frame(docs)) == _rows(_simhash_frame_fold(docs))


def test_bpe_twin_parity_null_text(spark, tmp_path):
    # r13 ADVICE: the Arrow kernel raised TypeError on a null text value
    # while the JVM twin propagates null — the testdata fixture has no
    # nulls, so parity is pinned here on a synthetic nullable lake.
    import pyarrow as pa
    import pyarrow.parquet as pq

    from cardano_analytics_duckdb_spark.operators.textops import (
        bpe_token_counts,
        bpe_token_counts_jvm,
    )

    tbl = pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a b c", None, "x1 !"], pa.string()),
            "lang": pa.array(["en"] * 3, pa.string()),
            "source": pa.array(["s"] * 3, pa.string()),
            "n_chars": pa.array([5, 0, 4], pa.int64()),
        }
    )
    lake = tmp_path / "nulldocs"
    lake.mkdir()
    pq.write_table(tbl, lake / "documents.parquet")
    kernel = _rows(bpe_token_counts(spark, str(lake)))
    assert kernel == _rows(bpe_token_counts_jvm(spark, str(lake)))
    # the null row survives with null counts (not dropped, not zeros)
    null_row = [r for r in kernel if r[1] == "2"]
    assert len(null_row) == 1 and "None" in null_row[0]
