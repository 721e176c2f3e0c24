"""CLI parity tests — the reference's three entry points (SURVEY §3) driven
through ``cli.main`` with an injected session."""

from __future__ import annotations

import json
import os

from cardano_analytics_duckdb_spark.cli import main


def test_extract_then_query_roundtrip(spark, tmp_path, capsys):
    dest = str(tmp_path / "lake")
    rc = main(
        ["extract", "--blocks", "fixture", "--dest", dest, "--compact"],
        spark=spark,
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["blocks"] > 0 and stats["transactions"] > 0
    assert stats["compacted"] == 1
    assert os.path.isdir(os.path.join(dest, "tx"))

    rc = main(["query", "--lake", dest, "--min-fee", "0"], spark=spark)
    assert rc == 0
    out = capsys.readouterr().out
    assert "transactions by fee" in out and "Summary: n=" in out


def test_analyze_token_fixture(spark, capsys, tmp_path):
    csv_path = str(tmp_path / "transfers_csv")
    rc = main(
        ["analyze-token", "fixture-token", "--csv", csv_path], spark=spark
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert "TOKEN TRANSFER FEE ANALYSIS" in out
    assert "Ownership-changing transfers:" in out
    assert os.path.isdir(csv_path)


def test_analyze_token_raw_hex_and_unknown(spark, capsys):
    from cardano_analytics_duckdb_spark.lake.fixtures import (
        TOKEN_NAME,
        TOKEN_POLICY,
    )

    raw = f"{TOKEN_POLICY.hex()}.{TOKEN_NAME.hex()}"
    rc = main(["analyze-token", raw], spark=spark)
    assert rc == 0
    assert "TOKEN TRANSFER FEE ANALYSIS" in capsys.readouterr().out

    import pytest

    with pytest.raises(SystemExit):
        main(["analyze-token", "no-such-token"], spark=spark)


def test_extract_respects_stop_slot(spark, tmp_path, capsys):
    dest = str(tmp_path / "lake2")
    rc = main(
        ["extract", "--dest", dest, "--stop-slot", "150000"], spark=spark
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    full_dest = str(tmp_path / "lake3")
    main(["extract", "--dest", full_dest], spark=spark)
    full = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["blocks"] < full["blocks"]


def test_curate_writes_stratified_parquet(spark, tmp_path, capsys):
    import duckdb

    dest = str(tmp_path / "curated")
    rc = main(
        ["curate", "--data", "/root/testdata/sf0.001", "--dest", dest],
        spark=spark,
    )
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["curated_docs"] > 0
    assert stats["sources"] > 1
    # source strata are physical partition directories
    strata = [d for d in os.listdir(dest) if d.startswith("source=")]
    assert len(strata) == stats["sources"]
    # membership matches the oracle pipeline exactly (deterministic sample)
    expected = duckdb.sql(
        """
        WITH scored AS (
          SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                 len(list_distinct(string_split(text, ' '))) * 1.0
                   / len(string_split(text, ' ')) AS ttr, text
          FROM read_parquet('/root/testdata/sf0.001/documents.parquet')
        ), quality AS (
          SELECT * FROM scored WHERE n_tokens >= 5 AND ttr >= 0.3
        ), canon AS (
          SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS canon_id
          FROM quality
        )
        SELECT count(*) FROM canon
        WHERE doc_id = canon_id AND (doc_id * 2654435761) % 100 < 30
        """
    ).fetchone()[0]
    assert stats["curated_docs"] == expected
