"""Report layer ≙ the reference's pandas post-processing + CSV sink.

Covers SURVEY §2 items the query modules don't:

- A6 driver-side scalar stats (totals / averages / slot range,
  /root/reference/token_fee_analysis.py:310-329) — computed as ONE Spark
  ``agg`` pass *before* anything is collected, instead of pandas math on a
  fetched frame.
- A7 grouped multi-agg by transfer type with rounding
  (token_fee_analysis.py:318-325).  In the reference this is a dead path
  (``transfer_type`` is never produced upstream, guard at :319); here the
  classification is derived live from the set-comparison columns: a NULL
  input set means no token-holding input (mint-like), a NULL output set
  means no token-holding output (burn-like), else a transfer.
- S10 CSV sink (token_fee_analysis.py:345-350) and the formatted text
  summary (:354-389).

Scale notes: both stat queries aggregate the (already small) transfer
result; the CSV sink writes distributed part files via ``df.write.csv`` —
the reference's single-file ``to_csv`` is a driver-side bottleneck at any
real scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.rounding import rnd
from .cardano import _token_transfers, _token_transfers_sql

def _ttype():
    # built lazily: Column construction needs an active SparkContext
    return (
        F.when(F.col("input_addr_set").isNull(), F.lit("mint"))
        .when(F.col("output_addr_set").isNull(), F.lit("burn"))
        .otherwise(F.lit("transfer"))
    )


def _summary_agg(transfers: DataFrame) -> DataFrame:
    return transfers.agg(
        F.count("*").alias("n_transfers"),
        F.sum("tx_fee").alias("total_fee_lovelace"),
        rnd(F.sum("tx_fee") / 1e6, 6).alias("total_fee_ada"),
        rnd(F.avg("tx_fee") / 1e6, 6).alias("avg_fee_ada"),
        F.min("slot").alias("min_slot"),
        F.max("slot").alias("max_slot"),
    )


def cardano_transfer_summary_stats(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """One-row totals ≙ token_fee_analysis.py:310-329, as a single agg pass."""
    return _summary_agg(_token_transfers(spark, None, None))


_SUMMARY_STATS_SQL = f"""
WITH transfers AS ({_token_transfers_sql(None, None)})
SELECT count(*) AS n_transfers,
       CAST(sum(tx_fee) AS BIGINT) AS total_fee_lovelace,
       floor((sum(tx_fee) / 1e6) * 1000000.0 + 0.5) / 1000000.0 AS total_fee_ada,
       floor((avg(tx_fee) / 1e6) * 1000000.0 + 0.5) / 1000000.0 AS avg_fee_ada,
       min(slot) AS min_slot,
       max(slot) AS max_slot
FROM transfers
"""


def cardano_transfer_type_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped fee stats by mint/burn/transfer ≙ token_fee_analysis.py:318-325."""
    transfers = _token_transfers(spark, None, None)
    return (
        transfers.groupBy(_ttype().alias("transfer_type"))
        .agg(
            F.count("*").alias("n"),
            F.sum("tx_fee").alias("total_fee"),
            rnd(F.avg("tx_fee"), 2).alias("avg_fee"),
        )
        .orderBy("transfer_type")
    )


_TYPE_STATS_SQL = f"""
WITH transfers AS ({_token_transfers_sql(None, None)})
SELECT CASE WHEN input_addr_set IS NULL THEN 'mint'
            WHEN output_addr_set IS NULL THEN 'burn'
            ELSE 'transfer' END AS transfer_type,
       count(*) AS n,
       CAST(sum(tx_fee) AS BIGINT) AS total_fee,
       floor((avg(tx_fee)) * 100.0 + 0.5) / 100.0 AS avg_fee
FROM transfers
GROUP BY transfer_type
ORDER BY transfer_type
"""


def write_transfer_csv(transfers: DataFrame, path: str) -> None:
    """S10 CSV sink ≙ token_fee_analysis.py:345-350.

    Distributed part-file write; array columns are serialized to a '|'
    joined string first (CSV has no array type — the reference's pandas
    dump leans on repr() for the same problem).
    """
    out = transfers.withColumns(
        {
            "input_addr_set": F.concat_ws("|", "input_addr_set"),
            "output_addr_set": F.concat_ws("|", "output_addr_set"),
        }
    )
    out.write.mode("overwrite").option("header", True).csv(path)


def token_transfer_report(
    spark: SparkSession,
    min_slot: int | None = None,
    max_slot: int | None = None,
    csv_path: str | None = None,
    root: str | None = None,
    policy: bytes | None = None,
    asset_name: bytes | None = None,
) -> str:
    """End-to-end analysis ≙ token_fee_analysis.py:263-352 + summary :354-389.

    Runs the flagship transfer query, computes totals in one agg pass,
    optionally dumps the detailed CSV, and returns the formatted text
    summary.  Only the (single-row) stats and the grouped type stats are
    ever collected to the driver.
    """
    from ..lake.fixtures import TOKEN_NAME, TOKEN_POLICY

    transfers = _token_transfers(
        spark,
        min_slot,
        max_slot,
        root=root,
        policy=policy if policy is not None else TOKEN_POLICY,
        asset_name=asset_name if asset_name is not None else TOKEN_NAME,
    ).cache()
    try:
        stats = _summary_agg(transfers).first()
        by_type = (
            transfers.groupBy(_ttype().alias("transfer_type"))
            .agg(F.count("*").alias("n"), rnd(F.avg("tx_fee") / 1e6, 6).alias("avg_fee_ada"))
            .orderBy("transfer_type")
            .collect()
        )
        if csv_path is not None:
            write_transfer_csv(transfers, csv_path)
        if stats["n_transfers"] == 0:
            return "No ownership-changing token transfers found."
        lines = [
            "TOKEN TRANSFER FEE ANALYSIS",
            "=" * 40,
            f"Ownership-changing transfers: {stats['n_transfers']}",
            f"Total fees: {stats['total_fee_ada']} ADA",
            f"Average fee: {stats['avg_fee_ada']} ADA",
            f"Slot range: {stats['min_slot']} - {stats['max_slot']}",
            "",
            "By transfer type:",
        ]
        for row in by_type:
            lines.append(
                f"  {row['transfer_type']}: n={row['n']}"
                f" avg_fee={row['avg_fee_ada']} ADA"
            )
        return "\n".join(lines)
    finally:
        transfers.unpersist()


QUERIES = {
    "cardano_transfer_summary_stats": cardano_transfer_summary_stats,
    "cardano_transfer_type_stats": cardano_transfer_type_stats,
}

ORACLE = {
    "cardano_transfer_summary_stats": _SUMMARY_STATS_SQL,
    "cardano_transfer_type_stats": _TYPE_STATS_SQL,
}
