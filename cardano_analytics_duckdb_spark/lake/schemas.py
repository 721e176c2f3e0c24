"""Spark StructTypes for the Cardano lake tables.

Mirrors the reference's PyArrow schema dispatch ``get_parquet_schema``
(/root/reference/ogmios_parquet.py:14-173) with the type mapping of
SURVEY §1.3: uint64→long (Cardano magnitudes fit int64), uint16→int,
fixed-width binary→binary (length enforced in tests, not types),
dictionary<string>→string (dictionary encoding is a physical parquet
concern — Spark's writer applies it automatically).

Partition column: ``slot_group = floor(slot / SLOT_GROUP_SIZE) * SLOT_GROUP_SIZE``
(layout ≙ ogmios_parquet.py:212-215, size ≙ config.py:25-26).
"""

from __future__ import annotations

from pyspark.sql import types as T

SLOT_GROUP_SIZE = 200_000  # ≙ /root/reference/config.py:25-26

_common = [
    T.StructField("slot", T.LongType(), False),
    T.StructField("tx_id", T.BinaryType(), False),
]

TX = T.StructType(
    _common
    + [
        T.StructField("tx_fee", T.LongType(), False),
        T.StructField("input_count", T.IntegerType(), False),
        T.StructField("output_count", T.IntegerType(), False),
        T.StructField("redeemer_count", T.IntegerType(), False),
        T.StructField("witness_datum_count", T.IntegerType(), False),
        T.StructField("has_mint", T.BooleanType(), False),
        T.StructField("has_withdrawal", T.BooleanType(), False),
        T.StructField("has_cert", T.BooleanType(), False),
        T.StructField("has_vote", T.BooleanType(), False),
        T.StructField("has_proposal", T.BooleanType(), False),
        T.StructField(
            "inputs",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tx_id", T.BinaryType(), False),
                        T.StructField("output_index", T.IntegerType(), False),
                    ]
                )
            ),
            False,
        ),
    ]
)  # ≙ ogmios_parquet.py:25-52

UTXO = T.StructType(
    _common
    + [
        T.StructField("output_index", T.IntegerType(), False),
        T.StructField("address", T.StringType(), False),
        T.StructField("lovelace", T.LongType(), False),
        T.StructField("has_token", T.BooleanType(), False),
        T.StructField("has_datum", T.BooleanType(), False),
        T.StructField("has_ref_script", T.BooleanType(), False),
    ]
)  # ≙ ogmios_parquet.py:54-67

MINT = T.StructType(
    _common
    + [
        T.StructField("policy_id", T.BinaryType(), False),
        T.StructField("asset_name", T.BinaryType(), False),
        T.StructField("quantity", T.LongType(), False),  # signed: burns < 0
    ]
)  # ≙ ogmios_parquet.py:69-78

ASSET = T.StructType(
    _common
    + [
        T.StructField("output_index", T.IntegerType(), False),
        T.StructField("address", T.StringType(), False),
        T.StructField("policy_id", T.BinaryType(), False),
        T.StructField("asset_name", T.BinaryType(), False),
        T.StructField("amount", T.LongType(), False),
    ]
)  # ≙ ogmios_parquet.py:80-91

DATUM = T.StructType(
    _common
    + [
        T.StructField("output_index", T.IntegerType(), False),
        T.StructField("datum_hash", T.BinaryType(), False),
        T.StructField("is_inline", T.BooleanType(), False),
        T.StructField("inline_datum", T.BinaryType(), True),
    ]
)  # ≙ ogmios_parquet.py:93-103

CERT = T.StructType(
    _common + [T.StructField("type", T.StringType(), False)]
)  # ≙ ogmios_parquet.py:105-112

CERT_STAKE = T.StructType(
    CERT.fields
    + [
        T.StructField("credential", T.BinaryType(), True),
        T.StructField("pool_id", T.StringType(), True),
        T.StructField("drep_id", T.StringType(), True),
    ]
)  # ≙ ogmios_parquet.py:114-124

CERT_POOL = T.StructType(
    CERT.fields
    + [
        T.StructField("pool_id", T.StringType(), True),
        T.StructField("reward_account", T.StringType(), True),
        T.StructField("pledge", T.LongType(), True),
        T.StructField("margin_numerator", T.LongType(), True),
        T.StructField("margin_denominator", T.LongType(), True),
        T.StructField("cost", T.LongType(), True),
        T.StructField("metadata_hash", T.BinaryType(), True),
        T.StructField("metadata_url", T.StringType(), True),
        T.StructField("retirement_epoch", T.LongType(), True),
    ]
)  # ≙ ogmios_parquet.py:126-142

CERT_CC = T.StructType(
    CERT.fields
    + [
        T.StructField("member_id", T.BinaryType(), True),
        T.StructField("delegate_id", T.BinaryType(), True),
        T.StructField("metadata_hash", T.BinaryType(), True),
        T.StructField("metadata_url", T.StringType(), True),
    ]
)  # ≙ ogmios_parquet.py:144-156

CERT_DREP = T.StructType(
    CERT.fields
    + [
        T.StructField("drep_id", T.BinaryType(), True),
        T.StructField("drep_type", T.StringType(), True),
        T.StructField("metadata_hash", T.BinaryType(), True),
        T.StructField("metadata_url", T.StringType(), True),
    ]
)  # ≙ ogmios_parquet.py:158-170

TX_RAW = T.StructType(
    [
        T.StructField("tx_id", T.BinaryType(), False),
        T.StructField("slot", T.LongType(), False),
        T.StructField("raw_cbor", T.BinaryType(), False),
    ]
)  # ≙ ogmios_parquet.py:16-23 (extraction disabled in reference at :693-695)

# -- README-only stretch tables (SURVEY §1.2 decision) ------------------------
# No extraction code exists in the reference for these; schemas come from the
# README spec, with `slot` added so they partition like every other table.

VOTE = T.StructType(
    _common
    + [
        T.StructField("voter", T.StringType(), False),
        T.StructField("action_id_tx", T.BinaryType(), False),
        T.StructField("action_id_index", T.IntegerType(), False),
        T.StructField("vote", T.IntegerType(), False),
        T.StructField("anchor", T.StringType(), True),
    ]
)  # ≙ /root/reference/README.md:75-81

PROPOSAL = T.StructType(
    _common
    + [
        T.StructField("proposal_index", T.IntegerType(), False),
        T.StructField("deposit", T.LongType(), False),
        T.StructField("return_account", T.StringType(), False),
        T.StructField("type", T.IntegerType(), False),
        T.StructField("anchor", T.StringType(), True),
    ]
)  # ≙ README.md:83-89

REDEEMER = T.StructType(
    _common
    + [
        T.StructField("tag", T.IntegerType(), False),
        T.StructField("redeemer_index", T.IntegerType(), False),
        T.StructField("data", T.BinaryType(), True),
        T.StructField("mem", T.LongType(), False),
        T.StructField("steps", T.LongType(), False),
    ]
)  # ≙ README.md:99-105

CARDANO_SCHEMAS: dict[str, T.StructType] = {
    "tx": TX,
    "utxo": UTXO,
    "mint": MINT,
    "asset": ASSET,
    "datum": DATUM,
    "cert": CERT,
    "cert_stake": CERT_STAKE,
    "cert_pool": CERT_POOL,
    "cert_cc": CERT_CC,
    "cert_drep": CERT_DREP,
    "tx_raw": TX_RAW,
    "vote": VOTE,
    "proposal": PROPOSAL,
    "redeemer": REDEEMER,
}
