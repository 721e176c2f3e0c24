"""Cardano address decoding — the reference's last declared-unbuilt
capability (``bech32`` in /root/reference/pyproject.toml:8, never imported).

``address_credentials`` decodes the reference's KNOWN_ADDRESSES table
(/root/reference/config.py:77-82) per CIP-19: bech32 → header
(type/network) + payment credential + optional stake credential, with full
BIP-173 checksum validation.  The whole decode is Catalyst higher-order
functions (functions/bech32.py) — zero Python UDFs — so the same
expressions run vectorized over a 100 TB ``utxo.address`` column.

The oracle is a genuinely independent DuckDB implementation of the same
spec via list lambdas (list_transform/list_reduce), not a shared literal
table — both engines decode from scratch and must agree bit-for-bit.

Fun parity fact the validation surfaces: the reference's ``wingriders_v1``
constant fails its own bech32 checksum (a typo in the reference repo);
``checksum_ok`` reports it honestly on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..functions.bech32 import (
    CHARSET,
    _GEN,
    bytes_hex_expr,
    datapart_expr,
    hrp_expand_expr,
    hrp_expr,
    payload5_expr,
    payload_bytes_expr,
    polymod_expr,
    values_expr,
)


# Well-known mainnet addresses ≙ the reference's KNOWN_ADDRESSES
# (config.py:77-82) — for ad-hoc filters/joins against utxo.address;
# re-exported by cli.py.
KNOWN_ADDRESSES = {
    "minswap_v1": "addr1zxn9efv2f6w82hagxqtn62ju4m293tqvw0uhmdl64ch8uw6j2c79gy9l76sdg0xwhd7r0c0kna0tycz4y5s6mlenh8pq6s3z70",
    "sundaeswap_v1": "addr1w9qzpelu9hn45pefc0xr4ac4kdxeswq7pndul2vuj59u8tqaxdznu",
    "wingriders_v1": "addr1w8nvjzjeydcn4atcd93aac8allvrpjn7lx9cyh3rgjgqmrqk5r9ep",
    "snek_mint": "addr1q9jsu6z9sedfksdrhkpmcgvcjf9m6vhd2wn3huxy0s8cwq7k2tc80wsaltznwlfpe7vncdkhcgngll32v22m3g80luvqxjahsf",
}


def _known_addresses() -> list[tuple[str, str]]:
    return sorted(KNOWN_ADDRESSES.items())


def address_credentials(spark: SparkSession, sf_dir: str) -> DataFrame:
    df = spark.createDataFrame(_known_addresses(), "name string, address string")
    return (
        df.selectExpr(
            "name",
            "address",
            f"{hrp_expr('address')} AS hrp",
            f"{datapart_expr('address')} AS datap",
        )
        .selectExpr(
            "name",
            "address",
            "hrp",
            f"{values_expr('datap')} AS vals",
            f"{hrp_expand_expr('hrp')} AS hrp_ex",
        )
        .selectExpr(
            "name",
            "address",
            "hrp",
            "vals",
            f"{polymod_expr('hrp_ex', 'vals')} AS chk",
            f"{payload5_expr('vals')} AS p5",
        )
        .selectExpr(
            "name",
            "address",
            "(chk = 1 AND size(vals) > 6 AND array_min(vals) >= 0"
            " AND length(hrp) > 0) AS checksum_ok",
            f"{payload_bytes_expr('p5')} AS payload",
        )
        .selectExpr(
            "name",
            "address",
            "checksum_ok",
            "cast(shiftright(element_at(payload, 1), 4) as int) AS addr_type",
            "cast(element_at(payload, 1) & 15 as int) AS network",
            "if(size(payload) >= 29,"
            f" {bytes_hex_expr('slice(payload, 2, 28)')}, null) AS payment_cred",
            "if(size(payload) >= 57,"
            f" {bytes_hex_expr('slice(payload, 30, 28)')}, null) AS stake_cred",
        )
        .orderBy("name")
    )


def _oracle_sql() -> str:
    rows = ",\n  ".join(
        f"('{n}', '{a}')" for n, a in _known_addresses()
    )
    gen_terms_open = ""
    gen_terms_close = ""
    for i, g in enumerate(_GEN):
        gen_terms_open += "xor("
        gen_terms_close += (
            f", CASE WHEN ((chk >> {25 + i}) & 1) = 1 THEN {g} ELSE 0 END)"
        )
    polymod = (
        f"list_reduce(list_concat([1], list_concat(hrp_ex, vals)), (chk, v) -> "
        f"{gen_terms_open}xor((chk & 33554431) << 5, v){gen_terms_close})"
    )
    byte = (
        "list_reduce(list_concat([0], list_transform(generate_series(0, 7),"
        " b -> ((p5[((8*i + b) // 5) + 1] >> (4 - (8*i + b) % 5)) & 1))),"
        " (acc, bit) -> acc * 2 + bit)"
    )
    return f"""
WITH input(name, address) AS (VALUES
  {rows}
), s1 AS (
  SELECT name, address,
         regexp_replace(address, '1[^1]*$', '') AS hrp,
         regexp_replace(address, '^.*1', '') AS datap
  FROM input
), s2 AS (
  SELECT name, address, hrp,
         list_transform(generate_series(1, length(datap)),
           i -> strpos('{CHARSET}', datap[i]) - 1) AS vals,
         list_concat(list_concat(
           list_transform(generate_series(1, length(hrp)),
             i -> ord(hrp[i]) >> 5), [0]),
           list_transform(generate_series(1, length(hrp)),
             i -> ord(hrp[i]) & 31)) AS hrp_ex
  FROM s1
), s3 AS (
  SELECT name, address, hrp, vals,
         {polymod} AS chk,
         list_slice(vals, 1, greatest(len(vals) - 6, 0)) AS p5
  FROM s2
), s4 AS (
  SELECT name, address,
         (chk = 1 AND len(vals) > 6 AND list_min(vals) >= 0
          AND length(hrp) > 0) AS checksum_ok,
         list_transform(generate_series(0, ((len(p5) * 5) // 8) - 1),
           i -> {byte}) AS payload
  FROM s3
)
SELECT name, address, checksum_ok,
       CAST(payload[1] >> 4 AS INTEGER) AS addr_type,
       CAST(payload[1] & 15 AS INTEGER) AS network,
       CASE WHEN len(payload) >= 29 THEN
         array_to_string(list_transform(list_slice(payload, 2, 29),
           x -> printf('%02x', x)), '') END AS payment_cred,
       CASE WHEN len(payload) >= 57 THEN
         array_to_string(list_transform(list_slice(payload, 30, 57),
           x -> printf('%02x', x)), '') END AS stake_cred
FROM s4
ORDER BY name
"""


QUERIES = {
    "address_credentials": address_credentials,
}

ORACLE = {
    "address_credentials": _oracle_sql(),
}
