"""Bech32 decode parity vs an in-test pure-Python BIP-173 reference —
guards against the Spark and DuckDB expression decoders being wrong in the
same way (they share only the spec, but the spec itself is re-derived here
from the published algorithm)."""

from __future__ import annotations

from pyspark.sql import functions as F

_CHARSET = "qpzry9x8gf2tvdw0s3jn54khce6mua7l"
_GEN = (0x3B6A57B2, 0x26508E6D, 0x1EA119FA, 0x3D4233DD, 0x2A1462B3)


def _ref_decode(addr: str):
    """Published BIP-173 reference algorithm, independently restated."""
    pos = addr.rfind("1")
    hrp, data = addr[:pos], addr[pos + 1 :]
    vals = [_CHARSET.find(c) for c in data]
    chk = 1
    for v in (
        [ord(c) >> 5 for c in hrp] + [0] + [ord(c) & 31 for c in hrp] + vals
    ):
        b = chk >> 25
        chk = (chk & 0x1FFFFFF) << 5 ^ v
        for i in range(5):
            chk ^= _GEN[i] if ((b >> i) & 1) else 0
    ok = chk == 1 and len(vals) > 6 and min(vals, default=-1) >= 0
    p5 = vals[:-6]
    out = bytearray()
    for i in range((len(p5) * 5) // 8):
        byte = 0
        for b in range(8):
            j = 8 * i + b
            byte = byte * 2 + ((p5[j // 5] >> (4 - j % 5)) & 1)
        out.append(byte)
    return ok, bytes(out)


def test_address_credentials_matches_pure_python_reference(spark, sf_dir):
    from cardano_analytics_duckdb_spark.cli import KNOWN_ADDRESSES
    from cardano_analytics_duckdb_spark.operators.addresses import (
        address_credentials,
    )

    got = {r["name"]: r for r in address_credentials(spark, sf_dir).collect()}
    assert set(got) == set(KNOWN_ADDRESSES)
    for name, addr in KNOWN_ADDRESSES.items():
        ok, payload = _ref_decode(addr)
        r = got[name]
        assert r["checksum_ok"] == ok, name
        assert r["addr_type"] == payload[0] >> 4
        assert r["network"] == payload[0] & 15
        assert r["payment_cred"] == payload[1:29].hex()
        expected_stake = payload[29:57].hex() if len(payload) >= 57 else None
        assert r["stake_cred"] == expected_stake
    # the reference repo's wingriders_v1 constant carries a checksum typo
    # (config.py:80) — validation must surface it, not mask it
    assert got["wingriders_v1"]["checksum_ok"] is False
    assert got["minswap_v1"]["checksum_ok"] is True
    # CIP-19 header semantics: snek_mint is a type-0 base address on mainnet
    assert got["snek_mint"]["addr_type"] == 0
    assert got["snek_mint"]["network"] == 1
    assert got["snek_mint"]["stake_cred"] is not None
    assert got["sundaeswap_v1"]["addr_type"] == 7  # script-only, no stake
    assert got["sundaeswap_v1"]["stake_cred"] is None


def test_bech32_exprs_reject_corruption(spark, sf_dir):
    """Flipping one data character must break the checksum; the decode
    expressions are reusable over any address column (the 100 TB path)."""
    from cardano_analytics_duckdb_spark.functions.bech32 import (
        datapart_expr,
        hrp_expand_expr,
        hrp_expr,
        polymod_expr,
        values_expr,
    )

    good = "addr1w9qzpelu9hn45pefc0xr4ac4kdxeswq7pndul2vuj59u8tqaxdznu"
    corrupted = good[:-1] + ("a" if good[-1] != "a" else "c")
    df = (
        spark.createDataFrame(
            [(good,), (corrupted,)], "address string"
        )
        .selectExpr(
            "address",
            f"{hrp_expr('address')} AS hrp",
            f"{datapart_expr('address')} AS datap",
        )
        .selectExpr(
            "address",
            f"{values_expr('datap')} AS vals",
            f"{hrp_expand_expr('hrp')} AS hrp_ex",
        )
        .selectExpr(
            "address", f"{polymod_expr('hrp_ex', 'vals')} AS chk"
        )
    )
    chks = {r["address"]: r["chk"] for r in df.collect()}
    assert chks[good] == 1
    assert chks[corrupted] != 1
    # no Python UDF anywhere in the decode plan
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_bech32_exprs_empty_parts_yield_empty_arrays(spark):
    """Spark's sequence(1, 0) descends to [1, 0]; the character-walk
    expressions must guard it so degenerate addresses ('1...' empty HRP,
    '...1' empty data part) produce spec-true arrays, not phantom
    elements."""
    from cardano_analytics_duckdb_spark.functions.bech32 import (
        datapart_expr,
        hrp_expand_expr,
        hrp_expr,
        values_expr,
    )

    rows = spark.createDataFrame(
        [("1qqq",), ("addr1",)], "address string"
    ).selectExpr(
        "address",
        f"{hrp_expr('address')} AS hrp",
        f"{datapart_expr('address')} AS datap",
    ).selectExpr(
        "address",
        f"size({values_expr('datap')}) AS n_vals",
        f"size({hrp_expand_expr('hrp')}) AS n_hrp_ex",
    ).collect()
    got = {r["address"]: (r["n_vals"], r["n_hrp_ex"]) for r in rows}
    assert got["1qqq"] == (3, 1)   # empty HRP expands to just [0]
    assert got["addr1"] == (0, 9)  # empty data part has NO values
