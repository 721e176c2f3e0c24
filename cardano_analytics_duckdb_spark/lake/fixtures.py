"""Deterministic Cardano fixture lake generator (pure PyArrow — no Spark
session needed, so the lake can be materialized at import time before either
engine queries it).

Builds a miniature version of the reference's 11-table slot-partitioned
parquet lake (/root/reference/README.md:5-16) with every edge case the
flagship token-transfer query needs (FIXTURES.md §B: plain transfer,
self-send, mint, burn, missing-input, multi-address fan-in/out, noise
token, slot-boundary rows, high-fee rows, datum rows), plus seeded filler
transactions for volume.

Generation is fully deterministic (fixed seed, content-addressed tx ids via
sha256), so the Spark query and the DuckDB oracle always see identical
files.  Layout: ``{root}/{table}/slot_group=N/part-0.parquet`` — Spark gets
partition pruning on slot predicates; DuckDB reads the same files with
``read_parquet(..., hive_partitioning=1)``.

``tx_raw`` is not materialized — its extraction is disabled in the
reference too (ogmios_parquet.py:693-695).
"""

from __future__ import annotations

import hashlib
import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

SLOT_GROUP_SIZE = 200_000  # ≙ /root/reference/config.py:25-26

DEFAULT_LAKE_ROOT = "/root/repo/.lake/cardano_fixture"

TOKEN_POLICY = bytes([0x01]) * 27 + bytes([0x2A])  # the analyzed token
TOKEN_NAME = b"SNEK"
NOISE_POLICY = bytes([0x02]) * 28  # must be filtered out (FIXTURES §B.7)
NOISE_NAME = b"HOSKY"

ADDRS = [f"addr_test_{c}" for c in "abcdef"]

# PyArrow schemas ≙ get_parquet_schema (/root/reference/ogmios_parquet.py:14-173),
# with the SURVEY §1.3 type mapping (uint→signed, dictionary→string).
_ARROW_SCHEMAS: dict[str, pa.Schema] = {
    "tx": pa.schema(
        [
            ("slot", pa.int64()),
            ("tx_id", pa.binary()),
            ("tx_fee", pa.int64()),
            ("input_count", pa.int32()),
            ("output_count", pa.int32()),
            ("redeemer_count", pa.int32()),
            ("witness_datum_count", pa.int32()),
            ("has_mint", pa.bool_()),
            ("has_withdrawal", pa.bool_()),
            ("has_cert", pa.bool_()),
            ("has_vote", pa.bool_()),
            ("has_proposal", pa.bool_()),
            (
                "inputs",
                pa.list_(
                    pa.struct(
                        [("tx_id", pa.binary()), ("output_index", pa.int32())]
                    )
                ),
            ),
        ]
    ),
    "utxo": pa.schema(
        [
            ("slot", pa.int64()),
            ("tx_id", pa.binary()),
            ("output_index", pa.int32()),
            ("address", pa.string()),
            ("lovelace", pa.int64()),
            ("has_token", pa.bool_()),
            ("has_datum", pa.bool_()),
            ("has_ref_script", pa.bool_()),
        ]
    ),
    "mint": pa.schema(
        [
            ("slot", pa.int64()),
            ("tx_id", pa.binary()),
            ("policy_id", pa.binary()),
            ("asset_name", pa.binary()),
            ("quantity", pa.int64()),
        ]
    ),
    "asset": pa.schema(
        [
            ("slot", pa.int64()),
            ("tx_id", pa.binary()),
            ("output_index", pa.int32()),
            ("address", pa.string()),
            ("policy_id", pa.binary()),
            ("asset_name", pa.binary()),
            ("amount", pa.int64()),
        ]
    ),
    "datum": pa.schema(
        [
            ("slot", pa.int64()),
            ("tx_id", pa.binary()),
            ("output_index", pa.int32()),
            ("datum_hash", pa.binary()),
            ("is_inline", pa.bool_()),
            ("inline_datum", pa.binary()),
        ]
    ),
    "cert": pa.schema(
        [("slot", pa.int64()), ("tx_id", pa.binary()), ("type", pa.string())]
    ),
    "cert_stake": pa.schema(
        [
            ("slot", pa.int64()),
            ("tx_id", pa.binary()),
            ("type", pa.string()),
            ("credential", pa.binary()),
            ("pool_id", pa.string()),
            ("drep_id", pa.string()),
        ]
    ),
    "cert_pool": pa.schema(
        [
            ("slot", pa.int64()),
            ("tx_id", pa.binary()),
            ("type", pa.string()),
            ("pool_id", pa.string()),
            ("reward_account", pa.string()),
            ("pledge", pa.int64()),
            ("margin_numerator", pa.int64()),
            ("margin_denominator", pa.int64()),
            ("cost", pa.int64()),
            ("metadata_hash", pa.binary()),
            ("metadata_url", pa.string()),
            ("retirement_epoch", pa.int64()),
        ]
    ),
    "cert_cc": pa.schema(
        [
            ("slot", pa.int64()),
            ("tx_id", pa.binary()),
            ("type", pa.string()),
            ("member_id", pa.binary()),
            ("delegate_id", pa.binary()),
            ("metadata_hash", pa.binary()),
            ("metadata_url", pa.string()),
        ]
    ),
    "cert_drep": pa.schema(
        [
            ("slot", pa.int64()),
            ("tx_id", pa.binary()),
            ("type", pa.string()),
            ("drep_id", pa.binary()),
            ("drep_type", pa.string()),
            ("metadata_hash", pa.binary()),
            ("metadata_url", pa.string()),
        ]
    ),
}


def _txid(i: int) -> bytes:
    return hashlib.sha256(f"fixture_tx_{i}".encode()).digest()


def _blake2b_256(data: bytes) -> bytes:
    # ≙ the reference's inline-datum hashing (ogmios_parquet.py:333-343)
    return hashlib.blake2b(data, digest_size=32).digest()


def _build_rows() -> dict[str, list[dict]]:
    rng = random.Random(42)
    rows: dict[str, list[dict]] = {t: [] for t in _ARROW_SCHEMAS}

    def add_tx(
        i: int,
        slot: int,
        fee: int,
        inputs: list[tuple[bytes, int]],
        outputs: list[tuple[str, int, list[tuple[bytes, bytes, int]]]],
        mints: list[tuple[bytes, bytes, int]] = (),
        datums: list[tuple[int, bytes | None, bytes | None]] = (),
        certs: list[str] = (),
    ) -> bytes:
        tid = _txid(i)
        rows["tx"].append(
            dict(
                slot=slot,
                tx_id=tid,
                tx_fee=fee,
                input_count=len(inputs),
                output_count=len(outputs),
                redeemer_count=0,
                witness_datum_count=sum(1 for _, h, d in datums if d is None),
                has_mint=bool(mints),
                has_withdrawal=False,
                has_cert=bool(certs),
                has_vote=False,
                has_proposal=False,
                inputs=[
                    {"tx_id": itid, "output_index": oi} for itid, oi in inputs
                ],
            )
        )
        for oi, (addr, lovelace, assets) in enumerate(outputs):
            rows["utxo"].append(
                dict(
                    slot=slot,
                    tx_id=tid,
                    output_index=oi,
                    address=addr,
                    lovelace=lovelace,
                    has_token=bool(assets),
                    has_datum=any(d[0] == oi for d in datums),
                    has_ref_script=False,
                )
            )
            for policy, name, amt in assets:
                rows["asset"].append(
                    dict(
                        slot=slot,
                        tx_id=tid,
                        output_index=oi,
                        address=addr,
                        policy_id=policy,
                        asset_name=name,
                        amount=amt,
                    )
                )
        for policy, name, qty in mints:
            rows["mint"].append(
                dict(
                    slot=slot, tx_id=tid, policy_id=policy, asset_name=name,
                    quantity=qty,
                )
            )
        for oi, dhash, inline in datums:
            rows["datum"].append(
                dict(
                    slot=slot,
                    tx_id=tid,
                    output_index=oi,
                    datum_hash=dhash if dhash else _blake2b_256(inline),
                    is_inline=inline is not None,
                    inline_datum=inline,
                )
            )
        for ctype in certs:
            rows["cert"].append(dict(slot=slot, tx_id=tid, type=ctype))
        return tid

    tok = [(TOKEN_POLICY, TOKEN_NAME, 1000)]
    noise = [(NOISE_POLICY, NOISE_NAME, 500)]

    # B.3 mint: token only in outputs -> input set NULL -> included
    t_mint = add_tx(
        0, 100_000, 180_000, [], [(ADDRS[0], 2_000_000, tok)],
        mints=[(TOKEN_POLICY, TOKEN_NAME, 1000)],
    )
    # B.1 plain transfer A -> B
    t_xfer = add_tx(
        1, 100_010, 210_000, [(t_mint, 0)], [(ADDRS[1], 1_900_000, tok)]
    )
    # B.2 self-send B -> B (sets equal -> excluded)
    t_self = add_tx(
        2, 100_020, 2_100_000, [(t_xfer, 0)], [(ADDRS[1], 1_800_000, tok)]
    )
    # B.6 multi-address fan-in/out with duplicates
    m1 = add_tx(
        3, 100_030, 190_000, [],
        [(ADDRS[2], 1_000_000, tok), (ADDRS[3], 1_000_000, tok)],
        mints=[(TOKEN_POLICY, TOKEN_NAME, 2000)],
    )
    add_tx(
        4, 100_040, 2_500_000, [(m1, 0), (m1, 1), (t_self, 0)],
        [
            (ADDRS[4], 900_000, tok),
            (ADDRS[4], 900_000, tok),  # duplicate output address
            (ADDRS[5], 900_000, tok),
        ],
    )
    # B.4 burn-shaped: consumes token UTxO, produces none -> output set NULL
    t_for_burn = add_tx(
        5, 100_050, 175_000, [],
        [(ADDRS[0], 1_500_000, tok)],
        mints=[(TOKEN_POLICY, TOKEN_NAME, 1000)],
    )
    add_tx(
        6, 100_060, 2_050_000, [(t_for_burn, 0)],
        [(ADDRS[0], 1_400_000, [])],
        mints=[(TOKEN_POLICY, TOKEN_NAME, -1000)],
    )
    # B.5 missing-input: references a tx_id absent from the lake
    ghost = hashlib.sha256(b"not_in_dataset").digest()
    add_tx(
        7, 100_070, 1_999_999, [(ghost, 0)], [(ADDRS[2], 1_200_000, tok)]
    )
    # B.7 noise token activity (other policy id -> filtered out)
    n1 = add_tx(8, 100_080, 160_000, [], [(ADDRS[3], 1_000_000, noise)],
                mints=[(NOISE_POLICY, NOISE_NAME, 500)])
    add_tx(9, 100_090, 2_200_000, [(n1, 0)], [(ADDRS[4], 950_000, noise)])
    # B.8 slot-boundary token rows across two slot_group partitions
    b1 = add_tx(10, SLOT_GROUP_SIZE - 10, 185_000, [],
                [(ADDRS[0], 1_100_000, tok)],
                mints=[(TOKEN_POLICY, TOKEN_NAME, 100)])
    b2 = add_tx(11, SLOT_GROUP_SIZE - 1, 186_000, [(b1, 0)],
                [(ADDRS[1], 1_050_000, tok)])
    b3 = add_tx(12, SLOT_GROUP_SIZE, 187_000, [(b2, 0)],
                [(ADDRS[2], 1_000_000, tok)])
    add_tx(13, SLOT_GROUP_SIZE + 10, 188_000, [(b3, 0)],
           [(ADDRS[3], 950_000, tok)])
    # B.10 datum rows: one hash-only, one inline (blake2b-hashed)
    add_tx(
        14, 100_100, 170_000, [],
        [(ADDRS[5], 1_000_000, [])],
        datums=[
            (0, hashlib.sha256(b"external_datum").digest(), None),
            (0, None, b"\xd8\x79\x80"),  # inline datum bytes
        ],
    )
    # certificates: one of each specialized type
    t_cert = add_tx(15, 100_110, 172_000, [], [(ADDRS[0], 5_000_000, [])],
                    certs=["stakeDelegation", "stakePoolRegistration",
                           "constitutionalCommitteeHotKeyRegistration",
                           "delegateRepresentativeRegistration"])
    cred = hashlib.sha256(b"cred").digest()[:28]
    rows["cert_stake"].append(dict(
        slot=100_110, tx_id=t_cert, type="stakeDelegation",
        credential=cred, pool_id="pool1xyz", drep_id=None))
    rows["cert_pool"].append(dict(
        slot=100_110, tx_id=t_cert, type="stakePoolRegistration",
        pool_id="pool1xyz", reward_account="stake1abc", pledge=100_000_000,
        margin_numerator=3, margin_denominator=100, cost=340_000_000,
        metadata_hash=hashlib.sha256(b"meta").digest(),
        metadata_url="https://pool.example/meta.json", retirement_epoch=None))
    rows["cert_cc"].append(dict(
        slot=100_110, tx_id=t_cert,
        type="constitutionalCommitteeHotKeyRegistration",
        member_id=hashlib.sha256(b"member").digest()[:28],
        delegate_id=hashlib.sha256(b"delegate").digest()[:28],
        metadata_hash=None, metadata_url=None))
    rows["cert_drep"].append(dict(
        slot=100_110, tx_id=t_cert, type="delegateRepresentativeRegistration",
        drep_id=hashlib.sha256(b"drep").digest()[:29],
        drep_type="registered", metadata_hash=None, metadata_url=None))

    # B.9 + filler: 180 seeded lovelace-only txs, fees straddling 2M
    prev = None
    for j in range(16, 196):
        slot = rng.choice(
            [rng.randrange(100_000, 199_999), rng.randrange(200_000, 299_999)]
        )
        fee = rng.choice(
            [rng.randrange(150_000, 400_000),
             rng.randrange(1_990_000, 2_010_000),
             rng.randrange(2_000_001, 9_000_000)]
        )
        ins = [(prev, 0)] if prev is not None and rng.random() < 0.6 else []
        prev = add_tx(
            j, slot, fee, ins,
            [(rng.choice(ADDRS), rng.randrange(1_000_000, 50_000_000), [])],
        )
    return rows


def ensure_fixture_lake(spark=None, root: str = DEFAULT_LAKE_ROOT) -> str:
    """Generate the lake once (marker-file guarded); return its root.

    ``spark`` is accepted (and ignored) so call sites can pass their session;
    generation is pure PyArrow and needs no engine.
    """
    marker = os.path.join(root, "_FIXTURE_READY")
    if os.path.exists(marker):
        return root
    all_rows = _build_rows()
    for table, schema in _ARROW_SCHEMAS.items():
        by_group: dict[int, list[dict]] = {}
        for r in all_rows[table]:
            g = (r["slot"] // SLOT_GROUP_SIZE) * SLOT_GROUP_SIZE
            by_group.setdefault(g, []).append(r)
        for g, rows in sorted(by_group.items()):
            out_dir = os.path.join(root, table, f"slot_group={g}")
            os.makedirs(out_dir, exist_ok=True)
            rows = sorted(rows, key=lambda r: (r["slot"], r["tx_id"]))
            tbl = pa.Table.from_pylist(rows, schema=schema)
            pq.write_table(
                tbl, os.path.join(out_dir, "part-0.parquet"),
                compression="zstd",
            )
    with open(marker, "w") as f:
        f.write("ok\n")
    return root
