"""Decoder-selection contract for the multimodal ops (r7 verdict item #2).

The r7 landmine: ``_decode_payload`` sniffed ``import PIL.Image`` and raised
on *success*, so merely installing Pillow crashed four registered queries
executor-side.  The contract now: decoder choice is an explicit parameter
(``"fixture"`` default), and library importability changes NOTHING.
"""

import ast
import inspect
import sys
import types

import pytest

from cardano_analytics_duckdb_spark.operators import multimodal


class _StubImage:
    width = 123
    height = 45


def _install_stub_pil(monkeypatch, sabotage=False):
    """Make ``import PIL.Image`` succeed (or explode, if sabotage) so we can
    prove the fixture path never touches it."""
    pil = types.ModuleType("PIL")
    image_mod = types.ModuleType("PIL.Image")
    if sabotage:
        def _boom(*a, **k):  # pragma: no cover - must never be called
            raise AssertionError("fixture decoder touched PIL")
        image_mod.open = _boom
    else:
        image_mod.open = lambda buf: _StubImage()
    pil.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)


def test_fixture_decode_ignores_importable_pil(monkeypatch):
    """With a sabotaged PIL importable, the default decoder still returns
    the deterministic fixture result — no raise, no PIL call."""
    _install_stub_pil(monkeypatch, sabotage=True)
    out = multimodal._decode_payload(b"hello world!")
    assert out["width"] == (12 % 64) + 1
    assert out["height"] == ((12 // 64) % 64) + 1
    assert len(out["fingerprint"]) == 32


def test_pil_decode_is_explicit_opt_in(monkeypatch):
    """decoder="pil" actually uses PIL (stubbed here) — real dimensions,
    md5 fingerprint."""
    _install_stub_pil(monkeypatch)
    out = multimodal._decode_payload(b"\x89PNG fake bytes", decoder="pil")
    assert (out["width"], out["height"]) == (123, 45)
    assert len(out["fingerprint"]) == 32


def test_unknown_decoder_rejected():
    with pytest.raises(ValueError, match="unknown decoder"):
        multimodal._decode_payload(b"x", decoder="ffmpeg")
    # the frame builder validates before launching any Spark job
    with pytest.raises(ValueError, match="unknown decoder"):
        multimodal._decoded_frame(None, "/nonexistent", decoder="ffmpeg")


def test_image_decode_query_green_with_pil_importable(
    spark, sf_dir, monkeypatch
):
    """The registered query runs end-to-end with PIL importable in the
    driver and produces the fixture result (oracle-shaped).  Worker
    subprocesses never import PIL in fixture mode (source-verified by
    test_no_import_time_pil_sniffing), so driver-side stubbing plus the
    source check covers both sides."""
    _install_stub_pil(monkeypatch, sabotage=True)
    rows = multimodal.image_decode_features(spark, sf_dir).limit(5).collect()
    assert len(rows) == 5
    for r in rows:
        assert 1 <= r.width <= 64 and 1 <= r.height <= 64
        assert len(r.fingerprint) == 32


def test_no_import_time_pil_sniffing():
    """Source-level ban: every ``import PIL`` in multimodal.py sits inside
    an ``if <...> == "pil"``-guarded branch — never at module level, never
    in a try/except probe.  This is the executor-side half of the landmine
    fix (sys.modules stubs don't reach Python workers)."""
    src = inspect.getsource(multimodal)
    tree = ast.parse(src)

    def pil_imports(node):
        for child in ast.walk(node):
            if isinstance(child, ast.Import) and any(
                a.name.startswith("PIL") for a in child.names
            ):
                yield child
            if isinstance(child, ast.ImportFrom) and (
                child.module or ""
            ).startswith("PIL"):
                yield child

    all_pil = list(pil_imports(tree))
    assert all_pil, "expected the explicit pil branch to import PIL"
    # collect PIL imports that live under an `if` whose test mentions "pil"
    guarded = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.If) and "pil" in ast.dump(node.test):
            for imp in pil_imports(node):
                guarded.add(id(imp))
    unguarded = [i for i in all_pil if id(i) not in guarded]
    assert not unguarded, (
        f"PIL import outside an explicit decoder=='pil' branch at "
        f"lines {[i.lineno for i in unguarded]}"
    )
    # and no try/except ImportError probing of PIL anywhere
    for node in ast.walk(tree):
        if isinstance(node, ast.Try):
            assert not list(pil_imports(node)), (
                "try/except import-sniffing of PIL is banned "
                f"(line {node.lineno})"
            )


def _png_1x1_red() -> bytes:
    """A valid 1x1 RGB PNG built from the stdlib (no Pillow needed to
    CONSTRUCT it — only to decode it)."""
    import struct
    import zlib

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    raw = b"\x00\xff\x00\x00"  # scanline: filter 0, one RGB pixel
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def test_pil_decoder_decodes_real_png_when_pillow_present():
    """r8 verdict #6: the decoder="pil" branch executes against REAL
    Pillow wherever it is installed (skipped only where it genuinely
    isn't) — driver-side kernel, known 1x1 PNG, exact dimensions."""
    pytest.importorskip("PIL")
    import hashlib

    png = _png_1x1_red()
    out = multimodal._decode_payload(png, decoder="pil")
    assert (out["width"], out["height"]) == (1, 1)
    assert out["fingerprint"] == hashlib.md5(png).hexdigest()


def test_pil_decoder_end_to_end_when_pillow_present(spark, monkeypatch):
    """Same branch through the real mapInPandas kernel: Python workers
    import Pillow and decode the PNG payload shipped as a binary column."""
    pytest.importorskip("PIL")
    import hashlib

    png = _png_1x1_red()

    def fake_load(spark_, sf_dir_, name_):
        return spark_.createDataFrame(
            [(1, bytearray(png))], "doc_id long, text binary"
        )

    monkeypatch.setattr(multimodal, "load_table", fake_load)
    rows = multimodal._decoded_frame(spark, "ignored", decoder="pil").collect()
    assert [(r.doc_id, r.width, r.height) for r in rows] == [(1, 1, 1)]
    assert rows[0].fingerprint == hashlib.md5(png).hexdigest()
