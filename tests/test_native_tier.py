"""Reference-vs-native decoder tier parity (VERDICT r6 "Next round" #2).

The pure-Python spec decoders are the hash-verified CORRECTNESS tier;
``llm/native_codec.py`` is the executable ~100× throughput seam: the
same per-payload record contract served by Pillow's native codecs
behind the identical ``mapInPandas`` plumbing. These tests pin the
parity contract on the SAME independent spec-side encoder corpora that
pin the reference decoders:

- byte-exact ``pixels`` (hence exact means) for the lossless formats —
  PPM, BMP (24/32-bit + 8-bit palette), PNG (gray/RGB/palette/RGBA,
  16-bit, Adam7), GIF, VP8L WebP;
- exact dims/format/channels and means within 1.0/channel for JPEG
  (decode is legally implementation-dependent — IDCT rounding, ITU
  T.81 Annex A — which is exactly why the hash-verified gates pin the
  reference tier).

Where Pillow is absent (this container) the parity cases SKIP cleanly
and the tier-resolution cases still run: "auto" must fall back to the
reference tier and an explicit "native" request must fail LOUDLY, so a
throughput claim can never silently run the slow tier or vice versa.
"""

from __future__ import annotations

import numpy as np
import pytest

from tally_database_loader_spark.llm.multimodal import (
    _decode_image_pixels, decode_image_features, resize_images)
from tally_database_loader_spark.llm.native_codec import (
    pil_available, resolve_tier)
from tests.test_jpeg import encode_jpeg
from tests.test_llm import (_bmp8_bytes, _bmp32_bytes, _bmp_bytes,
                            _gif_bytes, _png_bytes)
from tests.test_webp import _rand_rgba, encode_webp_lossless

needs_pil = pytest.mark.skipif(
    not pil_available(),
    reason="Pillow not importable — native tier unavailable here")


def _ppm_of(px: np.ndarray) -> bytes:
    h, w = px.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()


def _rand_rgb(h, w, seed):
    return np.random.RandomState(seed).randint(
        0, 256, size=(h, w, 3)).astype(np.uint8)


def _lossless_corpus() -> dict[str, bytes]:
    """One payload per lossless format/variant, all from the
    independent spec-side encoders the reference decoders are pinned
    by."""
    rgb = _rand_rgb(9, 7, seed=11)
    gray = _rand_rgb(6, 5, seed=12)[:, :, :1]
    plte = np.array([[250, 1, 2], [3, 240, 5], [6, 7, 230]],
                    dtype=np.uint8)
    idx = np.random.RandomState(13).randint(0, 3, size=(8, 6, 1))
    rgba = np.dstack([_rand_rgb(5, 6, seed=14),
                      np.random.RandomState(15).randint(
                          0, 256, size=(5, 6, 1))]).astype(np.uint8)
    px16 = (np.random.RandomState(16).randint(
        0, 65536, size=(4, 5, 3))).astype(np.uint16)
    gif_pal = np.array([[10, 20, 30], [200, 100, 0],
                        [0, 0, 255], [255, 255, 255]], dtype=np.uint8)
    gif_idx = np.random.RandomState(17).randint(0, 4, size=(7, 9))
    bmp_idx = np.random.RandomState(18).randint(0, 3, size=(6, 5))
    return {
        "ppm": _ppm_of(_rand_rgb(8, 8, seed=10)),
        "bmp24": _bmp_bytes(4, 3, (9, 8, 7)),
        "bmp32": _bmp32_bytes(_rand_rgb(5, 4, seed=19)),
        "bmp8": _bmp8_bytes(bmp_idx, plte),
        "png_rgb": _png_bytes(rgb, color_type=2, filter_type=1),
        "png_gray": _png_bytes(gray, color_type=0, filter_type=4),
        "png_palette": _png_bytes(idx, color_type=3, filter_type=2,
                                  plte=plte),
        "png_rgba": _png_bytes(rgba, color_type=6, filter_type=3),
        "png_16bit": _png_bytes(px16, color_type=2, depth=16),
        "png_adam7": _png_bytes(rgb, color_type=2, interlace=1),
        "gif": _gif_bytes(gif_idx, gif_pal),
        "webp_opaque": encode_webp_lossless(_rand_rgba(6, 8, seed=20)),
        "webp_alpha": encode_webp_lossless(
            _rand_rgba(5, 5, seed=21, alpha=77)),
        "webp_cache": encode_webp_lossless(
            _rand_rgba(9, 6, seed=22, colors=4), cache_bits=2),
    }


def test_resolve_tier_contract(monkeypatch):
    """Tier resolution runs in EVERY environment: reference is the
    default, env var is honored, "auto" degrades to reference without
    PIL, and an explicit "native" request without PIL fails loudly —
    never a silent fallback to the ~100×-slower tier."""
    monkeypatch.delenv("SPARK_GRAFT_DECODE_TIER", raising=False)
    assert resolve_tier(None) == "reference"
    assert resolve_tier("reference") == "reference"
    monkeypatch.setenv("SPARK_GRAFT_DECODE_TIER", "auto")
    want = "native" if pil_available() else "reference"
    assert resolve_tier(None) == want
    assert resolve_tier("auto") == want
    with pytest.raises(ValueError, match="decode tier"):
        resolve_tier("turbo")
    if not pil_available():
        with pytest.raises(ImportError, match="native"):
            resolve_tier("native")
    else:
        assert resolve_tier("native") == "native"


def test_auto_tier_end_to_end_matches_explicit(spark):
    """decode_image_features(tier="auto") must equal whichever tier
    "auto" resolves to — exercised in THIS container too (where it
    resolves to the reference tier), so the seam's plumbing is tested
    even without PIL."""
    corpus = _lossless_corpus()
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(sorted(corpus.values()))]
        + [(99, b"not an image")],
        "doc_id bigint, payload binary")
    resolved = resolve_tier("auto")
    got = {r.doc_id: r.asDict()
           for r in decode_image_features(df, tier="auto").collect()}
    want = {r.doc_id: r.asDict()
            for r in decode_image_features(df, tier=resolved).collect()}
    assert got == want
    assert got[99]["format"] is None       # NULL-row discipline holds


@needs_pil
def test_native_parity_lossless():
    from tally_database_loader_spark.llm.native_codec import (
        decode_image_pixels_native)
    for name, payload in _lossless_corpus().items():
        ref = _decode_image_pixels(payload)
        nat = decode_image_pixels_native(payload)
        for k in ("format", "width", "height", "channels"):
            assert nat[k] == ref[k], f"{name}: {k} {nat[k]} != {ref[k]}"
        assert np.array_equal(nat["pixels"], ref["pixels"]), \
            f"{name}: pixel rasters differ between tiers"
        for k in ("mean_r", "mean_g", "mean_b"):
            assert nat[k] == ref[k], f"{name}: {k}"


@needs_pil
def test_native_parity_jpeg():
    from tally_database_loader_spark.llm.native_codec import (
        decode_image_pixels_native)
    rgb = _rand_rgb(24, 16, seed=30)
    gray = _rand_rgb(16, 16, seed=31)[:, :, 0]
    for name, payload in (("jpeg_444", encode_jpeg(rgb)),
                          ("jpeg_420", encode_jpeg(rgb, subsample=2)),
                          ("jpeg_gray", encode_jpeg(gray))):
        ref = _decode_image_pixels(payload)
        nat = decode_image_pixels_native(payload)
        for k in ("format", "width", "height", "channels"):
            assert nat[k] == ref[k], f"{name}: {k} {nat[k]} != {ref[k]}"
        for k in ("mean_r", "mean_g", "mean_b"):
            assert abs(nat[k] - ref[k]) <= 1.0, \
                f"{name}: {k} {nat[k]} vs {ref[k]} beyond JPEG tolerance"


@needs_pil
def test_native_tier_through_spark(spark):
    """The seam end-to-end: the SAME mapInPandas plan with tier="native"
    must reproduce the reference tier's rows exactly on the lossless
    corpus, and corrupt payloads still surface as NULL rows, never task
    failures."""
    corpus = _lossless_corpus()
    df = spark.createDataFrame(
        [(i, b) for i, b in enumerate(sorted(corpus.values()))]
        + [(99, b"\xff\xd8\xffgarbage")],
        "doc_id bigint, payload binary")
    ref = {r.doc_id: r.asDict()
           for r in decode_image_features(df).collect()}
    nat = {r.doc_id: r.asDict()
           for r in decode_image_features(df, tier="native").collect()}
    assert nat == ref
    # resize shares the pixel path: byte-identical P6 output per tier
    rref = {r.doc_id: bytes(r.payload) if r.payload is not None else None
            for r in resize_images(df, 4, 3).collect()}
    rnat = {r.doc_id: bytes(r.payload) if r.payload is not None else None
            for r in resize_images(df, 4, 3, tier="native").collect()}
    assert rnat == rref


def test_native_path_plumbing_with_faked_pil(monkeypatch):
    """The native decode path itself (format mapping, channels rules,
    mean computation, tier resolution) exercised WITHOUT Pillow: a
    minimal in-test PIL fake that parses only P6 — so the seam's own
    code runs here even though the real parity cases must skip. This
    tests llm/native_codec.py, NOT Pillow."""
    import io
    import sys
    import types

    class _FakeIm:
        def __init__(self, b):
            if b[:2] != b"P6":
                raise OSError("fake PIL parses P6 only")
            parts = b.split(b"\n", 3)
            w, h = (int(x) for x in parts[1].split())
            self.format, self.mode, self.size = "PPM", "RGB", (w, h)
            self._px = np.frombuffer(
                parts[3], dtype=np.uint8, count=w * h * 3).reshape(h, w, 3)

        def convert(self, mode):
            assert mode == "RGB"
            return self._px

    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda fh: _FakeIm(fh.read())
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    from tally_database_loader_spark.llm.native_codec import (
        decode_image_pixels_native)
    assert resolve_tier("auto") == "native"    # fake import satisfies auto
    px = _rand_rgb(6, 4, seed=40)
    nat = decode_image_pixels_native(_ppm_of(px))
    ref = _decode_image_pixels(_ppm_of(px))
    assert {k: v for k, v in nat.items() if k != "pixels"} \
        == {k: v for k, v in ref.items() if k != "pixels"}
    assert np.array_equal(nat["pixels"], ref["pixels"])
    # a format the fake cannot parse raises (→ NULL row upstream)
    with pytest.raises((ValueError, OSError)):
        decode_image_pixels_native(_png_bytes(px, color_type=2))
    # PPM is codec-free: the native tier routes it through the
    # REFERENCE decoder (never PIL), so the full maxval range stays
    # byte-parity by construction — the fake PIL (P6-only) would have
    # decoded maxval-255 differently-scaled wide samples
    wide = b"P6\n1 1\n100\n" + bytes([50, 0, 100])
    nat_wide = decode_image_pixels_native(wide)
    ref_wide = _decode_image_pixels(wide)
    assert nat_wide["pixels"].ravel().tolist() == [128, 0, 255]
    assert {k: v for k, v in nat_wide.items() if k != "pixels"} \
        == {k: v for k, v in ref_wide.items() if k != "pixels"}


def test_native_tier_executor_missing_pil_fails_loudly(spark, monkeypatch):
    """Heterogeneous-cluster contract: tier resolution happens on the
    DRIVER, so when executors lack Pillow the per-payload ImportError
    must FAIL THE TASK — an all-NULL 'success' would corrupt every
    conclusion drawn from the run. Simulated for real: a fake PIL in
    the driver process satisfies resolve_tier('native'), but Spark's
    Python workers are separate processes with no PIL, so the decode
    genuinely raises there."""
    import sys
    import types

    if pil_available():
        pytest.skip("real Pillow installed — workers would decode fine")
    image_mod = types.ModuleType("PIL.Image")
    image_mod.open = lambda fh: None
    pil_mod = types.ModuleType("PIL")
    pil_mod.Image = image_mod
    monkeypatch.setitem(sys.modules, "PIL", pil_mod)
    monkeypatch.setitem(sys.modules, "PIL.Image", image_mod)

    # NB: a PNG, not a PPM — the native tier routes codec-free PPM
    # through the reference decoder, which would never touch PIL
    df = spark.createDataFrame(
        [(1, _png_bytes(_rand_rgb(4, 4, seed=50), color_type=2))],
        "doc_id bigint, payload binary")
    with pytest.raises(Exception) as ei:
        decode_image_features(df, tier="native").collect()
    assert "ImportError" in str(ei.value) or "PIL" in str(ei.value)
    with pytest.raises(Exception):
        resize_images(df, 2, 2, tier="native").collect()
