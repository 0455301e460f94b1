"""Baseline-JPEG decoder tests (llm/jpeg.py) against an INDEPENDENT
spec-side encoder: forward DCT per the T.81 definition, Annex K.1/K.2
quantization tables, Annex K.3 typical huffman tables, byte stuffing,
optional chroma subsampling and restart markers — written here, not
shared with the decoder, so a decode bug cannot cancel against an encode
bug (they implement INVERSE transforms; analytic DCT cases pin the
transform convention itself)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from tally_database_loader_spark.llm.jpeg import (decode_jpeg_bytes, fdct2,
                                                  idct2)

# --- Annex K tables ---------------------------------------------------------

QL = np.array([  # K.1 luminance
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99]], dtype=np.float64)

QC = np.array([  # K.2 chrominance
    [17, 18, 24, 47, 99, 99, 99, 99],
    [18, 21, 26, 66, 99, 99, 99, 99],
    [24, 26, 56, 99, 99, 99, 99, 99],
    [47, 66, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99],
    [99, 99, 99, 99, 99, 99, 99, 99]], dtype=np.float64)

ZZ = [0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
      12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
      35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
      58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63]

DC_L = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
        list(range(12)))
DC_C = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
        list(range(12)))
AC_L = ([0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D], [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])
AC_C = ([0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77], [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA])


def _codes(counts, symbols):
    out, code, k = {}, 0, 0
    for ln in range(1, 17):
        for _ in range(counts[ln - 1]):
            out[symbols[k]] = (ln, code)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, length, value):
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)   # byte stuffing
                self.acc = 0
                self.n = 0

    def flush(self):
        while self.n:
            self.write(1, 1)                # pad with 1-bits


def _mag(v):
    """(category, magnitude-bits) per T.81 F.1.2.1."""
    if v == 0:
        return 0, 0
    t = int(abs(v)).bit_length()
    return t, (v if v > 0 else v + (1 << t) - 1)


def _encode_block(bw, block, q, dc_codes, ac_codes, pred):
    coefs = np.round(fdct2(block - 128.0) / q).astype(int)
    zz = coefs.reshape(-1)[ZZ]
    t, bits = _mag(int(zz[0]) - pred)
    ln, code = dc_codes[t]
    bw.write(ln, code)
    bw.write(t, bits)
    run = 0
    for k in range(1, 64):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_codes[0xF0]
            bw.write(ln, code)
            run -= 16
        s, bits = _mag(v)
        ln, code = ac_codes[(run << 4) | s]
        bw.write(ln, code)
        bw.write(s, bits)
        run = 0
    if run:
        ln, code = ac_codes[0x00]
        bw.write(ln, code)
    return int(zz[0])


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) \
        + payload


def _dht(tc, th, table):
    counts, symbols = table
    return bytes([(tc << 4) | th]) + bytes(counts) + bytes(symbols)


def encode_jpeg(px, subsample=1, restart_interval=0):
    """Spec-side baseline encoder. ``px``: (h, w) gray or (h, w, 3) RGB
    uint8. ``subsample``: 1 → 4:4:4, 2 → 4:2:0 (luma 2×2 per MCU)."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "q": QL, "tq": 0,
                  "plane": px.astype(np.float64), "dc": DC_L, "ac": AC_L,
                  "td": 0}]
        hmax = vmax = 1
    else:
        f = px.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        s = subsample
        if s > 1:  # chroma decimation (nearest — mirrors the decoder's
            cbd = cb[::s, ::s].copy()  # nearest upsample)
            crd = cr[::s, ::s].copy()
        else:
            cbd, crd = cb, cr
        comps = [
            {"id": 1, "h": s, "v": s, "q": QL, "tq": 0, "plane": y,
             "dc": DC_L, "ac": AC_L, "td": 0},
            {"id": 2, "h": 1, "v": 1, "q": QC, "tq": 1, "plane": cbd,
             "dc": DC_C, "ac": AC_C, "td": 1},
            {"id": 3, "h": 1, "v": 1, "q": QC, "tq": 1, "plane": crd,
             "dc": DC_C, "ac": AC_C, "td": 1}]
        hmax = vmax = s
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        ph, pw = mcus_y * c["v"] * 8, mcus_x * c["h"] * 8
        p = c["plane"]
        c["plane"] = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                            mode="edge")
        c["dc_codes"] = _codes(*c["dc"])
        c["ac_codes"] = _codes(*c["ac"])

    out = bytearray(b"\xff\xd8")
    dqt = bytes([0x00]) + bytes(int(QL.reshape(-1)[ZZ[i]]) for i in range(64))
    if not gray:
        dqt += bytes([0x01]) + bytes(int(QC.reshape(-1)[ZZ[i]])
                                     for i in range(64))
    out += _seg(0xDB, dqt)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(0xC0, sof)
    dht = _dht(0, 0, DC_L) + _dht(1, 0, AC_L)
    if not gray:
        dht += _dht(0, 1, DC_C) + _dht(1, 1, AC_C)
    out += _seg(0xC4, dht)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for c in comps:
        sos += bytes([c["id"], (c["td"] << 4) | c["td"]])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)

    bw = _BitWriter()
    pred = [0] * len(comps)
    done = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and done and done % restart_interval == 0:
                bw.flush()
                out += bw.out
                bw = _BitWriter()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        blk = c["plane"][y0:y0 + 8, x0:x0 + 8]
                        pred[ci] = _encode_block(
                            bw, blk, c["q"], c["dc_codes"], c["ac_codes"],
                            pred[ci])
            done += 1
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


# --- tests ------------------------------------------------------------------

def test_dct_pair_inverse_and_analytic():
    rng = np.random.RandomState(7)
    for _ in range(10):
        blk = rng.uniform(-128, 127, size=(8, 8))
        assert np.allclose(idct2(fdct2(blk)), blk, atol=1e-9)
    # constant block v: S(0,0) = 8v, every AC term 0 (T.81 A.3.3)
    s = fdct2(np.full((8, 8), 13.0))
    assert abs(s[0, 0] - 8 * 13.0) < 1e-9
    s[0, 0] = 0
    assert np.abs(s).max() < 1e-9


def test_jpeg_constant_gray_exact():
    """DC-only path, exactly invertible at this value: 200-128=72,
    S00 = 8·72 = 576, q=16 divides it → decode returns 200 everywhere."""
    px = np.full((20, 13), 200, dtype=np.uint8)
    rec = decode_jpeg_bytes(encode_jpeg(px))
    assert (rec["width"], rec["height"], rec["channels"]) == (13, 20, 1)
    assert np.all(rec["pixels"][:, :, 0] == 200)
    assert rec["mean_r"] == 200.0


def _smooth(h, w, ch=None, seed=3):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    if ch is None:
        return np.clip(128 + 80 * np.sin(xx / 6.0) * np.cos(yy / 7.0),
                       0, 255).astype(np.uint8)
    rng = np.random.RandomState(seed)
    phases = rng.uniform(0, 3, size=ch)
    return np.clip(np.stack(
        [128 + 70 * np.sin(xx / 5.0 + p) * np.cos(yy / 8.0 - p)
         for p in phases], axis=2), 0, 255).astype(np.uint8)


def test_jpeg_gray_roundtrip_within_quant_error():
    px = _smooth(33, 26)
    rec = decode_jpeg_bytes(encode_jpeg(px))
    assert (rec["width"], rec["height"]) == (26, 33)
    err = np.abs(rec["pixels"][:, :, 0].astype(float) - px.astype(float))
    assert err.mean() < 4.0, f"mean abs error {err.mean()}"
    assert abs(rec["mean_r"] - px.astype(float).mean()) < 2.0


def test_jpeg_rgb_roundtrip_and_means():
    px = _smooth(24, 31, ch=3)
    rec = decode_jpeg_bytes(encode_jpeg(px))
    assert (rec["width"], rec["height"], rec["channels"]) == (31, 24, 3)
    err = np.abs(rec["pixels"].astype(float) - px.astype(float))
    assert err.mean() < 6.0, f"mean abs error {err.mean()}"
    want = px.astype(float).mean(axis=(0, 1))
    got = np.array([rec["mean_r"], rec["mean_g"], rec["mean_b"]])
    assert np.abs(got - want).max() < 3.0


def test_jpeg_420_subsampling_roundtrip():
    px = _smooth(35, 22, ch=3, seed=11)
    rec = decode_jpeg_bytes(encode_jpeg(px, subsample=2))
    assert (rec["width"], rec["height"], rec["channels"]) == (22, 35, 3)
    err = np.abs(rec["pixels"].astype(float) - px.astype(float))
    assert err.mean() < 10.0, f"mean abs error {err.mean()}"
    want = px.astype(float).mean(axis=(0, 1))
    got = np.array([rec["mean_r"], rec["mean_g"], rec["mean_b"]])
    assert np.abs(got - want).max() < 5.0


def test_jpeg_restart_markers_do_not_change_pixels():
    px = _smooth(26, 40)
    plain = decode_jpeg_bytes(encode_jpeg(px))
    rst = decode_jpeg_bytes(encode_jpeg(px, restart_interval=2))
    assert np.array_equal(plain["pixels"], rst["pixels"])


def test_jpeg_rejections_are_loud():
    px = _smooth(16, 16)
    good = encode_jpeg(px)
    # progressive: flip SOF0 marker to SOF2
    prog = bytearray(good)
    prog[good.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="SOF0"):
        decode_jpeg_bytes(bytes(prog))
    with pytest.raises(ValueError, match="truncated|desync|SOS"):
        decode_jpeg_bytes(good[:40])
    with pytest.raises(ValueError):
        decode_jpeg_bytes(good[:-30])       # entropy stream cut short
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_bytes(b"not a jpeg")


def test_jpeg_through_spark_decode_features(spark):
    from tally_database_loader_spark.llm.multimodal import (
        decode_image_features)
    px = _smooth(18, 12, ch=3, seed=5)
    good = encode_jpeg(px)
    rec = decode_jpeg_bytes(good)
    df = spark.createDataFrame(
        [(1, good), (2, b"\xff\xd8\xff" + b"\x00garbage")],
        "doc_id bigint, payload binary")
    rows = {r.doc_id: r for r in decode_image_features(df).collect()}
    assert rows[1].format == "jpeg" and rows[1].channels == 3
    assert rows[1].mean_r == rec["mean_r"]  # plumbing == core decode
    assert rows[2].format is None and rows[2].mean_r is None
