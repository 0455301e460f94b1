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


# --- progressive / multi-scan serializers (round 6) --------------------------
#
# The decoder's progressive path is validated by RE-SERIALIZATION: the
# same quantized coefficients the baseline encoder produces are emitted
# as a multi-scan SOF2 stream (interleaved DC first, banded AC first
# with EOB runs, DC refinement, AC refinement with correction bits —
# T.81 G.1.2), so progressive decode must equal baseline decode
# BIT-FOR-BIT — a far stronger oracle than an error bound.

def _prep_comps(px, subsample=1):
    """Component planes + per-block quantized zigzag coefficients,
    identical math to encode_jpeg."""
    gray = px.ndim == 2
    h, w = px.shape[:2]
    if gray:
        comps = [{"id": 1, "h": 1, "v": 1, "q": QL, "tq": 0,
                  "plane": px.astype(np.float64), "td": 0}]
    else:
        f = px.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        s = subsample
        cbd = cb[::s, ::s].copy() if s > 1 else cb
        crd = cr[::s, ::s].copy() if s > 1 else cr
        comps = [
            {"id": 1, "h": s, "v": s, "q": QL, "tq": 0, "plane": y, "td": 0},
            {"id": 2, "h": 1, "v": 1, "q": QC, "tq": 1, "plane": cbd,
             "td": 1},
            {"id": 3, "h": 1, "v": 1, "q": QC, "tq": 1, "plane": crd,
             "td": 1}]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for c in comps:
        ph, pw = mcus_y * c["v"] * 8, mcus_x * c["h"] * 8
        p = c["plane"]
        p = np.pad(p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])),
                   mode="edge")
        by, bx = mcus_y * c["v"], mcus_x * c["h"]
        zz = np.zeros((by, bx, 64), dtype=np.int64)
        for yb in range(by):
            for xb in range(bx):
                blk = p[yb * 8:yb * 8 + 8, xb * 8:xb * 8 + 8]
                zz[yb, xb] = np.round(
                    fdct2(blk - 128.0) / c["q"]).astype(int).reshape(-1)[ZZ]
        c["zz"] = zz
        # non-interleaved (single-component-scan) block grid
        cw = -(-w * c["h"] // hmax)
        ch = -(-h * c["v"] // vmax)
        c["nbx"], c["nby"] = -(-cw // 8), -(-ch // 8)
    return comps, hmax, vmax, mcus_x, mcus_y, h, w


def _headers(comps, h, w, sof_marker):
    out = bytearray(b"\xff\xd8")
    gray = len(comps) == 1
    dqt = bytes([0x00]) + bytes(int(QL.reshape(-1)[ZZ[i]]) for i in range(64))
    if not gray:
        dqt += bytes([0x01]) + bytes(int(QC.reshape(-1)[ZZ[i]])
                                     for i in range(64))
    out += _seg(0xDB, dqt)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([len(comps)])
    for c in comps:
        sof += bytes([c["id"], (c["h"] << 4) | c["v"], c["tq"]])
    out += _seg(sof_marker, sof)
    return out


def _flat_table(symbols):
    """Canonical all-length-8 huffman table over a fixed symbol set —
    trivially valid (< 255 codes, all-ones unused) and legal for an
    encoder to choose; exercises the decoder's generic DHT path."""
    syms = sorted(set(symbols))
    assert len(syms) < 255
    counts = [0] * 16
    counts[7] = len(syms)
    return counts, syms


_AC_FIRST_SYMS = ([(r << 4) | s for r in range(16) for s in range(1, 11)]
                  + [0xF0] + [r << 4 for r in range(15)])
_AC_REFINE_SYMS = ([(r << 4) | 1 for r in range(16)]
                   + [0xF0] + [r << 4 for r in range(15)])
AC_FIRST_TBL = _flat_table(_AC_FIRST_SYMS)
AC_REFINE_TBL = _flat_table(_AC_REFINE_SYMS)


def _sos(scan_comps, tds, tas, ss, se, ah, al):
    sos = bytes([len(scan_comps)])
    for c, td, ta in zip(scan_comps, tds, tas):
        sos += bytes([c["id"], (td << 4) | ta])
    sos += bytes([ss, se, (ah << 4) | al])
    return _seg(0xDA, sos)


class _RestartingWriter:
    """Bit writer segmented by restart markers: every ``ri`` units the
    entropy bits flush (1-padded) and an RSTn cycles in — mirroring the
    decoder's per-MCU/per-block restart counting in every scan kind."""

    def __init__(self, ri):
        self.ri = ri
        self.bw = _BitWriter()
        self.chunks = []
        self.done = 0
        self.rst = 0

    def at_boundary(self):
        return self.ri and self.done and self.done % self.ri == 0

    def unit(self):
        """Call at the START of each MCU/block; returns True when a
        restart boundary was emitted (callers reset preds/EOB runs)."""
        boundary = self.at_boundary()
        if boundary:
            self.bw.flush()
            self.chunks.append(bytes(self.bw.out))
            self.chunks.append(bytes([0xFF, 0xD0 + (self.rst % 8)]))
            self.rst += 1
            self.bw = _BitWriter()
        self.done += 1
        return bool(boundary)

    def write(self, n, v):
        self.bw.write(n, v)

    def bytes(self):
        self.bw.flush()
        self.chunks.append(bytes(self.bw.out))
        return b"".join(self.chunks)


def _emit_dc_first(comps, mcus_x, mcus_y, al, ri=0):
    bw = _RestartingWriter(ri)
    codes = [_codes(*(DC_L if c["td"] == 0 else DC_C)) for c in comps]
    pred = [0] * len(comps)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if bw.unit():
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(c["zz"][my * c["v"] + by,
                                         mx * c["h"] + bx, 0])
                        v = dc >> al          # arithmetic shift (T.81 DC)
                        t, bits = _mag(v - pred[ci])
                        pred[ci] = v
                        ln, code = codes[ci][t]
                        bw.write(ln, code)
                        bw.write(t, bits)
    return bw.bytes()


def _emit_dc_refine(comps, mcus_x, mcus_y, al, ri=0):
    bw = _RestartingWriter(ri)
    for my in range(mcus_y):
        for mx in range(mcus_x):
            bw.unit()
            for c in comps:
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        dc = int(c["zz"][my * c["v"] + by,
                                         mx * c["h"] + bx, 0])
                        bw.write(1, (dc >> al) & 1)
    return bw.bytes()


def _emit_ac_first(c, ss, se, al, ri=0):
    bw = _RestartingWriter(ri)
    codes = _codes(*AC_FIRST_TBL)
    eobrun = 0

    def flush_eob():
        nonlocal eobrun
        if eobrun == 0:
            return
        nbits = eobrun.bit_length() - 1
        ln, code = codes[nbits << 4]
        bw.write(ln, code)
        if nbits:
            bw.write(nbits, eobrun & ((1 << nbits) - 1))
        eobrun = 0

    for by in range(c["nby"]):
        for bx in range(c["nbx"]):
            if bw.at_boundary():
                flush_eob()                # an EOB run cannot span RSTn
            bw.unit()
            zz = c["zz"][by, bx]
            r = 0
            any_nz = False
            for k in range(ss, se + 1):
                v = int(zz[k])
                t = abs(v) >> al
                if t == 0:
                    r += 1
                    continue
                flush_eob()
                while r > 15:
                    ln, code = codes[0xF0]
                    bw.write(ln, code)
                    r -= 16
                s, bits = _mag(t if v > 0 else -t)
                ln, code = codes[(r << 4) | s]
                bw.write(ln, code)
                bw.write(s, bits)
                r = 0
                any_nz = True
            if r > 0 or not any_nz:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()
    return bw.bytes()


def _emit_ac_refine(c, ss, se, al, ri=0):
    """T.81 G.1.2.3 (mirrors the libjpeg encoder structure): newly
    nonzero coefficients emit (run, 1) + a sign bit; already-nonzero
    ones buffer correction bits that flush after the next symbol; EOB
    runs carry their buffered bits."""
    bw = _RestartingWriter(ri)
    codes = _codes(*AC_REFINE_TBL)
    eobrun = 0
    be_buf: list[int] = []

    def flush_eob():
        nonlocal eobrun, be_buf
        if eobrun == 0:
            return
        nbits = eobrun.bit_length() - 1
        ln, code = codes[nbits << 4]
        bw.write(ln, code)
        if nbits:
            bw.write(nbits, eobrun & ((1 << nbits) - 1))
        for bit in be_buf:
            bw.write(1, bit)
        eobrun = 0
        be_buf = []

    for by in range(c["nby"]):
        for bx in range(c["nbx"]):
            if bw.at_boundary():
                flush_eob()                # buffered bits flush with it
            bw.unit()
            zz = c["zz"][by, bx]
            absv = [abs(int(zz[k])) >> al for k in range(ss, se + 1)]
            eob = ss - 1
            for k in range(ss, se + 1):
                if absv[k - ss] == 1:
                    eob = k
            r = 0
            br_buf: list[int] = []
            for k in range(ss, se + 1):
                t = absv[k - ss]
                if t == 0:
                    r += 1
                    continue
                while r > 15 and k <= eob:
                    flush_eob()
                    ln, code = codes[0xF0]
                    bw.write(ln, code)
                    r -= 16
                    for bit in br_buf:
                        bw.write(1, bit)
                    br_buf = []
                if t > 1:                  # history coefficient
                    br_buf.append(t & 1)
                    continue
                flush_eob()
                ln, code = codes[(r << 4) | 1]
                bw.write(ln, code)
                bw.write(1, 0 if int(zz[k]) < 0 else 1)
                for bit in br_buf:
                    bw.write(1, bit)
                br_buf = []
                r = 0
            if r > 0 or br_buf:
                eobrun += 1
                be_buf += br_buf
                if eobrun == 0x7FFF:
                    flush_eob()
    flush_eob()
    return bw.bytes()


def encode_jpeg_progressive(px, subsample=1, bands=((1, 5), (6, 63)),
                            drop_last_scan=False, restart_interval=0):
    """Progressive (SOF2) re-serialization of the baseline-quantized
    coefficients: interleaved DC first at Al=1, per-component banded AC
    first at Al=1, DC refinement, per-component banded AC refinements
    to Al=0. ``drop_last_scan`` emits an INCOMPLETE file (for the
    loud-rejection test)."""
    comps, hmax, vmax, mcus_x, mcus_y, h, w = _prep_comps(px, subsample)
    out = _headers(comps, h, w, 0xC2)
    dht = _dht(0, 0, DC_L) + _dht(1, 0, AC_FIRST_TBL) \
        + _dht(1, 1, AC_REFINE_TBL)
    if len(comps) > 1:
        dht += _dht(0, 1, DC_C)
    out += _seg(0xC4, dht)
    ri = restart_interval
    if ri:
        out += _seg(0xDD, struct.pack(">H", ri))
    scans = []
    tds = [c["td"] for c in comps]
    scans.append((_sos(comps, tds, [0] * len(comps), 0, 0, 0, 1),
                  _emit_dc_first(comps, mcus_x, mcus_y, 1, ri)))
    for c in comps:
        for (ss, se) in bands:
            scans.append((_sos([c], [0], [0], ss, se, 0, 1),
                          _emit_ac_first(c, ss, se, 1, ri)))
    scans.append((_sos(comps, tds, [0] * len(comps), 0, 0, 1, 0),
                  _emit_dc_refine(comps, mcus_x, mcus_y, 0, ri)))
    for c in comps:
        for (ss, se) in bands:
            scans.append((_sos([c], [0], [1], ss, se, 1, 0),
                          _emit_ac_refine(c, ss, se, 0, ri)))
    if drop_last_scan:
        scans = scans[:-1]
    for hdr, data in scans:
        out += hdr + data
    out += b"\xff\xd9"
    return bytes(out)


def encode_jpeg_multiscan_baseline(px, subsample=1):
    """Legal baseline SOF0 with one NON-INTERLEAVED scan per component
    (ADVICE r5: such files previously decoded as grayscale from the Y
    scan alone)."""
    comps, hmax, vmax, mcus_x, mcus_y, h, w = _prep_comps(px, subsample)
    out = _headers(comps, h, w, 0xC0)
    dht = _dht(0, 0, DC_L) + _dht(1, 0, AC_L)
    if len(comps) > 1:
        dht += _dht(0, 1, DC_C) + _dht(1, 1, AC_C)
    out += _seg(0xC4, dht)
    for c in comps:
        dc_codes = _codes(*(DC_L if c["td"] == 0 else DC_C))
        ac_codes = _codes(*(AC_L if c["td"] == 0 else AC_C))
        out += _sos([c], [c["td"]], [c["td"]], 0, 63, 0, 0)
        bw = _BitWriter()
        pred = 0
        for by in range(c["nby"]):
            for bx in range(c["nbx"]):
                zz = c["zz"][by, bx]
                t, bits = _mag(int(zz[0]) - pred)
                pred = int(zz[0])
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
        bw.flush()
        out += bw.out
    out += b"\xff\xd9"
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
    # flipping SOF0 → SOF2 leaves a baseline full-spectrum scan header,
    # which is illegal in a progressive frame — loud, not wrong
    prog = bytearray(good)
    prog[good.index(b"\xff\xc0") + 1] = 0xC2
    with pytest.raises(ValueError, match="spectral"):
        decode_jpeg_bytes(bytes(prog))
    # arithmetic coding (SOF9) still rejects by name
    arith = bytearray(good)
    arith[good.index(b"\xff\xc0") + 1] = 0xC9
    with pytest.raises(ValueError, match="arithmetic"):
        decode_jpeg_bytes(bytes(arith))
    with pytest.raises(ValueError, match="truncated|desync|SOS"):
        decode_jpeg_bytes(good[:40])
    with pytest.raises(ValueError):
        decode_jpeg_bytes(good[:-30])       # entropy stream cut short
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg_bytes(b"not a jpeg")


def test_jpeg_progressive_decode_equals_baseline_bit_for_bit():
    """The SOF2 oracle: the progressive re-serialization carries the
    SAME quantized coefficients, so decode must match the baseline
    decode exactly — gray, 4:4:4 color and 4:2:0 color (where the
    non-interleaved AC block grid is narrower than the interleaved
    one: 22px wide at h=2 → nbx 3 vs bx 4)."""
    cases = [(_smooth(33, 26), 1), (_smooth(24, 31, ch=3), 1),
             (_smooth(35, 22, ch=3, seed=11), 2)]
    for px, ss in cases:
        base = decode_jpeg_bytes(encode_jpeg(px, subsample=ss))
        prog = decode_jpeg_bytes(encode_jpeg_progressive(px, subsample=ss))
        assert np.array_equal(base["pixels"], prog["pixels"])
        assert (base["mean_r"], base["mean_g"], base["mean_b"]) == \
               (prog["mean_r"], prog["mean_g"], prog["mean_b"])


def test_jpeg_progressive_eobrun_and_band_shapes():
    # constant image: every AC-first scan is one maximal EOB run
    flat = np.full((40, 33), 200, dtype=np.uint8)
    assert np.array_equal(
        decode_jpeg_bytes(encode_jpeg_progressive(flat))["pixels"],
        decode_jpeg_bytes(encode_jpeg(flat))["pixels"])
    # single whole-spectrum AC band + a finer 4-band split decode the same
    px = _smooth(17, 29, ch=3, seed=21)
    base = decode_jpeg_bytes(encode_jpeg(px))
    for bands in (((1, 63),), ((1, 2), (3, 9), (10, 35), (36, 63))):
        got = decode_jpeg_bytes(encode_jpeg_progressive(px, bands=bands))
        assert np.array_equal(base["pixels"], got["pixels"]), bands


def test_jpeg_progressive_restart_markers():
    """Restart intervals inside progressive scans: RSTn boundaries
    reset the DC predictors AND the EOB-run/correction-bit state in
    every scan kind (DC first/refine, AC first/refine) — decode must
    still equal the baseline decode exactly."""
    for px, ss in [(_smooth(35, 22, ch=3, seed=13), 2),
                   (_smooth(21, 17), 1)]:
        base = decode_jpeg_bytes(encode_jpeg(px, subsample=ss))
        for ri in (1, 2, 5):
            got = decode_jpeg_bytes(encode_jpeg_progressive(
                px, subsample=ss, restart_interval=ri))
            assert np.array_equal(base["pixels"], got["pixels"]), \
                f"ri={ri} subsample={ss}"


def test_jpeg_progressive_randomized_scan_scripts():
    """Property sweep: random images × random spectral band splits ×
    random subsampling × random restart intervals must ALL decode
    bit-identical to the baseline encoding of the same image — the
    scan script is an encoder freedom the decoder may not observe."""
    rng = np.random.RandomState(20260815)
    for trial in range(6):
        h = int(rng.randint(8, 30))
        w = int(rng.randint(8, 30))
        ch = 3 if rng.randint(2) else None
        ss = int(rng.choice([1, 2])) if ch else 1
        px = (_smooth(h, w, ch=ch, seed=trial + 60) if ch
              else rng.randint(0, 256, size=(h, w)).astype(np.uint8))
        # random band split of 1..63
        cuts = sorted(set(int(c) for c in rng.randint(2, 63, size=3)))
        bands, lo = [], 1
        for c in cuts:
            bands.append((lo, c))
            lo = c + 1
        bands.append((lo, 63))
        ri = int(rng.choice([0, 1, 3]))
        base = decode_jpeg_bytes(encode_jpeg(px, subsample=ss))
        got = decode_jpeg_bytes(encode_jpeg_progressive(
            px, subsample=ss, bands=tuple(bands), restart_interval=ri))
        assert np.array_equal(base["pixels"], got["pixels"]), \
            f"trial {trial}: bands={bands} ri={ri} ss={ss} {w}x{h}"


def test_jpeg_progressive_incomplete_rejects():
    """A progressive stream whose last refinement never arrives
    (truncated crawl payload) must reject loudly, not render
    plausible-but-wrong magnitudes."""
    px = _smooth(16, 16, ch=3, seed=4)
    with pytest.raises(ValueError, match="incomplete"):
        decode_jpeg_bytes(encode_jpeg_progressive(px, drop_last_scan=True))


def test_jpeg_multiscan_baseline_decodes_all_components():
    """ADVICE r5: a legal baseline file with three single-component
    scans previously returned grayscale built from the Y scan alone —
    now it must decode identically to the interleaved encoding."""
    px = _smooth(35, 22, ch=3, seed=9)
    multi = decode_jpeg_bytes(encode_jpeg_multiscan_baseline(px,
                                                             subsample=2))
    inter = decode_jpeg_bytes(encode_jpeg(px, subsample=2))
    assert multi["channels"] == 3
    assert np.array_equal(multi["pixels"], inter["pixels"])
    # gray single-scan via the same non-interleaved path
    g = _smooth(19, 23)
    assert np.array_equal(
        decode_jpeg_bytes(encode_jpeg_multiscan_baseline(g))["pixels"],
        decode_jpeg_bytes(encode_jpeg(g))["pixels"])


def test_jpeg_header_bomb_rejects_before_allocation():
    """ADVICE r5: a few-hundred-byte payload whose SOF claims 3
    components near the pixel cap must reject on the TOTAL sample
    budget before any plane/coefficient store allocates (the old
    float64 planes staged ~1.6 GB per task ahead of the first entropy
    check)."""
    import resource
    sof = bytes([8]) + struct.pack(">HH", 5000, 5000) + bytes([3])
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])       # 4:4:4 → 75M samples > 2^26
    bomb = b"\xff\xd8" + _seg(0xC0, sof) + b"\xff\xd9"
    before = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    with pytest.raises(ValueError, match="component layout"):
        decode_jpeg_bytes(bomb)
    after = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    assert after - before < 64 * 1024, \
        f"rejection allocated {(after - before) / 1024:.0f} MB"  # KiB on linux


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


def test_jpeg_fill_bytes_before_markers():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes — a conforming file with fill padding must decode identically
    (review r6: the fill byte was parsed as a marker and the real
    marker byte as a segment length)."""
    px = _smooth(18, 15, ch=3, seed=31)
    good = encode_jpeg(px)
    want = decode_jpeg_bytes(good)
    # inject fill bytes before the DQT, SOF and EOI markers
    padded = bytearray(good)
    for marker in (b"\xff\xdb", b"\xff\xc0", b"\xff\xd9"):
        at = bytes(padded).index(marker)
        padded[at:at] = b"\xff" * 3
    got = decode_jpeg_bytes(bytes(padded))
    assert np.array_equal(want["pixels"], got["pixels"])
