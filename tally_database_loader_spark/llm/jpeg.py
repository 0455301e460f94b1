"""Baseline JPEG (ITU-T T.81) decoder, numpy-only — no PIL/libjpeg.

Round 5 retires the JPEG half of the ``decode_image`` stub the same way
round 4/5 retired WAV/PPM/BMP/PNG: the format's math (huffman entropy
coding, dequantization, the 8×8 inverse DCT, chroma upsampling, YCbCr→RGB)
is all computable with the standard library + numpy; only the convenience
of a C codec is missing from this container, not the possibility.

Scope — baseline sequential DCT, the overwhelmingly dominant JPEG on the
web (what cameras and `cjpeg` default to):

- SOF0 (baseline), 8-bit precision, 1 or 3 components, any sampling
  factors ≤ 4 (4:4:4, 4:2:0, 4:2:2, … all fall out of the generic
  h/v block loop), restart markers (DRI/RSTn), multi-segment DQT/DHT.
- Progressive (SOF2), arithmetic coding, 12-bit, and hierarchical JPEG
  reject with a loud ``ValueError`` — the module contract everywhere in
  ``llm/multimodal.py``: NULL-feature rows, never confidently-wrong
  pixels.

Correctness evidence (tests/test_jpeg.py): an INDEPENDENT spec-side
encoder (forward DCT per the T.81 definition, Annex K.1 quantization
tables, Annex K.3 typical huffman tables) round-trips seeded random
images through the decoder within the quantization-error bound; analytic
cases (constant blocks → DC-only spectra) decode exactly; truncated /
progressive / arithmetic streams reject.

The decode entry point returns the same record shape as the PNG/PPM/BMP
decoders in ``llm/multimodal.py`` (format, dims, channels, per-channel
means) plus the full pixel array for tests.

Throughput note: this is a correctness-first reference decoder — the
entropy loop is per-block Python (the IDCT and color math are numpy).
Inside ``mapInPandas`` it parallelizes across executors like any other
payload decode, but a production deployment with libjpeg available
swaps PIL into the same inner loop for ~100× per-image throughput with
zero plumbing changes; this module keeps the capability honest where no
native codec exists.
"""

from __future__ import annotations

import struct

import numpy as np

# --- 8x8 DCT basis (T.81 A.3.3): M[u, x] = C(u)/2 * cos((2x+1)u*pi/16) ---
_C = np.array([1.0 / np.sqrt(2.0)] + [1.0] * 7)
_DCT_M = np.array([[_C[u] / 2.0 * np.cos((2 * x + 1) * u * np.pi / 16.0)
                    for x in range(8)] for u in range(8)])

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63])


def idct2(block: np.ndarray) -> np.ndarray:
    """Inverse 8×8 DCT per the T.81 definition: s = Mᵀ · S · M."""
    return _DCT_M.T @ block @ _DCT_M


def fdct2(block: np.ndarray) -> np.ndarray:
    """Forward 8×8 DCT (the encoder/test side): S = M · s · Mᵀ."""
    return _DCT_M @ block @ _DCT_M.T


class _HuffTable:
    """Canonical huffman decode table from the DHT (BITS, HUFFVAL) lists
    (T.81 C.2): codes of each length assigned in increasing order."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lookup.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid huffman code in JPEG entropy stream")


class _BitReader:
    """Entropy-segment bit reader: 0xFF00 byte stuffing unwrapped, any
    other marker terminates the segment (RSTn are consumed by the MCU
    loop between restart intervals, not here)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.bits = 0
        self.nbits = 0

    def read_bit(self) -> int:
        if self.nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG entropy stream truncated")
                nxt = self.data[self.pos]
                if nxt == 0x00:
                    self.pos += 1          # stuffed FF
                else:
                    raise ValueError("unexpected marker inside JPEG scan")
            self.bits = byte
            self.nbits = 8
        self.nbits -= 1
        return (self.bits >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align(self) -> None:
        self.nbits = 0

    def at_marker(self) -> int | None:
        """Peek: is the (byte-aligned) stream at a marker? Return its
        second byte if so."""
        if self.pos + 1 < len(self.data) and self.data[self.pos] == 0xFF \
                and self.data[self.pos + 1] != 0x00:
            return self.data[self.pos + 1]
        return None


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: map the t-bit magnitude to its signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_bytes(b: bytes) -> dict:
    """Decode one baseline JPEG payload to pixels + the standard image
    record (format/width/height/channels/means). Raises ``ValueError``
    on anything outside the supported profile — loud, never wrong."""
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart_interval = 0
    while pos + 4 <= len(b):
        if b[pos] != 0xFF:
            raise ValueError("JPEG marker desync")
        marker = b[pos + 1]
        if marker == 0xD9:                 # EOI before SOS
            break
        seglen, = struct.unpack_from(">H", b, pos + 2)
        seg = b[pos + 4:pos + 2 + seglen]
        if len(seg) != seglen - 2:
            raise ValueError("truncated JPEG segment")
        if marker == 0xDB:                 # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                if pq != 0:
                    raise ValueError("16-bit quantization unsupported")
                tbl = np.frombuffer(seg, dtype=np.uint8, count=64,
                                    offset=i + 1).astype(np.float64)
                out = np.zeros(64)
                out[_ZIGZAG] = tbl
                qt[tq] = out.reshape(8, 8)
                i += 65
        elif marker == 0xC4:               # DHT
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                n = sum(counts)
                table = _HuffTable(counts, seg[i + 17:i + 17 + n])
                (huff_dc if tc == 0 else huff_ac)[th] = table
                i += 17 + n
        elif marker == 0xC0:               # SOF0 baseline
            prec, h, w, ncomp = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                raise ValueError(f"JPEG precision {prec} unsupported")
            if h == 0 or w == 0:
                raise ValueError(f"degenerate JPEG dimensions {w}x{h}")
            if w * h > (1 << 26):
                # a flipped SOF byte must not become a multi-GB plane
                # allocation before the entropy data can contradict it
                raise ValueError(f"implausible JPEG dimensions {w}x{h}")
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                              "tq": tq})
            frame = {"w": w, "h": h, "comps": comps}
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only baseline sequential JPEG (SOF0) is supported "
                f"(got SOF marker 0xFF{marker:02X} — progressive/"
                "arithmetic/hierarchical need libjpeg)")
        elif marker == 0xDD:               # DRI
            restart_interval, = struct.unpack_from(">H", seg, 0)
        elif marker == 0xDA:               # SOS — entropy data follows
            if frame is None:
                raise ValueError("JPEG SOS before SOF0")
            ns = seg[0]
            scan = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c], seg[2 + 2 * c]
                comp = next((x for x in frame["comps"] if x["id"] == cs),
                            None)
                if comp is None:
                    raise ValueError(f"JPEG scan references unknown "
                                     f"component id {cs}")
                scan.append({**comp, "dc": tdta >> 4, "ac": tdta & 15})
            return _decode_scan(b, pos + 2 + seglen, frame, scan, qt,
                                huff_dc, huff_ac, restart_interval)
        # APPn / COM / others: skip
        pos += 2 + seglen
    raise ValueError("JPEG has no SOS scan")


def _decode_scan(b, pos, frame, scan, qt, huff_dc, huff_ac,
                 restart_interval) -> dict:
    w, h = frame["w"], frame["h"]
    hmax = max(c["h"] for c in scan)
    vmax = max(c["v"] for c in scan)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise ValueError("JPEG sampling factors out of range")
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    planes = []
    for c in scan:
        planes.append(np.zeros((mcus_y * c["v"] * 8, mcus_x * c["h"] * 8)))
    br = _BitReader(b, pos)
    pred = [0] * len(scan)
    done = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and done and done % restart_interval == 0:
                br.align()
                m = br.at_marker()
                if m is None or not (0xD0 <= m <= 0xD7):
                    raise ValueError("expected JPEG restart marker")
                br.pos += 2
                pred = [0] * len(scan)
            for ci, c in enumerate(scan):
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        block = _decode_block(br, huff_dc.get(c["dc"]),
                                              huff_ac.get(c["ac"]),
                                              qt.get(c["tq"]), pred, ci)
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0:y0 + 8, x0:x0 + 8] = block
            done += 1
    # upsample each component to full resolution (nearest), crop, stack
    full = []
    for ci, c in enumerate(scan):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if (ry, rx) != (1, 1):
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:h, :w])
    if len(full) == 1:
        gray = np.clip(full[0] + 128.0, 0, 255)
        px = np.round(gray).astype(np.uint8)
        mean = float(px.astype(np.float64).mean())
        return {"format": "jpeg", "width": w, "height": h, "channels": 1,
                "mean_r": mean, "mean_g": mean, "mean_b": mean,
                "pixels": px[:, :, None]}
    if len(full) != 3:
        raise ValueError(f"JPEG with {len(full)} components unsupported")
    y = full[0] + 128.0
    cb = full[1]
    cr = full[2]
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    bl = y + 1.772 * cb
    rgb = np.clip(np.stack([r, g, bl], axis=2), 0, 255)
    px = np.round(rgb).astype(np.uint8)
    means = px.astype(np.float64).mean(axis=(0, 1))
    return {"format": "jpeg", "width": w, "height": h, "channels": 3,
            "mean_r": float(means[0]), "mean_g": float(means[1]),
            "mean_b": float(means[2]), "pixels": px}


def _decode_block(br, dc_table, ac_table, q, pred, ci) -> np.ndarray:
    if dc_table is None or ac_table is None or q is None:
        raise ValueError("JPEG scan references an undefined DQT/DHT table")
    zz = np.zeros(64)
    t = dc_table.decode(br)
    if t > 11:
        raise ValueError("invalid JPEG DC category")
    pred[ci] += _extend(br.receive(t), t)
    zz[0] = pred[ci]
    k = 1
    while k < 64:
        rs = ac_table.decode(br)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if rs == 0x00:                 # EOB
                break
            if rs == 0xF0:                 # ZRL
                k += 16
                continue
            raise ValueError("invalid JPEG AC run/size")
        k += r
        if k > 63:
            raise ValueError("JPEG AC coefficient index overflow")
        zz[k] = _extend(br.receive(s), s)
        k += 1
    coefs = np.zeros(64)
    coefs[_ZIGZAG] = zz
    return idct2(coefs.reshape(8, 8) * q)
