"""WebP-lossless (VP8L) decoder tests (llm/webp.py) against an
INDEPENDENT spec-side encoder: its own canonical-prefix-code builder
(heap huffman + DEFLATE canonical assignment), the 19-symbol
code-length code, simple 1/2-symbol trees, forward transforms
(subtract-green, predictor residuals, color-transform deltas,
palette + pixel bundling), color-cache emission, LZ77 backward
references and meta prefix groups — written here, not shared with the
decoder, so a decode bug cannot cancel against an encode bug. All
round-trips must be EXACT (lossless format, exact oracle)."""

from __future__ import annotations

import heapq
import struct

import numpy as np
import pytest

from tally_database_loader_spark.llm.webp import (decode_vp8l_payload,
                                                  decode_webp_bytes)

_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13,
             14, 15)


class _Bw:
    """LSB-first bit writer (the VP8L convention)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, nbits, value):
        for i in range(nbits):
            self.acc |= ((value >> i) & 1) << self.n
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                self.acc = 0
                self.n = 0

    def write_code(self, nbits, code):
        """Prefix codes are written MSB-first (decoder reads bit by bit
        into `code = code<<1 | bit`)."""
        for i in range(nbits - 1, -1, -1):
            self.write(1, (code >> i) & 1)

    def flush(self):
        if self.n:
            self.out.append(self.acc)
            self.acc, self.n = 0, 0


def _huff_lengths(freqs, max_len=15):
    """Code lengths via heap huffman; if the depth cap is exceeded,
    fall back to uniform frequencies (balanced ⇒ depth ≤ 9 for ≤ 304
    symbols, always complete)."""
    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 1}
    heap = [(freqs[s], i, (s,)) for i, s in enumerate(syms)]
    heapq.heapify(heap)
    tick = len(syms)
    depth = dict.fromkeys(syms, 0)
    while len(heap) > 1:
        fa, _, a = heapq.heappop(heap)
        fb, _, b = heapq.heappop(heap)
        for s in a + b:
            depth[s] += 1
        heapq.heappush(heap, (fa + fb, tick, a + b))
        tick += 1
    if max(depth.values()) > max_len:
        return _huff_lengths({s: 1 for s in syms}, max_len)
    return depth


def _canon_codes(lengths):
    """DEFLATE canonical assignment — must mirror the decoder's."""
    nz = sorted((ln, s) for s, ln in lengths.items() if ln > 0)
    if len(nz) == 1:
        return {nz[0][1]: (0, 0)}          # single-node: zero bits
    max_len = nz[-1][0]
    counts = [0] * (max_len + 1)
    for ln, _ in nz:
        counts[ln] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + counts[ln - 1]) << 1
        next_code[ln] = code
    out = {}
    for ln, s in nz:
        out[s] = (ln, next_code[ln])
        next_code[ln] += 1
    return out


def _emit_tree(bw, freqs, alphabet):
    """Emit one prefix code; returns {sym: (nbits, code)}. Uses the
    SIMPLE form for ≤2 sub-256 symbols (exercising that decoder path),
    else the full code-length-coded form (exercising the 19-symbol
    code-length code)."""
    syms = sorted(freqs)
    if 1 <= len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)                     # simple
        bw.write(1, len(syms) - 1)
        bw.write(1, 1)                     # first symbol in 8 bits
        bw.write(8, syms[0])
        if len(syms) == 2:
            bw.write(8, syms[1])
            return {syms[0]: (1, 0), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    lengths = _huff_lengths(freqs)
    lens = [lengths.get(s, 0) for s in range(alphabet)]
    cl_freq = {}
    for ln in lens:
        cl_freq[ln] = cl_freq.get(ln, 0) + 1
    cl_lengths = _huff_lengths(cl_freq, max_len=7)
    cl_codes = _canon_codes(cl_lengths)
    bw.write(1, 0)                         # not simple
    pos_of = {s: i for i, s in enumerate(_CL_ORDER)}
    last = max(pos_of[s] for s in cl_lengths)
    num = max(4, last + 1)
    bw.write(4, num - 4)
    for i in range(num):
        bw.write(3, cl_lengths.get(_CL_ORDER[i], 0))
    bw.write(1, 0)                         # no explicit max_symbol
    for ln in lens:
        nb, code = cl_codes[ln]
        bw.write_code(nb, code)
    return _canon_codes(lengths)


def _prefix_encode(v):
    """Inverse of the decoder's prefix_value: (code, extra_val, extra_bits)."""
    if v <= 4:
        return v - 1, 0, 0
    for code in range(4, 44):
        extra = (code - 2) >> 1
        offset = (2 + (code & 1)) << extra
        if offset + 1 <= v <= offset + (1 << extra):
            return code, v - offset - 1, extra
    raise AssertionError(f"value {v} out of prefix range")


def _cache_hash(argb, bits):
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - bits)


def _s8(v):
    return v - 256 if v > 127 else v


def _tokenize(pixels, w, cache_bits, lz77):
    """Greedy tokenization: dist-1 / dist-w runs ≥ 3 when lz77 is on,
    then color-cache hits, then literals — mirroring the decoder's
    cache-insertion discipline (insert on literal and copy, not on
    cache hit)."""
    cache = [None] * (1 << cache_bits) if cache_bits else None
    toks = []
    n = len(pixels)
    pos = 0
    while pos < n:
        if lz77 and pos > 0:
            best = (0, 0)
            for dist in (1, w):
                if dist > pos:
                    continue
                ln = 0
                while pos + ln < n and ln < 4096 \
                        and pixels[pos + ln] == pixels[pos + ln - dist]:
                    ln += 1
                if ln > best[0]:
                    best = (ln, dist)
            if best[0] >= 3:
                ln, dist = best
                toks.append(("copy", ln, dist))
                if cache is not None:
                    for k in range(ln):
                        px = pixels[pos + k]
                        cache[_cache_hash(px, cache_bits)] = px
                pos += ln
                continue
        px = pixels[pos]
        if cache is not None and cache[_cache_hash(px, cache_bits)] == px:
            toks.append(("cache", _cache_hash(px, cache_bits)))
            pos += 1
            continue
        toks.append(("lit", px))
        if cache is not None:
            cache[_cache_hash(px, cache_bits)] = px
        pos += 1
    return toks


def _emit_body(bw, pixels, w, cache_bits=0, lz77=False, group_of=None,
               n_groups=1):
    """Trees + token stream for one image (cache info / meta bit are
    written by the caller — their order differs between the main image
    and sub-images). ``group_of(pos)`` selects the meta group per
    pixel."""
    toks = _tokenize(pixels, w, cache_bits, lz77)
    # group assignment must follow the DECODED pixel position
    tok_group = []
    pos = 0
    for t in toks:
        tok_group.append(group_of(pos) if group_of else 0)
        pos += t[1] if t[0] == "copy" else 1
    galpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    freqs = [{"g": {}, "r": {}, "b": {}, "a": {}, "d": {}}
             for _ in range(n_groups)]
    def bump(fr, k, s):
        fr[k][s] = fr[k].get(s, 0) + 1
    for t, gi in zip(toks, tok_group):
        fr = freqs[gi]
        if t[0] == "lit":
            px = t[1]
            bump(fr, "g", (px >> 8) & 0xFF)
            bump(fr, "r", (px >> 16) & 0xFF)
            bump(fr, "b", px & 0xFF)
            bump(fr, "a", (px >> 24) & 0xFF)
        elif t[0] == "copy":
            bump(fr, "g", 256 + _prefix_encode(t[1])[0])
            bump(fr, "d", _prefix_encode(t[2] + 120)[0])
        else:
            bump(fr, "g", 280 + t[1])
    codes = []
    for fr in freqs:
        # every tree must exist even if unused in this group
        for k, alph in (("g", galpha), ("r", 256), ("b", 256),
                        ("a", 256), ("d", 40)):
            if not fr[k]:
                fr[k] = {0: 1}
        codes.append({k: _emit_tree(bw, fr[k],
                                    {"g": galpha, "d": 40}.get(k, 256))
                      for k in ("g", "r", "b", "a", "d")})
    for t, gi in zip(toks, tok_group):
        c = codes[gi]
        if t[0] == "lit":
            px = t[1]
            bw.write_code(*c["g"][(px >> 8) & 0xFF])
            bw.write_code(*c["r"][(px >> 16) & 0xFF])
            bw.write_code(*c["b"][px & 0xFF])
            bw.write_code(*c["a"][(px >> 24) & 0xFF])
        elif t[0] == "copy":
            lc, lx, lb = _prefix_encode(t[1])
            bw.write_code(*c["g"][256 + lc])
            bw.write(lb, lx)
            dc, dx, db = _prefix_encode(t[2] + 120)
            bw.write_code(*c["d"][dc])
            bw.write(db, dx)
        else:
            bw.write_code(*c["g"][280 + t[1]])


def _emit_subimage(bw, pixels, w):
    """Entropy-coded sub-image (transform data / palette / meta image):
    no transforms, no meta bit; it does carry (empty) cache info."""
    bw.write(1, 0)
    _emit_body(bw, pixels, w)


def _pack_argb(arr):
    """(h, w, 4) uint8 RGBA → flat ARGB int list."""
    a = arr.astype(np.uint32)
    return [int((a[y, x, 3] << 24) | (a[y, x, 0] << 16)
                | (a[y, x, 1] << 8) | a[y, x, 2])
            for y in range(arr.shape[0]) for x in range(arr.shape[1])]


def _avg2(p, q):
    return (((p ^ q) & 0xFEFEFEFE) >> 1) + (p & q)


def _tch(p):
    return [(p >> 24) & 255, (p >> 16) & 255, (p >> 8) & 255, p & 255]


def _tpack(c):
    return (c[0] << 24) | (c[1] << 16) | (c[2] << 8) | c[3]


def _tpredict(mode, L, T, TL, TR):
    """INDEPENDENT spec-side predictor (per-channel plain-int math,
    deliberately a different implementation style than the decoder's
    packed-word tricks, so e.g. an Average2 carry-bleed bug cannot
    cancel)."""
    l_, t_, tl, tr = _tch(L), _tch(T), _tch(TL), _tch(TR)

    def avg(a, b):
        return [(x + y) // 2 for x, y in zip(a, b)]

    def clamp(v):
        return 0 if v < 0 else (255 if v > 255 else v)
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return _tpack(avg(avg(l_, tr), t_))
    if mode == 6:
        return _tpack(avg(l_, tl))
    if mode == 7:
        return _tpack(avg(l_, t_))
    if mode == 8:
        return _tpack(avg(tl, t_))
    if mode == 9:
        return _tpack(avg(t_, tr))
    if mode == 10:
        return _tpack(avg(avg(l_, tl), avg(t_, tr)))
    if mode == 11:
        pl = sum(abs(t_[i] - tl[i]) for i in range(4))
        pt = sum(abs(l_[i] - tl[i]) for i in range(4))
        return L if pl < pt else T
    if mode == 12:
        return _tpack([clamp(l_[i] + t_[i] - tl[i]) for i in range(4)])
    if mode == 13:
        a2 = avg(l_, t_)

        def half(a, b):
            d = a - b
            return clamp(a + (d // 2 if d >= 0 else -((-d) // 2)))
        return _tpack([half(a2[i], tl[i]) for i in range(4)])
    raise AssertionError(mode)


def _fwd_predict(pixels, w, h, size_bits, mode_of):
    """Forward predictor transform: residual = px - pred (per channel,
    mod 256), preds from ORIGINAL neighbors; same edge rules as the
    decoder. Returns (residuals, block-map sub-image pixels, bw)."""

    def sub_px(p, q):
        return ((((p & 0xFF000000) - (q & 0xFF000000)) & 0xFF000000)
                | (((p & 0xFF0000) - (q & 0xFF0000)) & 0xFF0000)
                | (((p & 0xFF00) - (q & 0xFF00)) & 0xFF00)
                | ((p - q) & 0xFF))
    bw_blocks = -(-w // (1 << size_bits))
    bh_blocks = -(-h // (1 << size_bits))
    res = []
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pixels[i - 1]
            elif x == 0:
                pred = pixels[i - w]
            else:
                mode = mode_of(x >> size_bits, y >> size_bits)
                tr = pixels[i - w + 1] if x + 1 < w else pixels[y * w]
                pred = _tpredict(mode, pixels[i - 1], pixels[i - w],
                                 pixels[i - w - 1], tr)
            res.append(sub_px(pixels[i], pred))
    sub = [0xFF000000 | (mode_of(bx, by) << 8)
           for by in range(bh_blocks) for bx in range(bw_blocks)]
    return res, sub, bw_blocks


def encode_webp_lossless(rgba, cache_bits=0, lz77=False,
                         subtract_green=False, predictor=None,
                         color_tf=None, palette=False,
                         alpha_hint=None):
    """Spec-side VP8L encoder. ``rgba``: (h, w, 4) uint8. Transforms
    are applied (and written) in the order: palette OR
    [subtract_green, color_tf, predictor]."""
    h, w = rgba.shape[:2]
    pixels = _pack_argb(rgba)
    bw = _Bw()
    bw.write(8, 0x2F)
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    if alpha_hint is None:
        alpha_hint = int(bool((rgba[:, :, 3] != 255).any()))
    bw.write(1, alpha_hint)
    bw.write(3, 0)                         # version
    data_w = w
    pending_subs = []
    if palette:
        colors = []
        index = {}
        for p in pixels:
            if p not in index:
                index[p] = len(colors)
                colors.append(p)
        assert len(colors) <= 256
        bw.write(1, 1)
        bw.write(2, 3)                     # COLOR_INDEXING
        bw.write(8, len(colors) - 1)
        deltas = []
        prev = 0
        for cpx in colors:
            d = ((((cpx >> 24) - (prev >> 24)) & 0xFF) << 24
                 | (((cpx >> 16) - (prev >> 16)) & 0xFF) << 16
                 | (((cpx >> 8) - (prev >> 8)) & 0xFF) << 8
                 | ((cpx - prev) & 0xFF))
            deltas.append(d)
            prev = cpx
        _emit_subimage(bw, deltas, len(colors))
        if len(colors) <= 2:
            xbits = 3
        elif len(colors) <= 4:
            xbits = 2
        elif len(colors) <= 16:
            xbits = 1
        else:
            xbits = 0
        if xbits:
            per = 1 << xbits
            bpp = 8 >> xbits
            data_w = -(-w // per)
            packed = []
            for y in range(h):
                for xp in range(data_w):
                    g = 0
                    for k in range(per):
                        x = xp * per + k
                        if x < w:
                            g |= index[pixels[y * w + x]] << (k * bpp)
                    packed.append(0xFF000000 | (g << 8))
            pixels = packed
        else:
            pixels = [0xFF000000 | (index[p] << 8) for p in pixels]
    else:
        if subtract_green:
            bw.write(1, 1)
            bw.write(2, 2)
            out = []
            for p in pixels:
                g = (p >> 8) & 0xFF
                r = ((p >> 16) - g) & 0xFF
                b = (p - g) & 0xFF
                out.append((p & 0xFF00FF00) | (r << 16) | b)
            pixels = out
        if color_tf is not None:
            g2r, g2b, r2b, size_bits = color_tf
            bw.write(1, 1)
            bw.write(2, 1)
            bw.write(3, size_bits - 2)
            out = []
            for p in pixels:
                a, r = (p >> 24) & 0xFF, (p >> 16) & 0xFF
                g, b = (p >> 8) & 0xFF, p & 0xFF
                r2 = (r - ((_s8(g2r) * _s8(g)) >> 5)) & 0xFF
                b2 = (b - ((_s8(g2b) * _s8(g)) >> 5)) & 0xFF
                b2 = (b2 - ((_s8(r2b) * _s8(r)) >> 5)) & 0xFF
                out.append((a << 24) | (r2 << 16) | (g << 8) | b2)
            pixels = out
            bwk = -(-w // (1 << size_bits))
            bhk = -(-h // (1 << size_bits))
            cm = 0xFF000000 | ((r2b & 0xFF) << 16) | ((g2b & 0xFF) << 8) \
                | (g2r & 0xFF)
            _emit_subimage(bw, [cm] * (bwk * bhk), bwk)
        if predictor is not None:
            size_bits, mode_of = predictor
            bw.write(1, 1)
            bw.write(2, 0)
            bw.write(3, size_bits - 2)
            pixels, sub, bwb = _fwd_predict(pixels, data_w, h, size_bits,
                                            mode_of)
            _emit_subimage(bw, sub, bwb)
    bw.write(1, 0)                         # end of transforms
    if cache_bits:
        bw.write(1, 1)
        bw.write(4, cache_bits)
    else:
        bw.write(1, 0)
    bw.write(1, 0)                         # no meta prefix codes
    _emit_body(bw, pixels, data_w, cache_bits=cache_bits, lz77=lz77)
    bw.flush()
    return _riff(bytes(bw.out))


def encode_webp_meta(rgba, meta_bits=2):
    """Two meta prefix groups split at a block column boundary —
    exercises the decoder's entropy-image group selection."""
    h, w = rgba.shape[:2]
    pixels = _pack_argb(rgba)
    bw = _Bw()
    bw.write(8, 0x2F)
    bw.write(14, w - 1)
    bw.write(14, h - 1)
    bw.write(1, int(bool((rgba[:, :, 3] != 255).any())))
    bw.write(3, 0)
    bw.write(1, 0)                         # no transforms
    bw.write(1, 0)                         # no color cache
    bw.write(1, 1)                         # meta prefix codes present
    bw.write(3, meta_bits - 2)
    mw = -(-w // (1 << meta_bits))
    mh = -(-h // (1 << meta_bits))
    split = max(1, mw // 2)
    meta = [0xFF000000 | ((1 if bx >= split else 0) << 8)
            for _ in range(mh) for bx in range(mw)]
    _emit_subimage(bw, meta, mw)

    def group_of(pos):
        return 1 if ((pos % w) >> meta_bits) >= split else 0
    _emit_body(bw, pixels, w, group_of=group_of, n_groups=2)
    bw.flush()
    return _riff(bytes(bw.out))


def _riff(payload):
    if len(payload) % 2:
        payload += b"\x00"
    return (b"RIFF" + struct.pack("<I", 12 + len(payload)) + b"WEBP"
            + b"VP8L" + struct.pack("<I", len(payload)) + payload)


# --- tests -------------------------------------------------------------------

def _rand_rgba(h, w, seed, alpha=255, colors=None):
    rng = np.random.RandomState(seed)
    if colors is not None:
        pal = rng.randint(0, 256, size=(colors, 4)).astype(np.uint8)
        pal[:, 3] = alpha
        return pal[rng.randint(0, colors, size=(h, w))]
    px = rng.randint(0, 256, size=(h, w, 4)).astype(np.uint8)
    px[:, :, 3] = alpha
    return px


def _assert_exact(rgba, blob, channels=None):
    rec = decode_webp_bytes(blob)
    h, w = rgba.shape[:2]
    assert (rec["format"], rec["width"], rec["height"]) == ("webp", w, h)
    assert np.array_equal(rec["pixels"], rgba[:, :, :3]), "pixel mismatch"
    want = rgba[:, :, :3].astype(np.float64).mean(axis=(0, 1))
    assert (rec["mean_r"], rec["mean_g"], rec["mean_b"]) == \
           (want[0], want[1], want[2])
    if channels is not None:
        assert rec["channels"] == channels
    return rec


def test_vp8l_literals_roundtrip_exact():
    px = _rand_rgba(7, 11, seed=1)
    _assert_exact(px, encode_webp_lossless(px), channels=3)
    # alpha-carrying image reports 4 channels, means stay RGB-only
    pa = _rand_rgba(5, 6, seed=2, alpha=77)
    _assert_exact(pa, encode_webp_lossless(pa), channels=4)
    # 1x1
    one = _rand_rgba(1, 1, seed=3)
    _assert_exact(one, encode_webp_lossless(one))


def test_vp8l_color_cache_roundtrip():
    # few distinct colors → heavy cache traffic
    px = _rand_rgba(16, 13, seed=4, colors=7)
    for bits in (1, 4, 8):
        _assert_exact(px, encode_webp_lossless(px, cache_bits=bits))


def test_vp8l_lz77_runs_and_distance_rows():
    # constant rows → dist-1 runs; repeated rows → dist-w copies
    base = _rand_rgba(4, 19, seed=5, colors=3)
    px = np.repeat(base, 3, axis=0)          # 12 rows, repeats of 4
    _assert_exact(px, encode_webp_lossless(px, lz77=True))
    _assert_exact(px, encode_webp_lossless(px, lz77=True, cache_bits=3))
    flat = np.tile(_rand_rgba(1, 1, seed=6), (9, 33, 1))
    _assert_exact(flat, encode_webp_lossless(flat, lz77=True))


def test_vp8l_distance_neighborhood_map():
    """Plain distance codes (>120) and 2D-map codes must resolve to the
    same pixel source: hand-emit a copy with map code 2 = (1, 0) ⇒
    dist 1 and compare against the plain encoding of the same image."""
    from tally_database_loader_spark.llm.webp import _DIST_MAP
    assert _DIST_MAP[0] == (0, 1) and _DIST_MAP[1] == (1, 0)
    assert _DIST_MAP[3] == (-1, 1) and _DIST_MAP[119] == (8, 7)
    # dist 1 via map code 2: pixel run of length 4
    px = np.tile(np.array([[10, 20, 30, 255]], dtype=np.uint8), (1, 5, 1)
                 ).reshape(1, 5, 4)
    bw = _Bw()
    bw.write(8, 0x2F)
    bw.write(14, 4)
    bw.write(14, 0)
    bw.write(1, 0)
    bw.write(3, 0)
    bw.write(1, 0)                          # no transforms
    bw.write(1, 0)                          # no cache
    bw.write(1, 0)                          # no meta
    # trees: green {20, 256+len_code}, r {10}, b {30}, a {255}, d {code2}
    lc, lx, lb = _prefix_encode(4)
    dc, dx, db = _prefix_encode(2)          # map code 2 = (1,0) → dist 1
    cg = _emit_tree(bw, {20: 1, 256 + lc: 1}, 256 + 24)
    cr = _emit_tree(bw, {10: 1}, 256)
    cb = _emit_tree(bw, {30: 1}, 256)
    ca = _emit_tree(bw, {255: 1}, 256)
    cd = _emit_tree(bw, {dc: 1}, 40)
    bw.write_code(*cg[20])        # literal G
    bw.write_code(*cr[10])
    bw.write_code(*cb[30])
    bw.write_code(*ca[255])
    bw.write_code(*cg[256 + lc])  # copy len 4
    bw.write(lb, lx)
    bw.write_code(*cd[dc])
    bw.write(db, dx)
    bw.flush()
    rec = decode_vp8l_payload(bytes(bw.out))
    assert np.array_equal(rec["pixels"], px[:, :, :3])


def test_vp8l_subtract_green_and_color_transform():
    px = _rand_rgba(9, 14, seed=7)
    _assert_exact(px, encode_webp_lossless(px, subtract_green=True))
    _assert_exact(px, encode_webp_lossless(
        px, color_tf=(23, -17 & 0xFF, 101, 3)))
    _assert_exact(px, encode_webp_lossless(
        px, subtract_green=True, color_tf=(255, 128, 64, 2),
        cache_bits=2))


def test_vp8l_predictor_all_modes():
    px = _rand_rgba(17, 23, seed=8)
    for mode in range(14):
        _assert_exact(px, encode_webp_lossless(
            px, predictor=(2, lambda bx, by, m=mode: m)), channels=3)
    # mixed block map: mode varies per block
    _assert_exact(px, encode_webp_lossless(
        px, predictor=(3, lambda bx, by: (bx * 5 + by * 3) % 14)))
    # stacked: subtract-green then predictor
    _assert_exact(px, encode_webp_lossless(
        px, subtract_green=True, predictor=(2, lambda bx, by: 11)))


def test_vp8l_palette_and_bundling():
    for colors, w in ((2, 19), (4, 9), (13, 21), (30, 7)):
        px = _rand_rgba(6, w, seed=10 + colors, colors=colors)
        _assert_exact(px, encode_webp_lossless(px, palette=True))


def test_vp8l_meta_prefix_groups():
    px = _rand_rgba(11, 18, seed=20)
    _assert_exact(px, encode_webp_meta(px, meta_bits=2))


def test_vp8l_rejections_are_loud():
    px = _rand_rgba(6, 6, seed=30)
    good = encode_webp_lossless(px)
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp_bytes(b"not a webp at all")
    with pytest.raises(ValueError, match="lossy WebP"):
        decode_webp_bytes(good[:12] + b"VP8 " + good[16:])
    with pytest.raises(ValueError, match="truncated|VP8L"):
        decode_webp_bytes(good[:20])
    with pytest.raises(ValueError):
        decode_webp_bytes(good[:-6])        # entropy stream cut short
    # incomplete prefix code: a hand-built stream whose green tree has
    # two symbols at length 2 (kraft 2/4 — undersubscribed) via the
    # max_symbol shortcut
    bw = _Bw()
    bw.write(8, 0x2F)
    bw.write(14, 0)
    bw.write(14, 0)
    bw.write(1, 0)
    bw.write(3, 0)
    bw.write(1, 0)                          # no transforms
    bw.write(1, 0)                          # no cache
    bw.write(1, 0)                          # no meta
    bw.write(1, 0)                          # green: full form
    bw.write(4, 1)                          # 5 code-length codes
    for ln in (1, 0, 0, 0, 1):              # order 17,18,0,1,2
        bw.write(3, ln)
    bw.write(1, 1)                          # explicit max_symbol
    bw.write(3, 0)                          # length_nbits = 2
    bw.write(2, 0)                          # max_symbol = 2
    bw.write_code(1, 0)                     # cl sym 2: green sym0 len 2
    bw.write_code(1, 0)                     # cl sym 2: green sym1 len 2
    with pytest.raises(ValueError, match="incomplete"):
        decode_vp8l_payload(bytes(bw.out) + b"\x00" * 8)
    # round 7 (ADVICE r6): cache flag SET with cache_bits=0 must reject —
    # libwebp requires 1..11 when the flag bit is set; silently treating
    # 0 as "no cache" would decode a malformed stream to plausible pixels
    bw = _Bw()
    bw.write(8, 0x2F)
    bw.write(14, 0)
    bw.write(14, 0)
    bw.write(1, 0)
    bw.write(3, 0)
    bw.write(1, 0)                          # no transforms
    bw.write(1, 1)                          # cache flag set...
    bw.write(4, 0)                          # ...but cache_bits = 0
    bw.flush()
    with pytest.raises(ValueError, match="cache bits out of range"):
        decode_vp8l_payload(bytes(bw.out) + b"\x00" * 8)


def test_webp_through_spark_and_resize(spark):
    from tally_database_loader_spark.llm.multimodal import (
        decode_image_features, resize_images)
    px = _rand_rgba(10, 8, seed=40, colors=5)
    good = encode_webp_lossless(px, cache_bits=2)
    df = spark.createDataFrame(
        [(1, good), (2, good[:15] + b"\x00" + good[16:])],
        "doc_id bigint, payload binary")
    rows = {r.doc_id: r for r in decode_image_features(df).collect()}
    want = px[:, :, :3].astype(np.float64).mean(axis=(0, 1))
    assert rows[1].format == "webp" and rows[1].mean_r == want[0]
    assert rows[2].format is None
    out = resize_images(spark.createDataFrame(
        [(1, good)], "doc_id bigint, payload binary"), 4, 5).collect()[0]
    assert out.src_format == "webp"
    yi = (np.arange(5) * 10) // 5
    xi = (np.arange(4) * 8) // 4
    assert bytes(out.payload) == b"P6\n4 5\n255\n" \
        + px[:, :, :3][yi][:, xi].tobytes()


def _vp8x_container(inner_chunks, cw, ch, anim=False):
    """Extended-container builder: VP8X header + given chunks."""
    def u24(v):
        return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])

    def chunk(tag, payload):
        out = tag + struct.pack("<I", len(payload)) + payload
        return out + (b"\x00" if len(payload) % 2 else b"")
    vp8x = bytes([0x02 if anim else 0x00]) + b"\x00\x00\x00" \
        + u24(cw - 1) + u24(ch - 1)
    body = chunk(b"VP8X", vp8x)
    if anim:
        body += chunk(b"ANIM", b"\x00\x00\x00\xff\x00\x00")
    for tag, payload in inner_chunks:
        body += chunk(tag, payload)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body


def test_webp_vp8x_and_animation_first_frame():
    """Round 6: extended (VP8X) containers decode through to the still
    VP8L image or the FIRST full-canvas animation frame; sub-rectangle
    first frames and lossy frames reject loudly."""
    px = _rand_rgba(6, 9, seed=50, colors=4)
    plain = encode_webp_lossless(px)
    vp8l_payload = plain[20:20 + struct.unpack_from("<I", plain, 16)[0]]

    def u24(v):
        return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])
    # still image inside VP8X
    still = _vp8x_container([(b"VP8L", vp8l_payload)], 9, 6)
    rec = decode_webp_bytes(still)
    assert np.array_equal(rec["pixels"], px[:, :, :3])
    # wrong canvas → loud
    with pytest.raises(ValueError, match="canvas"):
        decode_webp_bytes(_vp8x_container([(b"VP8L", vp8l_payload)], 10, 6))
    # animated: first frame covers the canvas → decodes
    anmf = (u24(0) + u24(0) + u24(9 - 1) + u24(6 - 1) + u24(40)
            + b"\x00" + b"VP8L" + struct.pack("<I", len(vp8l_payload))
            + vp8l_payload)
    anim = _vp8x_container([(b"ANMF", anmf)], 9, 6, anim=True)
    rec = decode_webp_bytes(anim)
    assert np.array_equal(rec["pixels"], px[:, :, :3])
    assert (rec["width"], rec["height"]) == (9, 6)
    # sub-rectangle first frame → loud rejection, never a wrong fill
    sub = (u24(1) + u24(0) + u24(9 - 1) + u24(6 - 1) + u24(40)
           + b"\x00" + b"VP8L" + struct.pack("<I", len(vp8l_payload))
           + vp8l_payload)
    with pytest.raises(ValueError, match="sub-rectangle"):
        decode_webp_bytes(_vp8x_container([(b"ANMF", sub)], 11, 6,
                                          anim=True))
    # lossy frame inside ANMF → names the codec
    lossy = (u24(0) + u24(0) + u24(8) + u24(5) + u24(40) + b"\x00"
             + b"VP8 " + struct.pack("<I", 4) + b"\x00\x00\x00\x00")
    with pytest.raises(ValueError, match="lossy WebP"):
        decode_webp_bytes(_vp8x_container([(b"ANMF", lossy)], 9, 6,
                                          anim=True))


def test_vp8l_randomized_feature_combinations():
    """Property sweep: random images through random feature
    combinations (cache bits, LZ77, subtract-green, color transform,
    predictor mode maps, palettes) must all round-trip EXACTLY — the
    encoding choices are encoder freedoms the decoder may not
    observe."""
    rng = np.random.RandomState(20260816)
    for trial in range(10):
        h = int(rng.randint(1, 20))
        w = int(rng.randint(1, 20))
        use_palette = rng.randint(3) == 0
        if use_palette:
            px = _rand_rgba(h, w, seed=trial + 90,
                            colors=int(rng.randint(2, 17)))
            blob = encode_webp_lossless(px, palette=True)
        else:
            px = _rand_rgba(h, w, seed=trial + 90,
                            alpha=int(rng.choice([255, 99])),
                            colors=(int(rng.randint(2, 30))
                                    if rng.randint(2) else None))
            kw = {}
            if rng.randint(2):
                kw["cache_bits"] = int(rng.randint(1, 9))
            if rng.randint(2):
                kw["lz77"] = True
            if rng.randint(2):
                kw["subtract_green"] = True
            if rng.randint(3) == 0:
                kw["color_tf"] = (int(rng.randint(256)),
                                  int(rng.randint(256)),
                                  int(rng.randint(256)),
                                  int(rng.randint(2, 6)))
            if rng.randint(3) == 0:
                sb = int(rng.randint(2, 5))
                modes = rng.randint(0, 14, size=64)
                kw["predictor"] = (sb, lambda bx, by, m=modes:
                                   int(m[(bx * 7 + by) % 64]))
            blob = encode_webp_lossless(px, **kw)
        rec = decode_webp_bytes(blob)
        assert np.array_equal(rec["pixels"], px[:, :, :3]), \
            f"trial {trial}: {w}x{h} palette={use_palette}"


def test_vp8l_simple_code_is_canonical_not_stream_order():
    """Review r6: a simple two-symbol prefix code assigns code 0 to the
    SMALLER symbol value (canonical, what libwebp's table builder does)
    even when the stream writes the larger symbol first — stream-order
    mapping silently swapped every pixel decoded through the tree."""
    # hand-emit a 1x2 image whose red tree lists symbols as (200, 3):
    # canonical decode must give red=3 for code 0
    bw = _Bw()
    bw.write(8, 0x2F)
    bw.write(14, 1)                         # w=2
    bw.write(14, 0)                         # h=1
    bw.write(1, 0)
    bw.write(3, 0)
    bw.write(1, 0)                          # no transforms
    bw.write(1, 0)                          # no cache
    bw.write(1, 0)                          # no meta
    cg = _emit_tree(bw, {7: 1}, 256 + 24)   # green: single symbol 7
    # red: simple 2-symbol code written LARGER-FIRST
    bw.write(1, 1)                          # simple
    bw.write(1, 1)                          # two symbols
    bw.write(1, 1)                          # 8-bit first symbol
    bw.write(8, 200)
    bw.write(8, 3)
    cb = _emit_tree(bw, {9: 1}, 256)
    ca = _emit_tree(bw, {255: 1}, 256)
    cd = _emit_tree(bw, {0: 1}, 40)
    del cg, cb, ca, cd                      # all single-node: 0 bits
    bw.write_code(1, 0)                     # pixel 1 red: code 0 -> 3
    bw.write_code(1, 1)                     # pixel 2 red: code 1 -> 200
    bw.flush()
    rec = decode_vp8l_payload(bytes(bw.out))
    assert rec["pixels"][0, 0, 0] == 3 and rec["pixels"][0, 1, 0] == 200


def test_vp8l_code_length_repeat_overrun_rejects():
    """Review r6: a code-length repeat run past the alphabet end must
    reject (libwebp does) — clamping could build a complete-looking
    tree from a malformed stream."""
    bw = _Bw()
    bw.write(8, 0x2F)
    bw.write(14, 0)
    bw.write(14, 0)
    bw.write(1, 0)
    bw.write(3, 0)
    bw.write(1, 0)
    bw.write(1, 0)
    bw.write(1, 0)
    bw.write(1, 0)                          # green: full form
    bw.write(4, 1)                          # 5 code-length codes
    for ln in (1, 1, 0, 0, 0):              # order 17,18: both length 1
        bw.write(3, ln)
    bw.write(1, 0)                          # no explicit max_symbol
    # '1' = 18: zero-run of 11 + 127 = 138... repeated until overrun:
    # alphabet is 280; three max runs = 414 > 280 -> must reject
    for _ in range(3):
        bw.write_code(1, 1)
        bw.write(7, 127)
    with pytest.raises(ValueError, match="overruns the alphabet"):
        decode_vp8l_payload(bytes(bw.out) + b"\x00" * 4)


def test_webp_anmf_without_vp8x_rejects():
    """Review r6: animation frames without a VP8X canvas cannot be
    validated as full-canvas — reject, never frame-only stats."""
    px = _rand_rgba(4, 5, seed=70)
    plain = encode_webp_lossless(px)
    vp8l_payload = plain[20:20 + struct.unpack_from("<I", plain, 16)[0]]

    def u24(v):
        return bytes([v & 0xFF, (v >> 8) & 0xFF, (v >> 16) & 0xFF])
    anmf = (u24(0) + u24(0) + u24(4) + u24(3) + u24(40) + b"\x00"
            + b"VP8L" + struct.pack("<I", len(vp8l_payload))
            + vp8l_payload)
    body = b"ANMF" + struct.pack("<I", len(anmf)) + anmf \
        + (b"\x00" if len(anmf) % 2 else b"")
    blob = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    with pytest.raises(ValueError, match="without a VP8X"):
        decode_webp_bytes(blob)
