"""VP8L (lossless WebP) decoder proofs (operators/vp8l.py).

Evidence channels, mirroring the baseline/progressive JPEG strategy:

1. STRUCTURE VALIDATION of the 120-entry plane-code table: it must be
   exactly a permutation of the legal near-neighbor offsets
   {dy in 1..7, dx in -7..8} ∪ {dy=0, dx in 1..8}, and its verified
   head (the first 22 entries, listed explicitly in the public spec's
   mapping discussion) is pinned literally.
2. A HAND-ASSEMBLED spec fixture — bits packed by hand (an independent
   packer, not the test encoder) straight from the spec's rules — pins
   the LSB-first bit order, header layout, simple-code form and
   ARGB channel order.
3. A mirrored test ENCODER whose output must decode back EXACTLY
   (VP8L is lossless): literals, LZ77 backrefs (plain distances AND
   the verified head of the plane-code map), color cache, meta prefix
   groups, and all four transforms. The encoder computes predictions
   and transforms with its own independent scalar arithmetic — never
   the decoder's helpers — so a shared misunderstanding cannot cancel
   out.

No codec library exists in this container (PIL/cv2 absent), so the
encoder is the only way to synthesize multi-path streams.
"""

from __future__ import annotations

import struct
from collections import Counter

import numpy as np
import pytest

from proteofav_spark.operators.vp8l import (
    _CODE_TO_PLANE,
    decode_vp8l_stream,
    decode_webp,
)

# ---------------------------------------------------------------------------
# mirrored test encoder (stdlib + numpy only)
# ---------------------------------------------------------------------------


class _BW:
    """LSB-first bit writer — the exact mirror of the decoder's reader."""

    def __init__(self):
        self.buf = bytearray()
        self.bitpos = 0

    def put(self, v: int, n: int) -> None:
        for i in range(n):
            if self.bitpos % 8 == 0:
                self.buf.append(0)
            if (v >> i) & 1:
                self.buf[-1] |= 1 << (self.bitpos % 8)
            self.bitpos += 1

    def put_code(self, code: int, n: int) -> None:
        """Prefix-code bits go MSB-first (walking the tree root-down)."""
        for i in range(n - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        return bytes(self.buf)


def _huff_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Plain Huffman code lengths from frequencies (heapq)."""
    import heapq

    if not freqs:
        return {}
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, s, (s,)) for s, f in freqs.items()]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in freqs}
    while len(heap) > 1:
        f1, t1, m1 = heapq.heappop(heap)
        f2, t2, m2 = heapq.heappop(heap)
        for s in m1 + m2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, min(t1, t2), m1 + m2))
    assert max(depth.values()) <= 15, "fixture alphabet too skewed"
    return depth


def _canonical(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """Symbol -> (code, len) under the canonical rule the decoder uses."""
    if not lengths:
        return {}
    max_len = max(lengths.values())
    bl = [0] * (max_len + 1)
    for l in lengths.values():
        bl[l] += 1
    next_code = [0] * (max_len + 1)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + bl[l - 1]) << 1
        next_code[l] = code
    out = {}
    for s in sorted(lengths, key=lambda s: (lengths[s], s)):
        out[s] = (next_code[lengths[s]], lengths[s])
        next_code[lengths[s]] += 1
    return out


_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _write_code(bw: _BW, used: dict[int, int], alphabet: int,
                prefer_simple: bool = True):
    """Write one prefix code for the given symbol frequencies; returns
    symbol -> (code, len) for emitting the stream afterwards."""
    syms = sorted(used)
    if not syms:
        syms, used = [0], {0: 1}  # unused code: any valid placeholder
    if prefer_simple and len(syms) <= 2 and all(s <= 255 for s in syms):
        bw.put(1, 1)
        bw.put(len(syms) - 1, 1)
        first_8bit = 0 if syms[0] <= 1 else 1
        bw.put(first_8bit, 1)
        bw.put(syms[0], 8 if first_8bit else 1)
        if len(syms) == 1:
            return {syms[0]: (0, 0)}
        bw.put(syms[1], 8)
        return {syms[0]: (0, 1), syms[1]: (1, 1)}
    # normal form
    lengths = _huff_lengths({s: used[s] for s in syms})
    if len(lengths) == 1:
        # pad to a complete 1-bit code with a dummy second symbol
        only = next(iter(lengths))
        dummy = 0 if only != 0 else 1
        lengths = {only: 1, dummy: 1}
    arr = [lengths.get(s, 0) for s in range(alphabet)]
    # tokenize with 16 (repeat prev non-zero) / 17 / 18 (zero runs)
    tokens: list[tuple[int, int, int]] = []
    i = 0
    while i < alphabet:
        if arr[i] == 0:
            run = 0
            while i + run < alphabet and arr[i + run] == 0:
                run += 1
            i += run
            while run:
                if run >= 11:
                    r = min(run, 138)
                    tokens.append((18, 7, r - 11))
                elif run >= 3:
                    r = min(run, 10)
                    tokens.append((17, 3, r - 3))
                else:
                    r = 1
                    tokens.append((0, 0, 0))
                run -= r
        else:
            l = arr[i]
            tokens.append((l, 0, 0))
            i += 1
            run = 0
            while i + run < alphabet and arr[i + run] == l:
                run += 1
            i += run
            while run >= 3:
                r = min(run, 6)
                tokens.append((16, 2, r - 3))
                run -= r
            for _ in range(run):
                tokens.append((l, 0, 0))
    cl_freq = Counter(t[0] for t in tokens)
    cl_lengths = _huff_lengths(dict(cl_freq))
    if len(cl_lengths) == 1:
        only = next(iter(cl_lengths))
        dummy = 0 if only != 0 else 1
        cl_lengths = {only: 1, dummy: 1}
    assert max(cl_lengths.values()) <= 7
    cl_codes = _canonical(cl_lengths)
    num_cl = max(
        idx + 1 for idx, s in enumerate(_CL_ORDER) if s in cl_lengths
    )
    num_cl = max(num_cl, 4)
    bw.put(0, 1)  # not simple
    bw.put(num_cl - 4, 4)
    for idx in range(num_cl):
        bw.put(cl_lengths.get(_CL_ORDER[idx], 0), 3)
    bw.put(0, 1)  # no max_symbol short-circuit
    for sym, nbits, extra in tokens:
        c, l = cl_codes[sym]
        bw.put_code(c, l)
        if nbits:
            bw.put(extra, nbits)
    return _canonical(lengths)


def _lz77_prefix(v: int) -> tuple[int, int, int]:
    """(prefix_code, extra_bits, extra_val) for a length/distance value."""
    if v <= 4:
        return v - 1, 0, 0
    for prefix in range(4, 40):
        extra_bits = (prefix - 2) >> 1
        offset = (2 + (prefix & 1)) << extra_bits
        if offset + 1 <= v <= offset + (1 << extra_bits):
            return prefix, extra_bits, v - offset - 1
    raise AssertionError(f"value {v} out of prefix range")


def _cache_slot(argb: int, cache_bits: int) -> int:
    return ((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)


def _encode_stream(
    bw: _BW,
    pix: list[int],
    w: int,
    h: int,
    *,
    allow_meta: bool,
    cache_bits: int = 0,
    rle: str | None = None,
    meta_bits: int = 0,
    prefer_simple: bool = True,
) -> None:
    """Encode one entropy-coded image stream. ``rle``: None (all
    literals), "plain" (runs as distance 121 = plain distance 1) or
    "plane" (runs as plane code 2 = (dx 1, dy 0), the verified head of
    the map). ``meta_bits``: >0 splits pixels into 2 alternating prefix
    groups on the (x>>mb, y>>mb) grid and writes a meta prefix image."""
    bw.put(1 if cache_bits else 0, 1)
    if cache_bits:
        bw.put(cache_bits, 4)

    n_groups = 1
    mw = 0
    group_of_cell: list[int] = []
    if allow_meta:
        if meta_bits:
            bw.put(1, 1)
            bw.put(meta_bits - 2, 3)
            mw = (w + (1 << meta_bits) - 1) >> meta_bits
            mh = (h + (1 << meta_bits) - 1) >> meta_bits
            group_of_cell = [
                ((cx + cy) % 2) for cy in range(mh) for cx in range(mw)
            ]
            # the decoder derives the group count from the entropy
            # image's max index — a 1-cell grid has only group 0
            n_groups = max(group_of_cell) + 1
            _encode_stream(
                bw,
                [g << 8 for g in group_of_cell],
                mw,
                mh,
                allow_meta=False,
                prefer_simple=prefer_simple,
            )
        else:
            bw.put(0, 1)

    def group_at(pos: int) -> int:
        if n_groups == 1:
            return 0
        x, y = pos % w, pos // w
        return group_of_cell[(y >> meta_bits) * mw + (x >> meta_bits)]

    # tokenize pixels -> per-group symbol streams
    cache = [0] * (1 << cache_bits) if cache_bits else None
    tokens: list[tuple] = []  # ("lit",grp,g,r,b,a) ("ref",grp,len,dcode) ("hit",grp,idx)
    pos = 0
    n = len(pix)
    while pos < n:
        grp = group_at(pos)
        if rle and pos > 0 and pix[pos] == pix[pos - 1]:
            run = 1
            while pos + run < n and pix[pos + run] == pix[pos - 1]:
                run += 1
            dcode = 121 if rle == "plain" else 2  # plane code 2 = (1,0)
            tokens.append(("ref", grp, run, dcode))
            if cache is not None:
                for k in range(run):
                    cache[_cache_slot(pix[pos + k], cache_bits)] = pix[pos + k]
            pos += run
            continue
        p = pix[pos]
        if cache is not None:
            slot = _cache_slot(p, cache_bits)
            if cache[slot] == p and pos > 0:
                tokens.append(("hit", grp, slot))
                pos += 1
                continue
            cache[slot] = p
        tokens.append(
            ("lit", grp, (p >> 8) & 0xFF, (p >> 16) & 0xFF, p & 0xFF,
             (p >> 24) & 0xFF)
        )
        pos += 1

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    for grp in range(n_groups):
        gf: Counter = Counter()
        rf: Counter = Counter()
        bf: Counter = Counter()
        af: Counter = Counter()
        df: Counter = Counter()
        for t in tokens:
            if t[1] != grp:
                continue
            if t[0] == "lit":
                gf[t[2]] += 1
                rf[t[3]] += 1
                bf[t[4]] += 1
                af[t[5]] += 1
            elif t[0] == "ref":
                gf[256 + _lz77_prefix(t[2])[0]] += 1
                df[_lz77_prefix(t[3])[0]] += 1
            else:
                gf[280 + t[2]] += 1
        codes = (
            _write_code(bw, dict(gf), green_alpha, prefer_simple),
            _write_code(bw, dict(rf), 256, prefer_simple),
            _write_code(bw, dict(bf), 256, prefer_simple),
            _write_code(bw, dict(af), 256, prefer_simple),
            _write_code(bw, dict(df), 40, prefer_simple),
        )
        if grp == 0:
            all_codes = [codes]
        else:
            all_codes.append(codes)

    for t in tokens:
        g_c, r_c, b_c, a_c, d_c = all_codes[t[1]]
        if t[0] == "lit":
            bw.put_code(*g_c[t[2]])
            bw.put_code(*r_c[t[3]])
            bw.put_code(*b_c[t[4]])
            bw.put_code(*a_c[t[5]])
        elif t[0] == "ref":
            lp, lbits, lextra = _lz77_prefix(t[2])
            bw.put_code(*g_c[256 + lp])
            if lbits:
                bw.put(lextra, lbits)
            dp, dbits, dextra = _lz77_prefix(t[3])
            bw.put_code(*d_c[dp])
            if dbits:
                bw.put(dextra, dbits)
        else:
            bw.put_code(*g_c[280 + t[2]])


# --- independent (encoder-side) transform arithmetic: spec formulas in
# plain scalar Python, NOT the decoder's packed-int helpers ------------


def _ch(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pk(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _enc_avg2(p1: int, p2: int) -> int:
    return _pk(*[(x + y) // 2 for x, y in zip(_ch(p1), _ch(p2))])


def _enc_predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:
    if mode == 0:
        return 0xFF000000
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _enc_avg2(_enc_avg2(l, tr), t)
    if mode == 6:
        return _enc_avg2(l, tl)
    if mode == 7:
        return _enc_avg2(l, t)
    if mode == 8:
        return _enc_avg2(tl, t)
    if mode == 9:
        return _enc_avg2(t, tr)
    if mode == 10:
        return _enc_avg2(_enc_avg2(l, tl), _enc_avg2(t, tr))
    if mode == 11:
        pl = sum(
            abs(cl + ct - ctl - cl)
            for cl, ct, ctl in zip(_ch(l), _ch(t), _ch(tl))
        )
        pt = sum(
            abs(cl + ct - ctl - ct)
            for cl, ct, ctl in zip(_ch(l), _ch(t), _ch(tl))
        )
        return l if pl < pt else t
    if mode == 12:
        return _pk(*[
            min(255, max(0, cl + ct - ctl))
            for cl, ct, ctl in zip(_ch(l), _ch(t), _ch(tl))
        ])
    if mode == 13:
        av = _enc_avg2(l, t)
        out = []
        for ca, ctl in zip(_ch(av), _ch(tl)):
            d = ca - ctl
            half = d // 2 if d >= 0 else -((-d) // 2)  # C truncation
            out.append(min(255, max(0, ca + half)))
        return _pk(*out)
    raise AssertionError(mode)


def _residual(cur: int, pred: int) -> int:
    return _pk(*[(c - p) & 0xFF for c, p in zip(_ch(cur), _ch(pred))])


def encode_vp8l(
    img: np.ndarray,
    *,
    subtract_green: bool = False,
    predictor_mode: int | None = None,
    predictor_bits: int = 2,
    color_transform_zero: bool = False,
    color_transform_elem: tuple[int, int, int] | None = None,
    palette: bool = False,
    cache_bits: int = 0,
    rle: str | None = None,
    meta_bits: int = 0,
    prefer_simple: bool = True,
) -> bytes:
    """img: (h, w, 4) RGBA uint8 -> raw VP8L payload bytes."""
    h, w = img.shape[:2]
    pix = [
        _pk(int(p[3]), int(p[0]), int(p[1]), int(p[2]))
        for row in img
        for p in row
    ]
    bw = _BW()
    bw.put(0x2F, 8)
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(1, 1)  # alpha hint
    bw.put(0, 3)  # version

    cur_w = w
    if predictor_mode is not None:
        bw.put(1, 1)
        bw.put(0, 2)
        bw.put(predictor_bits - 2, 3)
        bs = 1 << predictor_bits
        sw = (w + bs - 1) >> predictor_bits
        sh = (h + bs - 1) >> predictor_bits
        sub = [predictor_mode << 8] * (sw * sh)
        res = [0] * (w * h)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = 0xFF000000
                elif y == 0:
                    pred = pix[i - 1]
                elif x == 0:
                    pred = pix[i - w]
                else:
                    pred = _enc_predict(
                        predictor_mode,
                        pix[i - 1],
                        pix[i - w],
                        pix[i - w - 1],
                        pix[i - w + 1],  # row-major: wraps per spec
                    )
                res[i] = _residual(pix[i], pred)
        pix = res
        _encode_stream(bw, sub, sw, sh, allow_meta=False,
                       prefer_simple=prefer_simple)
    if color_transform_zero:
        color_transform_elem = (0, 0, 0)
    if color_transform_elem is not None:
        g2r, g2b, r2b = color_transform_elem
        bw.put(1, 1)
        bw.put(1, 2)
        bw.put(0, 3)  # bits-2 = 0 -> block size 4
        sw = (w + 3) >> 2
        sh = (h + 3) >> 2
        elem = (r2b << 16) | (g2b << 8) | g2r
        _encode_stream(bw, [elem] * (sw * sh), sw, sh, allow_meta=False,
                       prefer_simple=prefer_simple)

        def delta(t: int, c: int) -> int:  # independent spec arithmetic
            ts = t - 256 if t >= 128 else t
            cs = c - 256 if c >= 128 else c
            return (ts * cs) >> 5  # python >> is arithmetic, like C int

        fwd = []
        for a, r, g, b in map(_ch, pix):
            r2 = (r - delta(g2r, g)) & 0xFF
            b2 = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
            fwd.append(_pk(a, r2, g, b2))
        pix = fwd
    if subtract_green:
        bw.put(1, 1)
        bw.put(2, 2)
        pix = [
            _pk(a, (r - g) & 0xFF, g, (b - g) & 0xFF)
            for a, r, g, b in map(_ch, pix)
        ]
    if palette:
        colors: list[int] = []
        index_of: dict[int, int] = {}
        for p in pix:
            if p not in index_of:
                index_of[p] = len(colors)
                colors.append(p)
        n_colors = len(colors)
        assert n_colors <= 256
        bw.put(1, 1)
        bw.put(3, 2)
        bw.put(n_colors - 1, 8)
        deltas = [
            colors[0] if i == 0 else _residual(colors[i], colors[i - 1])
            for i in range(n_colors)
        ]
        _encode_stream(bw, deltas, n_colors, 1, allow_meta=False,
                       prefer_simple=prefer_simple)
        if n_colors <= 2:
            width_bits = 3
        elif n_colors <= 4:
            width_bits = 2
        elif n_colors <= 16:
            width_bits = 1
        else:
            width_bits = 0
        if width_bits:
            per = 1 << width_bits
            ibits = 8 >> width_bits
            packed_w = (w + per - 1) >> width_bits
            packed = [0] * (packed_w * h)
            for y in range(h):
                for x in range(w):
                    idx = index_of[pix[y * w + x]]
                    packed[y * packed_w + (x >> width_bits)] |= (
                        idx << ((x % per) * ibits)
                    ) << 8
            pix = packed
            cur_w = packed_w
        else:
            pix = [index_of[p] << 8 for p in pix]
    bw.put(0, 1)  # end of transforms

    _encode_stream(
        bw, pix, cur_w, h, allow_meta=True, cache_bits=cache_bits,
        rle=rle, meta_bits=meta_bits, prefer_simple=prefer_simple,
    )
    return bw.bytes()


def wrap_webp(payload: bytes) -> bytes:
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk


def _rt(img: np.ndarray, **kw) -> None:
    """Encode with the mirror encoder, decode, assert EXACT equality."""
    out = decode_vp8l_stream(encode_vp8l(img, **kw))
    assert out is not None, f"decode failed for {kw}"
    np.testing.assert_array_equal(out, img, err_msg=str(kw))


def _rand_rgba(h: int, w: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (h, w, 4), dtype=np.uint8)


# ---------------------------------------------------------------------------
# 1. plane-code table structure
# ---------------------------------------------------------------------------


def test_plane_code_table_structure():
    assert len(_CODE_TO_PLANE) == 120
    offsets = set()
    for b in _CODE_TO_PLANE:
        dy = b >> 4
        dx = 8 - (b & 0xF)
        offsets.add((dx, dy))
    legal = {(dx, dy) for dy in range(1, 8) for dx in range(-7, 9)}
    legal |= {(dx, 0) for dx in range(1, 9)}
    assert offsets == legal  # exact permutation, no dup/missing entries


def test_plane_code_table_verified_head():
    # the first 22 map entries as listed in the public spec
    head = [(0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2),
            (-1, 2), (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0),
            (1, 3), (-1, 3), (3, 1), (-3, 1), (2, 3), (-2, 3), (3, 2),
            (-3, 2)]
    got = [(8 - (b & 0xF), b >> 4) for b in _CODE_TO_PLANE[:22]]
    assert got == head


# ---------------------------------------------------------------------------
# 2. hand-assembled spec fixture (independent bit packing)
# ---------------------------------------------------------------------------


def test_hand_assembled_two_pixel_stream():
    """2x1 image, all five codes in the 'simple' form, bits packed by
    hand (each line is one field from the spec, LSB-first):

    pixel 0: a=255 r=1 g=2 b=3; pixel 1: a=255 r=4 g=5 b=6.
    green code: simple, 2 symbols {2, 5}; r: {1, 4}; b: {3, 6};
    a: 1 symbol {255}; dist: 1 symbol {0}.
    """
    bits: list[tuple[int, int]] = []

    def put(v, n):
        bits.append((v, n))

    put(0x2F, 8)          # signature
    put(1, 14)            # width-1
    put(0, 14)            # height-1
    put(1, 1)             # alpha hint
    put(0, 3)             # version
    put(0, 1)             # no transforms
    put(0, 1)             # no color cache
    put(0, 1)             # no meta prefix
    for s0, s1 in ((2, 5), (1, 4), (3, 6), (255, None), (0, None)):
        put(1, 1)                      # simple code
        put(0 if s1 is None else 1, 1)  # num symbols - 1
        if s0 <= 1:
            put(0, 1)                  # first symbol in 1 bit
            put(s0, 1)
        else:
            put(1, 1)                  # first symbol in 8 bits
            put(s0, 8)
        if s1 is not None:
            put(s1, 8)
    # pixel stream: G,R,B,A per literal; 2-symbol codes read 1 bit,
    # 1-symbol codes read 0 bits
    put(0, 1)  # green: symbol index 0 -> 2
    put(0, 1)  # red  -> 1
    put(0, 1)  # blue -> 3
    #          alpha: 0 bits -> 255
    put(1, 1)  # green -> 5
    put(1, 1)  # red -> 4
    put(1, 1)  # blue -> 6

    buf = bytearray()
    pos = 0
    for v, n in bits:
        for i in range(n):
            if pos % 8 == 0:
                buf.append(0)
            if (v >> i) & 1:
                buf[-1] |= 1 << (pos % 8)
            pos += 1
    out = decode_vp8l_stream(bytes(buf))
    assert out is not None
    expect = np.array([[[1, 2, 3, 255], [4, 5, 6, 255]]], dtype=np.uint8)
    np.testing.assert_array_equal(out, expect)


# ---------------------------------------------------------------------------
# 3. exact round-trips through every decode path
# ---------------------------------------------------------------------------


def test_roundtrip_random_literals():
    _rt(_rand_rgba(7, 13, seed=3))            # normal codes
    _rt(_rand_rgba(1, 1, seed=4))             # single pixel
    _rt(_rand_rgba(5, 1, seed=5))             # single column
    _rt(_rand_rgba(3, 9, seed=6), prefer_simple=False)


def test_roundtrip_subtract_green():
    _rt(_rand_rgba(9, 8, seed=7), subtract_green=True)


@pytest.mark.parametrize("mode", list(range(14)))
def test_roundtrip_every_predictor_mode(mode):
    """All-blocks-mode-m images: the encoder predicts with independent
    scalar spec arithmetic, so exact equality proves the decoder's
    packed-int predictor (incl. the averaging carry trick, Select's
    tie rule and the C-truncation half-step) for every mode."""
    img = _rand_rgba(11, 10, seed=100 + mode)
    _rt(img, predictor_mode=mode, predictor_bits=2)


def test_roundtrip_predictor_with_subtract_green():
    _rt(_rand_rgba(8, 8, seed=31), predictor_mode=7, subtract_green=True)


def test_roundtrip_zero_color_transform():
    _rt(_rand_rgba(6, 11, seed=12), color_transform_zero=True)


def test_roundtrip_nonzero_color_transform():
    """Non-trivial cross-color multipliers (incl. negative int8 values)
    exercise the signed ColorTransformDelta multiply and the recovered-
    red dependency in the blue channel; the encoder applies the FORWARD
    transform with independent scalar arithmetic."""
    img = _rand_rgba(9, 9, seed=13)
    _rt(img, color_transform_elem=(0x12, 0xF3, 0x5A))
    _rt(img, color_transform_elem=(0xFF, 0x80, 0x01))
    _rt(img, color_transform_elem=(0x33, 0x44, 0x99),
        subtract_green=True)


@pytest.mark.parametrize("n_colors,w", [(2, 17), (4, 9), (13, 10), (40, 7)])
def test_roundtrip_palette_bundling(n_colors, w):
    """Color-indexing transform with every bundling width (8/4/2/1
    indices per byte), widths deliberately not multiples of the pack."""
    rng = np.random.default_rng(n_colors)
    colors = rng.integers(0, 256, (n_colors, 4), dtype=np.uint8)
    idx = rng.integers(0, n_colors, (6, w))
    img = colors[idx]
    # ensure every color appears so the palette is exactly n_colors
    img[0, :min(n_colors, w)] = colors[:min(n_colors, w)]
    _rt(img, palette=True)


def test_roundtrip_rle_backrefs_plain_and_plane():
    rng = np.random.default_rng(17)
    img = np.repeat(
        rng.integers(0, 256, (5, 6, 4), dtype=np.uint8), 3, axis=1
    )  # horizontal runs of 3
    _rt(img, rle="plain")
    _rt(img, rle="plane")  # distance via verified plane code 2 = (1,0)


def test_roundtrip_color_cache():
    rng = np.random.default_rng(23)
    colors = rng.integers(0, 256, (4, 4), dtype=np.uint8)
    img = colors[rng.integers(0, 4, (9, 9))]
    _rt(img, cache_bits=4)
    _rt(img, cache_bits=1)   # minimum cache
    _rt(img, cache_bits=6, rle="plain")  # cache updated through copies


def test_roundtrip_meta_prefix_groups():
    _rt(_rand_rgba(12, 16, seed=29), meta_bits=2)
    _rt(_rand_rgba(6, 6, seed=30), meta_bits=3)  # single-cell rows


def test_roundtrip_stacked_transforms():
    img = np.repeat(_rand_rgba(8, 4, seed=41), 2, axis=1)
    _rt(img, subtract_green=True, rle="plain", cache_bits=3)


# ---------------------------------------------------------------------------
# 4. container + degradation
# ---------------------------------------------------------------------------


def test_webp_container_roundtrip():
    img = _rand_rgba(4, 5, seed=51)
    flat = decode_webp(wrap_webp(encode_vp8l(img)))
    assert flat is not None
    np.testing.assert_array_equal(flat.reshape(4, 5, 4), img)


def test_webp_container_skips_leading_chunks():
    img = _rand_rgba(3, 3, seed=52)
    payload = encode_vp8l(img)
    vp8x = b"VP8X" + struct.pack("<I", 10) + b"\x00" * 10
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        chunk += b"\x00"
    blob = b"RIFF" + struct.pack(
        "<I", 4 + len(vp8x) + len(chunk)
    ) + b"WEBP" + vp8x + chunk
    flat = decode_webp(blob)
    assert flat is not None
    np.testing.assert_array_equal(flat.reshape(3, 3, 4), img)


def test_malformed_degrades_to_none():
    img = _rand_rgba(4, 4, seed=53)
    payload = encode_vp8l(img)
    assert decode_vp8l_stream(payload[: len(payload) // 2]) is None  # truncated
    assert decode_vp8l_stream(b"") is None
    assert decode_vp8l_stream(b"\x00" + payload[1:]) is None  # bad signature
    assert decode_webp(b"RIFF\x00\x00\x00\x00WAVE") is None
    # lossy VP8 chunk: honest None (codec seam)
    lossy = b"RIFF" + struct.pack("<I", 12) + b"WEBP" + b"VP8 " + struct.pack("<I", 0)
    assert decode_webp(lossy) is None


def test_stub_dispatch_decodes_webp():
    from proteofav_spark.operators.multimodal import _decode_image_stub

    img = _rand_rgba(5, 4, seed=54)
    flat = _decode_image_stub(wrap_webp(encode_vp8l(img)), 4, 5)
    np.testing.assert_array_equal(flat.reshape(5, 4, 4), img)


# ---------------------------------------------------------------------------
# 5. adversarial robustness
# ---------------------------------------------------------------------------


def test_claimed_giant_dimensions_degrade_to_none():
    """A tiny stream claiming 16383x16383 must return None fast instead
    of allocating a 268M-entry pixel list before the bits run out."""
    bw = _BW()
    bw.put(0x2F, 8)
    bw.put(16382, 14)
    bw.put(16382, 14)
    bw.put(1, 1)
    bw.put(0, 3)
    bw.put(0, 1)  # no transforms
    assert decode_vp8l_stream(bw.bytes()) is None


def test_fuzz_mutations_never_raise():
    """Single-byte mutations of a valid stream (and random garbage) must
    always return None or a valid array — never raise out of the
    decoder (the batch contract: malformed payloads degrade, decode
    never fails the Arrow batch)."""
    rng = np.random.default_rng(99)
    payload = bytearray(
        encode_vp8l(_rand_rgba(6, 7, seed=61), cache_bits=3, rle="plain")
    )
    for _ in range(400):
        mutated = bytearray(payload)
        i = rng.integers(0, len(mutated))
        mutated[i] ^= 1 << rng.integers(0, 8)
        out = decode_vp8l_stream(bytes(mutated))
        assert out is None or (
            isinstance(out, np.ndarray) and out.dtype == np.uint8
        )
    for n in (0, 1, 5, 64, 300):
        blob = bytes(rng.integers(0, 256, n, dtype=np.uint8))
        out = decode_vp8l_stream(blob)
        assert out is None or (
            isinstance(out, np.ndarray) and out.dtype == np.uint8
        )
        out2 = decode_webp(blob)  # must not raise either
        assert out2 is None or (
            isinstance(out2, np.ndarray) and out2.dtype == np.uint8
        )


def test_hand_assembled_max_symbol_short_circuit():
    """Normal code using the use-length bit (spec: length_nbits =
    2 + 2*ReadBits(3); max_symbol = 2 + ReadBits(length_nbits)): only
    the first max_symbol code-length entries are read, the rest of the
    alphabet is implicitly zero. The test encoder never emits this
    form, so it is pinned by hand like the simple-code fixture.

    1x1 image; green code: lengths for symbols 0,1 only (both 1 bit)
    via max_symbol=2, so green symbol 0 decodes from 1 bit; r/b/a/d
    are 1-symbol simple codes."""
    bw = _BW()
    bw.put(0x2F, 8)
    bw.put(0, 14)   # w-1
    bw.put(0, 14)   # h-1
    bw.put(1, 1)
    bw.put(0, 3)
    bw.put(0, 1)    # no transforms
    bw.put(0, 1)    # no cache
    bw.put(0, 1)    # no meta
    # --- green: NORMAL code with max_symbol short-circuit
    bw.put(0, 1)    # not simple
    bw.put(0, 4)    # num_code_lengths = 4: order 17,18,0,1 -> cl code
    bw.put(0, 3)    # len(17) = 0
    bw.put(0, 3)    # len(18) = 0
    bw.put(1, 3)    # len(0)  = 1
    bw.put(1, 3)    # len(1)  = 1   (cl huffman: 0 -> bit 0, 1 -> bit 1)
    bw.put(1, 1)    # USE the max-symbol short-circuit
    bw.put(0, 3)    # length_nbits = 2 + 2*0 = 2
    bw.put(0, 2)    # max_symbol = 2 + 0 = 2
    bw.put(1, 1)    # cl symbol 1 -> code length 1 for green symbol 0
    bw.put(1, 1)    # cl symbol 1 -> code length 1 for green symbol 1
    # (remaining 278 green symbols implicitly zero — nothing read)
    # --- r, b, a, d: simple 1-symbol codes (0-bit reads)
    for sym, wide in ((7, 1), (9, 1), (255, 1), (0, 0)):
        bw.put(1, 1)            # simple
        bw.put(0, 1)            # 1 symbol
        bw.put(wide, 1)         # symbol width
        bw.put(sym, 8 if wide else 1)
    # --- pixel: green symbol 0 = 1 bit (code 0); r/b/a read 0 bits
    bw.put(0, 1)
    out = decode_vp8l_stream(bw.bytes())
    assert out is not None
    np.testing.assert_array_equal(
        out, np.array([[[7, 0, 9, 255]]], dtype=np.uint8)
    )


def test_roundtrip_meta_groups_with_color_cache():
    """Meta prefix groups and a color cache together: the cache is
    SHARED across groups (it keys on emitted pixels, not on the group),
    while each group has its own five prefix codes."""
    rng = np.random.default_rng(71)
    colors = rng.integers(0, 256, (6, 4), dtype=np.uint8)
    img = colors[rng.integers(0, 6, (12, 12))]
    _rt(img, meta_bits=2, cache_bits=5)


def test_webp_default_path_through_image_features(spark):
    """A real lossless-WebP payload flows through image_features with NO
    injected decode_fn and the features match the driver-side numpy
    reference on the true RGBA pixels — WebP(VP8L) is a DEFAULT decoded
    format now, like PNG/GIF/JPEG."""
    from pyspark.sql import types as T

    from proteofav_spark.operators.multimodal import (
        IMAGE_META_SCHEMA,
        image_features,
    )

    img = _rand_rgba(9, 7, seed=81)
    blob = wrap_webp(encode_vp8l(img, cache_bits=3))
    ischema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("payload", T.BinaryType()),
            T.StructField("meta", IMAGE_META_SCHEMA),
        ]
    )
    idf = spark.createDataFrame(
        [(1, blob, (7, 9, 4, "image/webp"))], ischema
    )
    row = image_features(idf).collect()[0]
    pix = img.reshape(-1)
    assert row["mean_pixel"] == round(float(pix.mean()), 6)
    assert row["histogram8"] == np.bincount(pix >> 5, minlength=8).tolist()
    assert row["n_bytes"] == len(blob)
