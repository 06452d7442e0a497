"""Lossless WebP (VP8L) decoder — stdlib + numpy only, no codec library.

Implements the public WebP Lossless Bitstream Specification (RFC 9649 /
Google's "WebP Lossless Bitstream Specification", both public): the
RIFF/``VP8L`` container (including ``VP8X`` extended files that carry a
lossless payload), the LSB-first bit reader, canonical prefix codes
(both the 1/2-symbol "simple" form and the "normal" form with
code-length codes, 16/17/18 repeat extensions and the max_symbol
short-circuit), the optional color cache, meta prefix (entropy) images,
LZ77 backward references with the 120-entry 2D-locality plane-code map,
and all four transforms inverted in reverse reading order: predictor
(14 spatial modes with the black/L/T edge rules), cross-color,
subtract-green, and color-indexing (including sub-byte index bundling
for palettes of ≤16 colors).

This closes the decoder ledger's last stdlib-reachable format (VERDICT
r6 item #3): VP8L is pure prefix coding + LZ77-over-pixels + reversible
integer transforms — no DCT, no codec math the container lacks. Lossy
VP8, MP4/WebM and MP3 genuinely require codec libraries and stay behind
the injectable ``decode_fn`` seam (operators/multimodal.py).

Like the PNG/GIF/JPEG decoders (SURVEY §2 multimodal family; the
reference ships no image codecs — proteofav/structures.py parses
text formats only), a malformed payload returns None and degrades to
the deterministic stub, never failing the Arrow batch.

Correctness strategy (tests/test_vp8l_decode.py): a mirrored test
encoder (exact lossless round-trips — any bit-convention mismatch
between the two sides produces garbage, not near-identity) plus a
HAND-ASSEMBLED spec fixture whose bits are packed directly from the
spec's worked rules, so encoder and decoder cannot share a structural
misunderstanding and still pass. The plane-code table is additionally
structure-validated: it must be exactly a permutation of the 120 legal
(dx, dy) near-neighbor offsets.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# bit reader: LSB-first within each byte (VP8L convention, unlike JPEG)
# ---------------------------------------------------------------------------


class _Bits:
    __slots__ = ("d", "pos", "nbits")

    def __init__(self, data: bytes):
        self.d = data
        self.pos = 0
        self.nbits = 8 * len(data)

    def read(self, n: int) -> int:
        if self.pos + n > self.nbits:
            raise ValueError("vp8l: bitstream overrun")
        v = 0
        d, p = self.d, self.pos
        for i in range(n):
            v |= ((d[p >> 3] >> (p & 7)) & 1) << i
            p += 1
        self.pos = p
        return v


# ---------------------------------------------------------------------------
# prefix (Huffman) codes
# ---------------------------------------------------------------------------

# code-length symbols are stored in this fixed order (spec §5.2.2)
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)


def _build_canonical(lengths: list[int]):
    """Canonical prefix decoder from per-symbol code lengths (DEFLATE
    rule: shorter codes first, ties in symbol order). Returns
    ("zero", sym) for the spec's explicit single-symbol case (decodes
    reading 0 bits), else ("map", {(len, code): sym}, max_len). None on
    an incomplete or oversubscribed code."""
    nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
    if not nz:
        return None
    if len(nz) == 1:
        return ("zero", nz[0][1])
    max_len = max(l for l, _ in nz)
    if max_len > 15:
        return None
    bl_count = [0] * (max_len + 1)
    for l, _ in nz:
        bl_count[l] += 1
    kraft = sum(bl_count[l] << (max_len - l) for l in range(1, max_len + 1))
    if kraft != 1 << max_len:
        return None
    next_code = [0] * (max_len + 1)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    table: dict[tuple[int, int], int] = {}
    for s, l in sorted((s, l) for l, s in nz):
        table[(l, next_code[l])] = s
        next_code[l] += 1
    return ("map", table, max_len)


def _read_symbol(br: _Bits, tree) -> int:
    if tree[0] == "zero":
        return tree[1]
    _, table, max_len = tree
    code = 0
    for l in range(1, max_len + 1):
        code = (code << 1) | br.read(1)
        s = table.get((l, code))
        if s is not None:
            return s
    raise ValueError("vp8l: invalid prefix code in stream")


def _read_prefix_code(br: _Bits, alphabet_size: int):
    """One prefix code: simple (1-2 symbols, positional bit assignment)
    or normal (code-length-coded lengths, spec §5.2.2)."""
    if br.read(1):  # simple
        num_symbols = br.read(1) + 1
        first_8bit = br.read(1)
        s0 = br.read(8 if first_8bit else 1)
        if s0 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of range")
        if num_symbols == 1:
            return ("zero", s0)
        s1 = br.read(8)
        if s1 >= alphabet_size:
            raise ValueError("vp8l: simple-code symbol out of range")
        # positional, NOT canonical-sorted: first symbol gets bit 0
        return ("map", {(1, 0): s0, (1, 1): s1}, 1)
    num_cl = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CL_ORDER[i]] = br.read(3)
    cl_tree = _build_canonical(cl_lengths)
    if cl_tree is None:
        raise ValueError("vp8l: bad code-length code")
    if br.read(1):  # limited number of coded symbols
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    symbol = 0
    prev_len = 8
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = _read_symbol(br, cl_tree)
        if code_len < 16:
            lengths[symbol] = code_len
            symbol += 1
            if code_len != 0:
                prev_len = code_len
        else:
            slot = code_len - 16
            extra_bits = (2, 3, 7)[slot]
            repeat = br.read(extra_bits) + (3, 3, 11)[slot]
            if symbol + repeat > alphabet_size:
                raise ValueError("vp8l: code-length repeat overrun")
            fill = prev_len if code_len == 16 else 0
            for _ in range(repeat):
                lengths[symbol] = fill
                symbol += 1
    tree = _build_canonical(lengths)
    if tree is None:
        raise ValueError("vp8l: incomplete prefix code")
    return tree


# ---------------------------------------------------------------------------
# LZ77 prefix values and the 2D-locality distance map
# ---------------------------------------------------------------------------


def _lz77_value(prefix: int, br: _Bits) -> int:
    """Length/distance prefix decoding (spec §4.2.2): codes 0-3 are the
    values 1-4; higher codes add extra bits."""
    if prefix < 4:
        return prefix + 1
    extra_bits = (prefix - 2) >> 1
    offset = (2 + (prefix & 1)) << extra_bits
    return offset + br.read(extra_bits) + 1

# Distance codes 1..120 address near neighbors in 2D before plain 1-D
# distances start at 121 (spec §4.2.2). Each byte encodes
# (dy << 4) | (8 - dx): dy in 0..7, dx in -7..8 (dy > 0), or dx in 1..8
# (dy == 0). Transcribed from the public spec's mapping table;
# tests/test_vp8l_decode.py structure-validates it as an exact
# permutation of those 120 legal offsets.
_CODE_TO_PLANE = (
    0x18, 0x07, 0x17, 0x19, 0x28, 0x06, 0x27, 0x29, 0x16, 0x1a,
    0x26, 0x2a, 0x38, 0x05, 0x37, 0x39, 0x15, 0x1b, 0x36, 0x3a,
    0x25, 0x2b, 0x48, 0x04, 0x47, 0x49, 0x14, 0x1c, 0x46, 0x4a,
    0x35, 0x3b, 0x24, 0x2c, 0x58, 0x45, 0x4b, 0x34, 0x3c, 0x03,
    0x57, 0x59, 0x13, 0x1d, 0x56, 0x5a, 0x23, 0x2d, 0x44, 0x4c,
    0x55, 0x5b, 0x33, 0x3d, 0x68, 0x02, 0x67, 0x69, 0x12, 0x1e,
    0x66, 0x6a, 0x22, 0x2e, 0x54, 0x5c, 0x43, 0x4d, 0x65, 0x6b,
    0x32, 0x3e, 0x78, 0x01, 0x77, 0x79, 0x53, 0x5d, 0x11, 0x1f,
    0x64, 0x6c, 0x42, 0x4e, 0x76, 0x7a, 0x21, 0x2f, 0x75, 0x7b,
    0x31, 0x3f, 0x63, 0x6d, 0x52, 0x5e, 0x00, 0x74, 0x7c, 0x41,
    0x4f, 0x10, 0x20, 0x62, 0x6e, 0x30, 0x73, 0x7d, 0x51, 0x5f,
    0x40, 0x72, 0x7e, 0x61, 0x6f, 0x50, 0x71, 0x7f, 0x60, 0x70,
)


def _plane_to_distance(code: int, xsize: int) -> int:
    if code > 120:
        return code - 120
    b = _CODE_TO_PLANE[code - 1]
    dy = b >> 4
    dx = 8 - (b & 0xF)
    d = dy * xsize + dx
    return d if d >= 1 else 1


# ---------------------------------------------------------------------------
# entropy-coded image stream (shared by the main image, entropy images,
# transform sub-images and palettes)
# ---------------------------------------------------------------------------


def _sub_size(size: int, bits: int) -> int:
    return (size + (1 << bits) - 1) >> bits


def _read_image_stream(br: _Bits, w: int, h: int, allow_meta: bool) -> list[int]:
    """Decode one entropy-coded ARGB image of w*h pixels (spec §5):
    color-cache header, optional meta prefix image (main image only),
    prefix-code groups, then the literal / backref / cache-ref pixel
    stream. Returns row-major uint32 ARGB values."""
    cache_bits = br.read(4) if br.read(1) else 0
    if cache_bits > 11:
        raise ValueError("vp8l: color cache too large")
    cache = [0] * (1 << cache_bits) if cache_bits else None

    meta_idx = None
    meta_bits = 0
    mw = 0
    n_groups = 1
    if allow_meta and br.read(1):
        meta_bits = br.read(3) + 2
        mw = _sub_size(w, meta_bits)
        mh = _sub_size(h, meta_bits)
        meta_img = _read_image_stream(br, mw, mh, False)
        meta_idx = [(p >> 8) & 0xFFFF for p in meta_img]
        n_groups = max(meta_idx) + 1

    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    groups = []
    for _ in range(n_groups):
        g = _read_prefix_code(br, green_alpha)
        r = _read_prefix_code(br, 256)
        b = _read_prefix_code(br, 256)
        a = _read_prefix_code(br, 256)
        d = _read_prefix_code(br, 40)
        groups.append((g, r, b, a, d))

    n = w * h
    pix = [0] * n
    pos = 0
    x = 0
    grp = groups[0]
    last_meta_cell = -1
    while pos < n:
        if meta_idx is not None:
            cell = ((pos // w) >> meta_bits) * mw + (x >> meta_bits)
            if cell != last_meta_cell:
                grp = groups[meta_idx[cell]]
                last_meta_cell = cell
        s = _read_symbol(br, grp[0])
        if s < 256:
            red = _read_symbol(br, grp[1])
            blue = _read_symbol(br, grp[2])
            alpha = _read_symbol(br, grp[3])
            argb = (alpha << 24) | (red << 16) | (s << 8) | blue
            pix[pos] = argb
            if cache is not None:
                cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
            pos += 1
            x += 1
            if x == w:
                x = 0
        elif s < 280:
            length = _lz77_value(s - 256, br)
            dist_code = _lz77_value(_read_symbol(br, grp[4]), br)
            dist = _plane_to_distance(dist_code, w)
            if dist > pos or pos + length > n:
                raise ValueError("vp8l: backward reference out of range")
            for _ in range(length):
                argb = pix[pos - dist]
                pix[pos] = argb
                if cache is not None:
                    cache[((0x1E35A7BD * argb) & 0xFFFFFFFF) >> (32 - cache_bits)] = argb
                pos += 1
                x += 1
                if x == w:
                    x = 0
        else:
            if cache is None:
                raise ValueError("vp8l: cache reference without color cache")
            pix[pos] = cache[s - 280]
            pos += 1
            x += 1
            if x == w:
                x = 0
    return pix


# ---------------------------------------------------------------------------
# inverse transforms (applied in reverse reading order, spec §3)
# ---------------------------------------------------------------------------


def _avg2(a: int, b: int) -> int:
    """Per-channel (a+b)//2 on packed ARGB without unpacking: mask out
    each pair's low carry bit first (the spec's per-byte average)."""
    return (((a ^ b) & 0xFEFEFEFE) >> 1) + (a & b)


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        v = ((l >> shift) & 0xFF) + ((t >> shift) & 0xFF) - ((tl >> shift) & 0xFF)
        out |= (0 if v < 0 else 255 if v > 255 else v) << shift
    return out


def _clamp_add_sub_half(av: int, tl: int) -> int:
    out = 0
    for shift in (24, 16, 8, 0):
        a = (av >> shift) & 0xFF
        b = (tl >> shift) & 0xFF
        d = a - b
        # C truncation toward zero, d may be negative
        half = d // 2 if d >= 0 else -((-d) // 2)
        v = a + half
        out |= (0 if v < 0 else 255 if v > 255 else v) << shift
    return out


def _select(l: int, t: int, tl: int) -> int:
    p_l = 0
    p_t = 0
    for shift in (24, 16, 8, 0):
        cl = (l >> shift) & 0xFF
        ct = (t >> shift) & 0xFF
        ctl = (tl >> shift) & 0xFF
        p = cl + ct - ctl
        p_l += abs(p - cl)
        p_t += abs(p - ct)
    return l if p_l < p_t else t


def _add_pixels(a: int, b: int) -> int:
    """Per-channel (a+b) & 0xff on packed ARGB."""
    return (
        (((a & 0xFF00FF00) + (b & 0xFF00FF00)) & 0xFF00FF00)
        | (((a & 0x00FF00FF) + (b & 0x00FF00FF)) & 0x00FF00FF)
    )


def _inv_predictor(pix: list[int], w: int, h: int, sub: list[int], bits: int) -> None:
    """In-place inverse of the predictor transform: residual + predicted
    (mod 256 per channel). Edge rules: (0,0) predicts 0xff000000, the
    rest of row 0 predicts L, the rest of column 0 predicts T
    (regardless of the block's mode)."""
    sw = _sub_size(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            if x == 0 and y == 0:
                pred = 0xFF000000
            elif y == 0:
                pred = pix[i - 1]
            elif x == 0:
                pred = pix[i - w]
            else:
                mode = (sub[(y >> bits) * sw + (x >> bits)] >> 8) & 0xFF
                l = pix[i - 1]
                t = pix[i - w]
                tl = pix[i - w - 1]
                # rightmost column: i-w+1 lands on the current row's
                # leftmost pixel — exactly the spec's TR rule there
                # (pixels are addressed in contiguous row-major memory)
                tr = pix[i - w + 1]
                if mode == 0:
                    pred = 0xFF000000
                elif mode == 1:
                    pred = l
                elif mode == 2:
                    pred = t
                elif mode == 3:
                    pred = tr
                elif mode == 4:
                    pred = tl
                elif mode == 5:
                    pred = _avg2(_avg2(l, tr), t)
                elif mode == 6:
                    pred = _avg2(l, tl)
                elif mode == 7:
                    pred = _avg2(l, t)
                elif mode == 8:
                    pred = _avg2(tl, t)
                elif mode == 9:
                    pred = _avg2(t, tr)
                elif mode == 10:
                    pred = _avg2(_avg2(l, tl), _avg2(t, tr))
                elif mode == 11:
                    pred = _select(l, t, tl)
                elif mode == 12:
                    pred = _clamp_add_sub_full(l, t, tl)
                elif mode == 13:
                    pred = _clamp_add_sub_half(_avg2(l, t), tl)
                else:
                    raise ValueError(f"vp8l: predictor mode {mode}")
            pix[i] = _add_pixels(pix[i], pred)


def _ct_delta(t: int, c: int) -> int:
    """ColorTransformDelta: signed-8-bit transform value times
    signed-8-bit channel value, arithmetic-shifted right 5 (spec §3.2)."""
    ts = t - 256 if t >= 128 else t
    cs = c - 256 if c >= 128 else c
    return (ts * cs) >> 5


def _inv_color_transform(pix: list[int], w: int, h: int, sub: list[int], bits: int) -> None:
    sw = _sub_size(w, bits)
    for y in range(h):
        row = y * w
        for x in range(w):
            i = row + x
            # ColorTransformElement packing (spec §3.2): the element is
            # a pixel whose BLUE byte is green_to_red, GREEN byte is
            # green_to_blue and RED byte is red_to_blue
            cte = sub[(y >> bits) * sw + (x >> bits)]
            g2red = cte & 0xFF
            g2blue = (cte >> 8) & 0xFF
            r2blue = (cte >> 16) & 0xFF
            p = pix[i]
            a = (p >> 24) & 0xFF
            r = (p >> 16) & 0xFF
            g = (p >> 8) & 0xFF
            b = p & 0xFF
            r = (r + _ct_delta(g2red, g)) & 0xFF
            b = (b + _ct_delta(g2blue, g) + _ct_delta(r2blue, r)) & 0xFF
            pix[i] = (a << 24) | (r << 16) | (g << 8) | b


def _inv_subtract_green(pix: list[int]) -> None:
    for i, p in enumerate(pix):
        g = (p >> 8) & 0xFF
        r = (((p >> 16) & 0xFF) + g) & 0xFF
        b = ((p & 0xFF) + g) & 0xFF
        pix[i] = (p & 0xFF00FF00) | (r << 16) | b


def _palette_width_bits(n_colors: int) -> int:
    if n_colors <= 2:
        return 3
    if n_colors <= 4:
        return 2
    if n_colors <= 16:
        return 1
    return 0


def _inv_color_indexing(
    pix: list[int], w: int, h: int, palette: list[int], width_bits: int
) -> list[int]:
    """Expand green-channel palette indices (possibly bit-bundled: ≤16
    colors pack 2/4/8 indices per decoded pixel) to full ARGB. An index
    beyond the palette decodes as 0x00000000 (spec §3.4)."""
    n_colors = len(palette)
    if width_bits == 0:
        out = []
        for p in pix:
            idx = (p >> 8) & 0xFF
            out.append(palette[idx] if idx < n_colors else 0)
        return out
    packed_w = _sub_size(w, width_bits)
    per = 1 << width_bits
    ibits = 8 >> width_bits
    mask = (1 << ibits) - 1
    out = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            g = (pix[y * packed_w + (x >> width_bits)] >> 8) & 0xFF
            idx = (g >> ((x % per) * ibits)) & mask
            out[y * w + x] = palette[idx] if idx < n_colors else 0
    return out


# ---------------------------------------------------------------------------
# top level
# ---------------------------------------------------------------------------

# upper bound on pixels the pure-Python decode path will attempt (4M px
# ≈ a 2048x2048 image): bounds both memory (pixel lists) and CPU for a
# batch of adversarial payloads — beyond it decode degrades to the stub
_MAX_PIXELS = 1 << 22


def decode_vp8l_stream(
    data: bytes, max_pixels: int = _MAX_PIXELS
) -> np.ndarray | None:
    """Decode a raw VP8L payload (the chunk body, starting at the 0x2F
    signature) to an (h, w, 4) RGBA uint8 array, or None if malformed
    OR larger than ``max_pixels`` (default ~4.2M px / 2048x2048: this
    pure-Python path is a correctness/fixture decoder — images past the
    cap degrade to the stub like any other non-default format, and a
    deployment decodes them through the injected codec seam or raises
    the cap explicitly)."""
    try:
        if not data or data[0] != 0x2F:
            return None
        br = _Bits(data)
        br.read(8)  # signature
        w = br.read(14) + 1
        h = br.read(14) + 1
        br.read(1)  # alpha-used hint
        if br.read(3) != 0:  # version must be 0
            return None
        if w * h > max_pixels:
            # a 10-byte stream can CLAIM 16383x16383 (268M pixels) and
            # force a ~2 GB allocation before the bitstream runs dry —
            # cap the pure-Python path well below that; deployments
            # decode large images through the injected codec seam
            return None

        transforms = []  # (type, payload) in reading order
        seen = set()
        cur_w = w
        while br.read(1):
            t = br.read(2)
            if t in seen:
                return None
            seen.add(t)
            if t in (0, 1):  # predictor / cross-color
                bits = br.read(3) + 2
                sub = _read_image_stream(
                    br, _sub_size(cur_w, bits), _sub_size(h, bits), False
                )
                transforms.append((t, (bits, sub)))
            elif t == 2:  # subtract green
                transforms.append((t, None))
            else:  # color indexing
                n_colors = br.read(8) + 1
                raw = _read_image_stream(br, n_colors, 1, False)
                palette = []
                prev = 0
                for p in raw:
                    prev = _add_pixels(prev, p)
                    palette.append(prev)
                width_bits = _palette_width_bits(n_colors)
                transforms.append((t, (palette, width_bits)))
                cur_w = _sub_size(cur_w, width_bits)

        pix = _read_image_stream(br, cur_w, h, True)

        for t, payload in reversed(transforms):
            if t == 3:
                palette, width_bits = payload
                pix = _inv_color_indexing(pix, w, h, palette, width_bits)
                cur_w = w
            elif t == 2:
                _inv_subtract_green(pix)
            elif t == 1:
                bits, sub = payload
                _inv_color_transform(pix, cur_w, h, sub, bits)
            else:
                bits, sub = payload
                _inv_predictor(pix, cur_w, h, sub, bits)

        arr = np.array(pix, dtype=np.uint32).reshape(h, w)
        rgba = np.empty((h, w, 4), dtype=np.uint8)
        rgba[..., 0] = (arr >> 16) & 0xFF
        rgba[..., 1] = (arr >> 8) & 0xFF
        rgba[..., 2] = arr & 0xFF
        rgba[..., 3] = (arr >> 24) & 0xFF
        return rgba
    except (ValueError, IndexError, OverflowError):
        return None


def decode_webp(
    blob: bytes, max_pixels: int = _MAX_PIXELS
) -> np.ndarray | None:
    """Lossless WebP to a flat RGBA uint8 array (matching the other
    stdlib decoders' flat-pixel convention), or None: not a RIFF/WEBP
    container, the payload is lossy VP8 / an animation (those need a
    codec library via the ``decode_fn`` seam), or the image exceeds
    ``max_pixels`` (see :func:`decode_vp8l_stream`)."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WEBP":
        return None
    pos = 12
    while pos + 8 <= len(blob):
        fourcc = blob[pos : pos + 4]
        (size,) = struct.unpack("<I", blob[pos + 4 : pos + 8])
        body = blob[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L" and len(body) == size:
            out = decode_vp8l_stream(bytes(body), max_pixels=max_pixels)
            return None if out is None else out.reshape(-1)
        pos += 8 + size + (size & 1)  # chunks are 2-byte aligned
    return None
