"""Baseline-JPEG decoder proofs (operators/multimodal.py: decode_jpeg).

Two independent evidence channels, so encoder and decoder can't share a
structural misunderstanding and still pass:

1. a HAND-ASSEMBLED spec fixture — markers, canonical huffman table and
   entropy bits derived directly from ITU-T T.81 (not produced by the
   test encoder) — pins marker parsing, canonical code construction,
   EXTEND, the DC-only IDCT path and the +128 level shift;
2. a self-contained test ENCODER (forward DCT + the same public zigzag /
   canonical-DHT rules) whose output must decode back to ~the input.
   JPEG is lossy, so round-trip asserts approximation — which is the
   strong form here: any zigzag/huffman/quant-indexing mismatch between
   the two sides produces garbage, not near-identity.

No codec library exists in this container (PIL/cv2/imageio absent), so
the encoder is the only way to synthesize multi-block/color/subsampled/
restart-interval streams.
"""

import numpy as np
import pytest

from proteofav_spark.operators.multimodal import _ZIGZAG, decode_jpeg

# ---------------------------------------------------------------------------
# test encoder (stdlib + numpy only)
# ---------------------------------------------------------------------------

# orthonormal forward DCT basis (same public formula the decoder inverts)
_C = np.array([
    [(np.sqrt(0.125) if u == 0 else 0.5)
     * np.cos((2 * x + 1) * u * np.pi / 16) for x in range(8)]
    for u in range(8)
])

# one universal canonical huffman table used for both DC and AC classes:
# 255 nine-bit codes for symbols 0..254 plus one ten-bit code for 255.
# DHT counts/symbols express it; the encoder mirrors the canonical rule.
_UNIV_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_UNIV_SYMBOLS = list(range(256))


def _univ_code(sym: int) -> tuple[int, int]:
    return (9, sym) if sym < 255 else (10, 510)


class _BitWriter:
    def __init__(self):
        self.bits: list[int] = []

    def put(self, value: int, n: int) -> None:
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def flush_stuffed(self) -> bytes:
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            byte = int("".join(map(str, bits[i : i + 8])), 2)
            out.append(byte)
            if byte == 0xFF:
                out.append(0x00)
        self.bits = []
        return bytes(out)


def _size_cat(v: int) -> int:
    return 0 if v == 0 else int(abs(v)).bit_length()


def _put_coef(bw: _BitWriter, v: int, s: int) -> None:
    bw.put(v if v >= 0 else v + (1 << s) - 1, s)


def _encode_block(bw: _BitWriter, block: np.ndarray, q: np.ndarray,
                  pred: int) -> int:
    coef = _C @ (block.astype(np.float64) - 128.0) @ _C.T
    qz = np.round(coef / q).astype(int)
    zz = qz.reshape(-1)[_ZIGZAG]
    diff = int(zz[0]) - pred
    s = _size_cat(diff)
    bw.put(*reversed(_univ_code(s)))
    _put_coef(bw, diff, s)
    run = 0
    last_nz = max([k for k in range(1, 64) if zz[k]] or [0])
    for k in range(1, last_nz + 1):
        if zz[k] == 0:
            run += 1
            continue
        while run > 15:
            bw.put(*reversed(_univ_code(0xF0)))  # ZRL
            run -= 16
        s = _size_cat(int(zz[k]))
        bw.put(*reversed(_univ_code((run << 4) | s)))
        _put_coef(bw, int(zz[k]), s)
        run = 0
    if last_nz < 63:
        bw.put(*reversed(_univ_code(0x00)))  # EOB
    return int(zz[0])


def _marker(m: int, payload: bytes = b"") -> bytes:
    if not payload:
        return bytes([0xFF, m])
    return bytes([0xFF, m]) + (len(payload) + 2).to_bytes(2, "big") + payload


def _dqt(tq: int, q: np.ndarray) -> bytes:
    return _marker(0xDB, bytes([tq]) + bytes(
        int(q.reshape(-1)[_ZIGZAG[i]]) for i in range(64)
    ))


def _dht(tc: int, th: int) -> bytes:
    return _marker(0xC4, bytes([(tc << 4) | th]) + bytes(_UNIV_COUNTS)
                   + bytes(_UNIV_SYMBOLS))


def encode_jpeg(img: np.ndarray, q_val: int = 2, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline-encode a (h, w) grayscale or (h, w, 3) RGB uint8 array:
    4:4:4 by default, 4:2:0 when ``subsample`` (box-averaged chroma),
    optional DRI/RSTn restart intervals."""
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.full((8, 8), q_val, np.int32)
    out = [_marker(0xD8), _dqt(0, q), _dht(0, 0), _dht(1, 0)]
    if restart_interval:
        out.append(_marker(0xDD, restart_interval.to_bytes(2, "big")))
    if gray:
        comps = [(1, 1, 1, np.asarray(img, np.float64))]
    else:
        rgb = img.astype(np.float64)
        y = (0.299 * rgb[..., 0] + 0.587 * rgb[..., 1] + 0.114 * rgb[..., 2])
        cb = 128.0 - 0.168736 * rgb[..., 0] - 0.331264 * rgb[..., 1] \
            + 0.5 * rgb[..., 2]
        cr = 128.0 + 0.5 * rgb[..., 0] - 0.418688 * rgb[..., 1] \
            - 0.081312 * rgb[..., 2]
        if subsample:
            def box(p):
                ph = np.pad(p, ((0, h % 2), (0, w % 2)), mode="edge")
                return (ph[0::2, 0::2] + ph[1::2, 0::2]
                        + ph[0::2, 1::2] + ph[1::2, 1::2]) / 4.0
            comps = [(1, 2, 2, y), (2, 1, 1, box(cb)), (3, 1, 1, box(cr))]
        else:
            comps = [(1, 1, 1, y), (2, 1, 1, cb), (3, 1, 1, cr)]
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") \
        + bytes([len(comps)])
    for cid, ch_, cv, _ in comps:
        sof += bytes([cid, (ch_ << 4) | cv, 0])
    out.append(_marker(0xC0, sof))
    sos = bytes([len(comps)])
    for cid, *_ in comps:
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out.append(_marker(0xDA, sos))

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    padded = []
    for cid, ch_, cv, plane in comps:
        pw, ph = mcux * ch_ * 8, mcuy * cv * 8
        p = np.pad(plane, ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
                   mode="edge")
        padded.append(p)
    bw = _BitWriter()
    preds = [0] * len(comps)
    entropy = bytearray()
    n_mcu, rst = 0, 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                entropy += bw.flush_stuffed()
                entropy += bytes([0xFF, 0xD0 + rst % 8])
                rst += 1
                preds = [0] * len(comps)
            n_mcu += 1
            for ci, (cid, ch_, cv, _) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch_):
                        y0, x0 = (my * cv + by) * 8, (mx * ch_ + bx) * 8
                        block = padded[ci][y0 : y0 + 8, x0 : x0 + 8]
                        preds[ci] = _encode_block(bw, block, q, preds[ci])
    entropy += bw.flush_stuffed()
    out.append(bytes(entropy))
    out.append(_marker(0xD9))
    return b"".join(out)


# ---------------------------------------------------------------------------
# 1. hand-assembled spec fixture (no encoder involved)
# ---------------------------------------------------------------------------

def test_hand_assembled_uniform_block():
    """8x8 uniform gray 128, quant table of all 1s: level shift makes
    every DCT coefficient 0, so the entropy segment is DC size-0 + EOB.
    With the universal table both symbols are nine 0-bits; 18 bits pad
    to 24 with 1s -> bytes 00 00 3F (derived by hand from T.81 F.1.2)."""
    dqt = _dqt(0, np.ones((8, 8), np.int32))
    sof = _marker(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    sos = _marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    blob = (b"\xff\xd8" + dqt + _dht(0, 0) + _dht(1, 0) + sof + sos
            + b"\x00\x00\x3f" + b"\xff\xd9")
    px = decode_jpeg(blob)
    assert px is not None and px.shape == (64,)
    assert (px == 128).all()


def test_hand_assembled_dc_step():
    """Same stream but DC diff = +1 (size 1, magnitude bit 1): the block
    becomes uniform 128 + round(1/8 * 8) ... i.e. IDCT of coef[0,0]=1 is
    1/8 per pixel -> 128.125 -> rounds to 128; with DC diff = +8 the
    lift is exactly +1 pixel everywhere (hand-computed: 8 * 1/8)."""
    dqt = _dqt(0, np.ones((8, 8), np.int32))
    sof = _marker(0xC0, bytes([8, 0, 8, 0, 8, 1, 1, 0x11, 0]))
    sos = _marker(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
    # DC: size-4 symbol = 9-bit code 4 (000000100), then 4 magnitude
    # bits 1000 (=+8); AC: EOB = 9 zeros. 22 bits, pad 2 ones.
    bits = "000000100" + "1000" + "000000000" + "11"
    payload = bytes(int(bits[i : i + 8], 2) for i in range(0, 24, 8))
    blob = (b"\xff\xd8" + dqt + _dht(0, 0) + _dht(1, 0) + sof + sos
            + payload + b"\xff\xd9")
    px = decode_jpeg(blob)
    assert px is not None
    assert (px == 129).all()  # 128 + 8 * (1/8)


# ---------------------------------------------------------------------------
# 2. encoder round-trips (lossy -> approximate identity)
# ---------------------------------------------------------------------------

def _gradient(h, w):
    yy, xx = np.mgrid[0:h, 0:w]
    return ((32 + 1.5 * xx + 0.8 * yy) % 200 + 20).astype(np.uint8)


def test_roundtrip_grayscale_multiblock():
    img = _gradient(24, 40)  # 3x5 blocks, exercises multi-MCU DC chain
    px = decode_jpeg(encode_jpeg(img, q_val=2))
    assert px is not None and px.shape == (24 * 40,)
    err = np.abs(px.reshape(24, 40).astype(int) - img.astype(int))
    assert err.max() <= 6 and err.mean() < 1.5


def test_roundtrip_nonmultiple_of_8_dims():
    img = _gradient(13, 21)  # forces edge-padded partial blocks
    px = decode_jpeg(encode_jpeg(img, q_val=2))
    assert px is not None and px.shape == (13 * 21,)
    err = np.abs(px.reshape(13, 21).astype(int) - img.astype(int))
    assert err.max() <= 6


def test_roundtrip_color_444_and_420():
    h, w = 16, 24
    img = np.stack(
        [_gradient(h, w), _gradient(w, h).T, 255 - _gradient(h, w)],
        axis=-1,
    ).astype(np.uint8)
    for sub in (False, True):
        px = decode_jpeg(encode_jpeg(img, q_val=2, subsample=sub))
        assert px is not None and px.shape == (h * w * 3,), sub
        got = px.reshape(h, w, 3).astype(int)
        err = np.abs(got - img.astype(int))
        # 4:2:0 averages 2x2 chroma; this image's chroma is smooth so
        # the bound stays tight-ish
        assert err.max() <= (6 if not sub else 40), (sub, err.max())
        assert err.mean() < (2 if not sub else 8), (sub, err.mean())


def test_roundtrip_with_restart_intervals():
    img = _gradient(16, 48)  # 2x6 MCUs at 4:4:4 gray
    blob = encode_jpeg(img, q_val=2, restart_interval=3)
    assert b"\xff\xd0" in blob  # a real RST0 marker was emitted
    px = decode_jpeg(blob)
    assert px is not None
    err = np.abs(px.reshape(16, 48).astype(int) - img.astype(int))
    assert err.max() <= 6


def test_ac_coefficients_survive():
    """A high-contrast checker block has large AC energy: decoding must
    reproduce the pattern's structure (correlation > 0.99), proving the
    AC run-length path (not just DC) is exercised and correct."""
    img = (np.indices((16, 16)).sum(0) % 2 * 180 + 40).astype(np.uint8)
    px = decode_jpeg(encode_jpeg(img, q_val=1))
    got = px.reshape(16, 16).astype(float)
    want = img.astype(float)
    c = np.corrcoef(got.reshape(-1), want.reshape(-1))[0, 1]
    assert c > 0.99


def test_non_baseline_degrades_to_none():
    img = _gradient(8, 8)
    blob = bytearray(encode_jpeg(img))
    i = blob.find(b"\xff\xc0")
    blob[i + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    assert decode_jpeg(bytes(blob)) is None
    assert decode_jpeg(b"\xff\xd8\x00\x00") is None
    assert decode_jpeg(b"not a jpeg") is None


def test_image_features_decodes_real_jpeg_default_path(spark):
    """End-to-end Spark plumbing: a real JPEG blob in a binary column
    flows through the DEFAULT mapInPandas kernel (no injected decoder)
    and yields the true pixel statistics of the encoded image."""
    from proteofav_spark.operators.multimodal import image_features

    img = _gradient(16, 16)
    blob = encode_jpeg(img, q_val=2)
    want = decode_jpeg(blob)  # module-level truth for the lossy pixels
    df = spark.createDataFrame(
        [(1, bytearray(blob), {"width": 16, "height": 16,
                               "channels": 1, "format": "jpeg"})],
        "doc_id long, payload binary, "
        "meta struct<width:int,height:int,channels:int,format:string>",
    )
    row = image_features(df).collect()[0]
    assert row["n_bytes"] == len(blob)
    assert row["mean_pixel"] == round(float(want.mean()), 6)
    assert row["histogram8"] == np.histogram(
        want, bins=8, range=(0, 256)
    )[0].astype("int64").tolist()


def test_decode_speed_linear_on_larger_image():
    """Guards the bit-reader against accumulator growth: a ~30 KB
    entropy segment with no restart intervals must decode in linear
    time (an unmasked bignum accumulator makes this quadratic — minutes
    instead of a fraction of a second)."""
    import time

    img = _gradient(256, 384)
    blob = encode_jpeg(img, q_val=2)
    t0 = time.time()
    px = decode_jpeg(blob)
    dt = time.time() - t0
    err = np.abs(px.reshape(256, 384).astype(int) - img.astype(int))
    assert err.max() <= 6
    assert dt < 30, f"decode took {dt:.1f}s — bit reader is superlinear"


def test_fill_bytes_before_markers_are_skipped():
    """T.81 B.1.1.2: any number of 0xFF fill bytes may precede a marker
    id. Inserting fills before DQT and SOS must not change the decode."""
    img = _gradient(16, 16)
    blob = encode_jpeg(img, q_val=2)
    want = decode_jpeg(blob)
    padded = blob.replace(b"\xff\xdb", b"\xff\xff\xff\xdb", 1).replace(
        b"\xff\xda", b"\xff\xff\xff\xff\xda", 1
    )
    got = decode_jpeg(padded)
    assert got is not None and (got == want).all()
