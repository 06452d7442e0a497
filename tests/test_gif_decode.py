"""GIF/LZW decoder proofs (operators/multimodal.py: decode_gif).

Same two-channel strategy as the JPEG tests: a HAND-ASSEMBLED fixture
whose LZW bits are packed by hand from the GIF89a spec (appendix F) —
decoder correctness with no encoder in the loop — plus a real LZW
compressor for multi-block, dictionary-growth and KwK round trips.
GIF's LZW is lossless, so round trips assert exact equality.
"""

import numpy as np

from proteofav_spark.operators.multimodal import decode_gif

# ---------------------------------------------------------------------------
# test encoder: real GIF-LZW compression, stdlib only
# ---------------------------------------------------------------------------


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    out_bits: list[tuple[int, int]] = [(clear, width)]

    def grow():
        nonlocal width
        if next_code == (1 << width) and width < 12:
            width += 1

    prefix = (indices[0],)
    for s in indices[1:]:
        cand = prefix + (s,)
        if cand in table:
            prefix = cand
            continue
        out_bits.append((table[prefix], width))
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            grow()
        prefix = (s,)
    out_bits.append((table[prefix], width))
    out_bits.append((eoi, width))

    acc = nacc = 0
    data = bytearray()
    for v, w in out_bits:
        acc |= v << nacc
        nacc += w
        while nacc >= 8:
            data.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8
    if nacc:
        data.append(acc & 0xFF)
    return bytes(data)


def encode_gif(indices: np.ndarray, palette: np.ndarray) -> bytes:
    """Assemble a GIF89a: global color table from ``palette`` (n x 3),
    one non-interlaced frame of ``indices`` (h x w), real LZW data."""
    h, w = indices.shape
    n = len(palette)
    size_field = max(1, (n - 1).bit_length() - 1) if n > 2 else 0
    table_n = 2 << size_field
    min_code = max(2, size_field + 1)
    gct = np.zeros((table_n, 3), np.uint8)
    gct[:n] = palette
    out = bytearray(b"GIF89a")
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += bytes([0x80 | size_field, 0, 0])
    out += gct.tobytes()
    out += b"\x2c" + b"\x00\x00\x00\x00"
    out += int(w).to_bytes(2, "little") + int(h).to_bytes(2, "little")
    out += b"\x00"  # no local table, not interlaced
    out += bytes([min_code])
    data = _lzw_encode([int(x) for x in indices.reshape(-1)], min_code)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


# ---------------------------------------------------------------------------
# 1. hand-assembled spec fixture
# ---------------------------------------------------------------------------

def test_hand_assembled_2x2():
    """2x2 frame, 4-color table, pixels [0,1,2,3]. LZW bits packed BY
    HAND (LSB-first): a standard encoder's table is one entry ahead of
    the decoder's, so after the decoder builds entry 6 (while reading
    the third code) the stream is already at 4-bit codes — CLEAR,0,1 at
    3 bits then 2,3,EOI at 4 bits; bits LSB-first
    [001 000 100 0100 1100 1010] -> bytes 44 64 0A."""
    palette = bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]
    )
    blob = (
        b"GIF89a"
        + b"\x02\x00\x02\x00"  # screen 2x2
        + bytes([0x81, 0, 0])  # GCT present, 4 entries
        + palette
        + b"\x2c\x00\x00\x00\x00\x02\x00\x02\x00\x00"  # descriptor
        + bytes([2])  # LZW min code size
        + bytes([3, 0x44, 0x64, 0x0A, 0])  # one sub-block + terminator
        + b"\x3b"
    )
    px = decode_gif(blob)
    assert px is not None
    assert px.tolist() == [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120]


# ---------------------------------------------------------------------------
# 2. encoder round trips (lossless -> exact)
# ---------------------------------------------------------------------------

def test_roundtrip_patterns_exact():
    """Gradient, checker and constant-run frames round-trip exactly —
    covering dictionary growth through several width increases, long
    runs (the KwK special case fires on any repeated-run input), and
    multi-sub-block data."""
    rng_free_patterns = []
    yy, xx = np.mgrid[0:24, 0:31]
    rng_free_patterns.append(((xx + yy) % 16).astype(np.int64))         # gradient
    rng_free_patterns.append(((xx // 3 + yy // 3) % 2).astype(np.int64))  # checker
    rng_free_patterns.append(np.full((24, 31), 5, np.int64))            # constant
    palette = np.array(
        [[i * 15, 255 - i * 15, (i * 37) % 256] for i in range(16)], np.uint8
    )
    for pat in rng_free_patterns:
        blob = encode_gif(pat, palette)
        px = decode_gif(blob)
        assert px is not None
        want = palette[pat.reshape(-1)].reshape(-1)
        assert (px == want).all()


def test_kwk_case_explicit():
    """The code==next_code (KwK) branch: input 'aaa...' emits a code for
    an entry the decoder has not built yet on the very next step."""
    pat = np.zeros((1, 9), np.int64)  # 9 identical pixels
    palette = np.array([[200, 100, 50], [1, 2, 3], [4, 5, 6], [7, 8, 9]], np.uint8)
    px = decode_gif(encode_gif(pat, palette))
    assert px is not None
    assert (px.reshape(-1, 3) == [200, 100, 50]).all()
    assert len(px) == 27


def test_extension_blocks_skipped_and_malformed_none():
    pat = ((np.mgrid[0:8, 0:8][1]) % 4).astype(np.int64)
    palette = np.array([[i, i, i] for i in (0, 85, 170, 255)], np.uint8)
    blob = encode_gif(pat, palette)
    # splice a graphic-control extension between header+GCT and the frame
    idx = blob.index(b"\x2c")
    ext = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    spliced = blob[:idx] + ext + blob[idx:]
    px = decode_gif(spliced)
    want = palette[pat.reshape(-1)].reshape(-1)
    assert px is not None and (px == want).all()
    # interlace flag on a sequential stream: decodes via the 4-pass row
    # scatter, so the rows land permuted exactly per the spec table
    interlaced = bytearray(blob)
    interlaced[idx + 9] |= 0x40
    px_i = decode_gif(bytes(interlaced))
    scattered = np.empty_like(pat)
    src = 0
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        cnt = len(range(start, 8, step))
        scattered[start::step] = pat[src : src + cnt]
        src += cnt
    assert px_i is not None
    assert (px_i == palette[scattered.reshape(-1)].reshape(-1)).all()
    assert decode_gif(b"GIF89a\x00") is None
    assert decode_gif(b"not a gif") is None


def encode_animated_gif(frames: list, palette: np.ndarray) -> bytes:
    """Multi-frame GIF89a: shared global table, one descriptor + LZW
    data block per frame."""
    h, w = frames[0].shape
    single = encode_gif(frames[0], palette)
    head_end = single.index(b"\x2c")
    head = single[:head_end]
    body = bytearray()
    for f in frames:
        one = encode_gif(f, palette)
        i = one.index(b"\x2c")
        body += one[i:-1]  # frame descriptor..terminator, drop trailer
    return bytes(head) + bytes(body) + b"\x3b"


def test_animated_frames_all_decoded():
    from proteofav_spark.operators.multimodal import gif_frames

    palette = np.array([[i * 60, i * 30, 255 - i * 60] for i in range(4)], np.uint8)
    yy, xx = np.mgrid[0:10, 0:12]
    frames = [((xx + yy + k) % 4).astype(np.int64) for k in range(3)]
    blob = encode_animated_gif(frames, palette)
    got = gif_frames(blob)
    assert got is not None and len(got) == 3
    for g, f in zip(got, frames):
        assert (g == palette[f.reshape(-1)].reshape(-1)).all()
    # limit short-circuits
    assert len(gif_frames(blob, limit=2)) == 2


def test_frame_sample_demuxes_real_gif(spark):
    """The default frame_fn REALLY demuxes animated GIF: one output row
    per frame with the checksum of the decoded raster — not the
    byte-window stub."""
    from proteofav_spark.operators.multimodal import frame_sample, gif_frames

    palette = np.array([[0, 0, 0], [255, 255, 255], [7, 7, 7], [9, 9, 9]], np.uint8)
    yy, xx = np.mgrid[0:8, 0:8]
    frames = [((xx + k) % 2).astype(np.int64) for k in range(4)]
    blob = encode_animated_gif(frames, palette)
    df = spark.createDataFrame(
        [(42, bytearray(blob))], "doc_id long, payload binary"
    )
    rows = frame_sample(df).orderBy("frame_no").collect()
    assert [r["frame_no"] for r in rows] == [0, 1, 2, 3]
    want = [int(f.sum()) % 1_000_003 for f in gif_frames(blob)]
    assert [r["frame_checksum"] for r in rows] == want


def test_hostile_blobs_rejected_fast():
    """Executor-safety: a crafted min-code byte must not size a 2^40
    table; junk after EOI is ignored (real encoders pad); a small-frame/
    huge-data blob bails at the first excess pixel."""
    import time

    pat = ((np.mgrid[0:8, 0:8][1]) % 4).astype(np.int64)
    palette = np.array([[i, i, i] for i in (0, 85, 170, 255)], np.uint8)
    blob = encode_gif(pat, palette)
    idx = blob.index(b"\x2c")

    # (a) hostile min-code byte: position = descriptor start + 10
    hostile = bytearray(blob)
    hostile[idx + 10] = 40
    t0 = time.time()
    assert decode_gif(bytes(hostile)) is None
    assert time.time() - t0 < 1.0

    # (b) padding byte inside the data sub-block after EOI still decodes
    data_len_pos = idx + 11
    n = blob[data_len_pos]
    padded = (
        blob[:data_len_pos]
        + bytes([n + 1])
        + blob[data_len_pos + 1 : data_len_pos + 1 + n]
        + b"\x00"
        + blob[data_len_pos + 1 + n :]
    )
    px = decode_gif(padded)
    want = palette[pat.reshape(-1)].reshape(-1)
    assert px is not None and (px == want).all()

    # (c) tiny declared frame + the full LZW stream of a big frame:
    # must reject quickly, not expand the whole stream first
    big = ((np.mgrid[0:64, 0:64][1]) % 4).astype(np.int64)
    bigblob = encode_gif(big, palette)
    bidx = bigblob.index(b"\x2c")
    lied = bytearray(bigblob)
    lied[bidx + 5 : bidx + 9] = (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
    assert decode_gif(bytes(lied)) is None


def test_interlaced_gif_roundtrip():
    """A genuinely interlaced frame: rows stored in 4-pass order (0::8, 4::8,
    2::4, 1::2) with the interlace flag set must decode back to the
    ORIGINAL raster — strided-scatter de-interlacing, heights that
    leave some passes short or empty included."""
    from proteofav_spark.operators.multimodal import decode_gif

    palette = np.array(
        [[i * 23 % 256, i * 47 % 256, i * 91 % 256] for i in range(8)],
        np.uint8,
    )
    for h, w in ((1, 5), (3, 4), (8, 8), (11, 6), (17, 3)):
        pat = ((np.mgrid[0:h, 0:w][0] * 3 + np.mgrid[0:h, 0:w][1]) % 8)
        pat = pat.astype(np.int64)
        # pass-order storage: concatenate the rows each pass covers
        stored = np.concatenate(
            [pat[start::step] for start, step in
             ((0, 8), (4, 8), (2, 4), (1, 2))],
            axis=0,
        )
        blob = bytearray(encode_gif(stored, palette))
        idx = blob.index(b"\x2c")
        blob[idx + 9] |= 0x40  # interlace flag
        px = decode_gif(bytes(blob))
        want = palette[pat.reshape(-1)].reshape(-1)
        assert px is not None and (px == want).all(), (h, w)
