"""VP8L WebP codec tests (functions/webp.py) — pure Python, no Spark.

The oracle strategy is cross-PATH identity (the baseline/progressive
JPEG technique): the same raster encoded through materially different
bitstream shapes — pure literals, LZ77 run copies, color-cache hits,
subtract-green, palette/color-indexing with sub-byte bundling — must
decode back to the identical source bytes. A decode bug would have to
exist consistently across unrelated code paths to hide. Unsupported
spec surface (VP8 lossy, predictor/cross-color transforms, distance
plane codes) must fail loudly with named ValueErrors, never garbage."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from akkastreamprocessnpmpackagedependencies_spark.functions.webp import (
    _BitReader,
    _BitWriter,
    _canonical_code,
    _prefix_symbol,
    _prefix_value,
    decode_webp,
    encode_webp,
)

MODES = [
    dict(use_lz77=False, cache_bits=0),
    dict(use_lz77=True, cache_bits=0),
    dict(use_lz77=True, cache_bits=6),
    dict(use_lz77=False, cache_bits=4),
    dict(use_lz77=True, cache_bits=3, subtract_green=True),
    dict(use_lz77=False, cache_bits=0, subtract_green=True),
    # round 11: the spatial transforms (block size 4 so sub-images go
    # multi-block from 5px up; every neighborhood/edge rule in play)
    dict(use_lz77=True, cache_bits=0, predictor=True, transform_bits=2),
    dict(use_lz77=False, cache_bits=0, cross_color=True, transform_bits=2),
    dict(use_lz77=True, cache_bits=4, subtract_green=True, predictor=True,
         cross_color=True, transform_bits=3),
    # round 14: 2D distance plane codes (the wiring the r14 merge landed)
    # join the shared matrix so every matrix-parameterized test and the
    # hypothesis property cover them beside their dedicated tests
    dict(use_lz77=True, cache_bits=0, plane_codes=True),
    dict(use_lz77=True, cache_bits=4, subtract_green=True,
         plane_codes=True),
]


def _rng():
    return np.random.default_rng(2026)


# ------------------------------------------------------------ bit plumbing


def test_bit_reader_writer_roundtrip_lsb_first():
    bw = _BitWriter()
    fields = [(0b101, 3), (0, 1), (0x3FFF, 14), (7, 3), (1, 1), (0xAB, 8)]
    for v, n in fields:
        bw.write(v, n)
    br = _BitReader(bw.bytes())
    for v, n in fields:
        assert br.read(n) == v


def test_bit_reader_rejects_truncation():
    br = _BitReader(b"\x01")
    br.read(8)
    with pytest.raises(ValueError, match="truncated"):
        br.read(1)


def test_prefix_symbol_value_inverse_exhaustive():
    for value in range(1, 4097):
        code, payload, nbits = _prefix_symbol(value)
        bw = _BitWriter()
        bw.write(payload, nbits)
        br = _BitReader(bw.bytes() or b"\x00")
        assert _prefix_value(code, br) == value


def test_canonical_code_rejects_incomplete_and_oversubscribed():
    with pytest.raises(ValueError, match="Kraft"):
        _canonical_code([2, 2, 2, 0])  # incomplete
    with pytest.raises(ValueError, match="Kraft"):
        _canonical_code([1, 1, 1])  # oversubscribed
    # complete code decodes
    code = _canonical_code([1, 2, 2])
    bw = _BitWriter()
    for c, l in [(0, 1), (0b10, 2), (0b11, 2)]:
        bw.write_code(c, l)
    br = _BitReader(bw.bytes())
    assert [code.decode(br) for _ in range(3)] == [0, 1, 2]


# ------------------------------------------------------- cross-path oracle


def test_cross_path_identity_random_rasters():
    """Every encode mode reproduces random (incompressible) rasters
    byte-exactly — and produces a DIFFERENT bitstream at least somewhere,
    so the modes genuinely exercise different decode paths."""
    rng = _rng()
    for w, h in [(1, 1), (7, 3), (16, 16), (37, 11)]:
        raw = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        streams = set()
        for kwargs in MODES:
            data = encode_webp(w, h, raw, 3, **kwargs)
            streams.add(data)
            W, H, C, arr = decode_webp(data)
            assert (W, H, C) == (w, h, 3)
            assert arr.tobytes() == raw
        assert len(streams) > 1


def test_cross_path_identity_runs_exercise_lz77_and_cache():
    """Rasters with horizontal AND vertical runs: the LZ77 encoder emits
    dist-1 and dist-width copies (direct distance codes), the cache mode
    emits hits; all decode identically to the literal-only stream."""
    rng = _rng()
    w, h = 24, 18
    base = rng.integers(0, 4, size=(h // 2, w // 3, 3), dtype=np.uint8) * 80
    px = np.repeat(np.repeat(base, 2, axis=0), 3, axis=1)[:h, :w]
    raw = px.tobytes()
    decoded = set()
    for kwargs in MODES:
        W, H, C, arr = decode_webp(encode_webp(w, h, raw, 3, **kwargs))
        decoded.add(arr.tobytes())
    assert decoded == {raw}


def test_palette_modes_with_bundling():
    """Color-indexing transform at every bundling width (8/4/2 px per
    byte and unbundled), including palette sizes at the bundling
    boundaries."""
    rng = _rng()
    for ncolors in [2, 3, 4, 5, 16, 17, 200, 256]:
        w, h = 23, 9
        pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
        # ensure distinct palette entries (encoder palettizes by value)
        pal[:, 0] = np.arange(ncolors) % 256
        idx = rng.integers(0, ncolors, size=(h, w))
        raw = pal[idx].tobytes()
        data = encode_webp(w, h, raw, 3, palette=True, use_lz77=False)
        W, H, C, arr = decode_webp(data)
        assert (W, H, C) == (w, h, 3)
        assert arr.tobytes() == raw


def test_rgba_alpha_roundtrip_and_channel_count():
    rng = _rng()
    px = rng.integers(0, 256, size=(5, 9, 4), dtype=np.uint8)
    data = encode_webp(9, 5, px.tobytes(), 4, use_lz77=True, cache_bits=4)
    W, H, C, arr = decode_webp(data)
    assert (W, H, C) == (9, 5, 4)
    assert arr.tobytes() == px.tobytes()
    # constant-255 alpha collapses to declared-opaque 3-channel output
    px[..., 3] = 255
    W, H, C, arr = decode_webp(encode_webp(9, 5, px.tobytes(), 4))
    assert C == 3
    assert arr.tobytes() == px[..., :3].tobytes()
    # ...including through every encode mode (a round-11 deep-fuzz run
    # initially misread this documented collapse as a transform bug;
    # pin it across the whole mode matrix so the convention is visibly
    # mode-independent)
    for kwargs in MODES:
        W, H, C, arr = decode_webp(encode_webp(9, 5, px.tobytes(), 4, **kwargs))
        assert C == 3 and arr.tobytes() == px[..., :3].tobytes(), kwargs
    # varied alpha keeps all four channels through the spatial transforms
    px[..., 3] = rng.integers(0, 255, size=(5, 9), dtype=np.uint8)
    data = encode_webp(
        9, 5, px.tobytes(), 4,
        subtract_green=True, predictor=True, cross_color=True, transform_bits=2,
    )
    W, H, C, arr = decode_webp(data)
    assert C == 4 and arr.tobytes() == px.tobytes()


def test_single_color_image_degenerate_codes():
    """A one-color image drives every alphabet to a single symbol — the
    degenerate zero-bit / dummy-padded code paths."""
    raw = bytes([7, 130, 255]) * (12 * 5)
    for kwargs in MODES:
        W, H, C, arr = decode_webp(encode_webp(12, 5, raw, 3, **kwargs))
        assert (W, H, C) == (12, 5, 3)
        assert arr.tobytes() == raw


def test_extreme_dimensions():
    rng = _rng()
    for w, h in [(1, 64), (64, 1), (1, 1)]:
        raw = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8).tobytes()
        W, H, C, arr = decode_webp(encode_webp(w, h, raw, 3, use_lz77=True))
        assert (W, H) == (w, h) and arr.tobytes() == raw


# --------------------------------------------------------- loud rejection


def test_rejects_non_webp_and_lossy_and_extended():
    with pytest.raises(ValueError, match="RIFF"):
        decode_webp(b"GIF89a" + b"\x00" * 40)
    lossy = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8 " + b"\x00" * 12
    with pytest.raises(ValueError, match="lossy"):
        decode_webp(lossy)
    ext = b"RIFF" + struct.pack("<I", 20) + b"WEBPVP8X" + b"\x00" * 12
    with pytest.raises(ValueError, match="VP8X"):
        decode_webp(ext)


def test_rejects_bad_signature_and_truncation():
    good = encode_webp(4, 4, bytes(48), 3)
    bad_sig = bytearray(good)
    bad_sig[20] = 0x2E
    with pytest.raises(ValueError, match="signature"):
        decode_webp(bytes(bad_sig))
    with pytest.raises(ValueError):
        decode_webp(good[: len(good) - 3] if len(good) > 23 else good[:21])


def _wrap_vp8l(bw: _BitWriter) -> bytes:
    payload = b"\x2f" + bw.bytes()
    return (
        b"RIFF"
        + struct.pack("<I", 12 + 8 + len(payload))
        + b"WEBPVP8L"
        + struct.pack("<I", len(payload))
        + payload
    )


def test_transform_headers_parse_and_truncation_stays_loud():
    """Round 11 closed the predictor/cross-color seam: headers announcing
    transform types 0/1 now PARSE (the sub-image read begins) instead of
    raising by name — so a stream truncated right after the header must
    fail as a truncation, never a silent misread."""
    for ttype in (0, 1):
        bw = _BitWriter()
        bw.write(3, 14)  # width-1
        bw.write(3, 14)  # height-1
        bw.write(0, 1)  # no alpha
        bw.write(0, 3)  # version
        bw.write(1, 1)  # transform present
        bw.write(ttype, 2)
        bw.write(2, 3)  # size_bits-2: the sub-image must follow
        with pytest.raises(ValueError, match="truncated"):
            decode_webp(_wrap_vp8l(bw))


def test_duplicate_spatial_transform_rejected():
    """Two predictor headers in one stream stay rejected as duplicate —
    the first parses completely (header + hand-built 1x1 mode
    sub-image), so the guard fires on the SECOND header, proving the new
    parse path re-enters the transform loop correctly."""
    from akkastreamprocessnpmpackagedependencies_spark.functions.webp import (
        _encode_pixel_stream,
    )

    bw = _BitWriter()
    bw.write(3, 14)  # 4x4 image
    bw.write(3, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    bw.write(1, 1)  # transform present
    bw.write(0, 2)  # predictor
    bw.write(0, 3)  # size_bits = 2 -> 1x1 sub-image for a 4x4 image
    _encode_pixel_stream(
        bw, [0xFF000200], cache_bits=0, use_lz77=False, width=1, level0=False
    )
    bw.write(1, 1)  # another transform...
    bw.write(0, 2)  # ...predictor again
    with pytest.raises(ValueError, match="duplicate"):
        decode_webp(_wrap_vp8l(bw))


def test_decodes_distance_plane_codes_hand_rolled():
    """A hand-rolled bitstream whose copy token carries a 2D plane
    distance code (symbols 1..120) decodes through the spec-derived
    neighborhood map — the seam that used to raise. 4x1 image: one
    literal, then copy(len=3, distance VALUE 2 = plane code 2 = offset
    (1,0) = scan-line distance 1) — four identical pixels. Also pins
    the out-of-range guard: distance value 1 (plane code 1 = (0,1) =
    dist 4 at width 4) points past the single decoded pixel and must
    still fail loudly, never wrap."""
    from akkastreamprocessnpmpackagedependencies_spark.functions.webp import (
        _write_prefix_code,
    )

    def stream(dist_prefix_sym: int, len_prefix_sym: int) -> bytes:
        bw = _BitWriter()
        bw.write(3, 14)  # width-1 = 3
        bw.write(0, 14)  # height-1 = 0
        bw.write(0, 1)
        bw.write(0, 3)
        bw.write(0, 1)  # no transforms
        bw.write(0, 1)  # no color cache
        bw.write(0, 1)  # no meta image
        g_enc = _write_prefix_code(
            bw, {100: 1, 256 + len_prefix_sym: 1}, 256 + 24
        )
        r_enc = _write_prefix_code(bw, {10: 1}, 256)
        b_enc = _write_prefix_code(bw, {20: 1}, 256)
        a_enc = _write_prefix_code(bw, {255: 1}, 256)
        d_enc = _write_prefix_code(bw, {dist_prefix_sym: 1}, 40)
        c, l = g_enc[100]
        bw.write(c, l)
        for enc, sym in [(r_enc, 10), (b_enc, 20), (a_enc, 255)]:
            c, l = enc[sym]
            bw.write(c, l)
        c, l = g_enc[256 + len_prefix_sym]  # copy, prefix s -> length s+1
        bw.write(c, l)
        c, l = d_enc[dist_prefix_sym]  # distance prefix s -> value s+1
        bw.write(c, l)
        payload = b"\x2f" + bw.bytes()
        return (
            b"RIFF"
            + struct.pack("<I", 12 + 8 + len(payload))
            + b"WEBPVP8L"
            + struct.pack("<I", len(payload))
            + payload
        )

    # distance value 2 -> plane code 2 -> (1,0) -> dist 1: repeats the
    # literal across the row
    w, h, ch, px = decode_webp(stream(dist_prefix_sym=1, len_prefix_sym=2))
    assert (w, h, ch) == (4, 1, 3)
    assert px.tolist() == [[[10, 100, 20]] * 4]
    # distance value 1 -> plane code 1 -> (0,1) -> dist 4 at width 4:
    # out of range after one pixel — loud, not wrapped
    with pytest.raises(ValueError, match="out of range"):
        decode_webp(stream(dist_prefix_sym=0, len_prefix_sym=2))


def test_plane_code_shape_roundtrips_and_differs():
    """Encoder emission under ``plane_codes=True``: the same raster
    round-trips bit-exactly through the plane-coded LZ77 shape, the
    bytes DIFFER from the direct-distance shape (so the cross-path
    oracle really exercises the new symbols — the encoder's distances
    1 and width both live inside the 120-code neighborhood), and the
    shape composes with the cache and subtract-green like its
    siblings. Narrow widths (< 8) cover the clamp/alias region of the
    neighborhood map."""
    import numpy as np

    rng = np.random.default_rng(20260813)
    for w, h in [(4, 3), (7, 5), (16, 9), (33, 2)]:
        # runs along rows and columns so LZ77 finds dist-1 and dist-w
        # copies; a few random pixels keep the literals alive
        base = np.repeat(
            rng.integers(0, 255, (h, 1, 3), dtype=np.uint8), w, axis=1
        )
        noise = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        mask = rng.random((h, w, 1)) < 0.2
        img = np.where(mask, noise, base).astype(np.uint8)
        # guarantee at least one dist-1 run (solid first row) and one
        # dist-width run (second row repeats it), so a copy token —
        # and with it a distance symbol — always exists to differ on
        img[0, :] = img[0, 0]
        img[1, :] = img[0, :]
        raw = img.tobytes()
        plane = encode_webp(w, h, raw, 3, plane_codes=True)
        direct = encode_webp(w, h, raw, 3, plane_codes=False)
        assert plane != direct, (w, h)
        for blob in (plane, direct):
            gw, gh, gc, got = decode_webp(blob)
            assert (gw, gh, gc) == (w, h, 3)
            assert got.tobytes() == raw, (w, h)
        stacked = encode_webp(
            w, h, raw, 3, plane_codes=True, cache_bits=4, subtract_green=True
        )
        gw, gh, gc, got = decode_webp(stacked)
        assert got.tobytes() == raw, (w, h, "stacked")


def test_encoder_input_validation():
    with pytest.raises(ValueError, match="channels"):
        encode_webp(2, 2, bytes(8), 2)
    with pytest.raises(ValueError, match="mismatch"):
        encode_webp(2, 2, bytes(11), 3)
    with pytest.raises(ValueError, match="range"):
        encode_webp(0, 2, b"", 3)
    with pytest.raises(ValueError, match="palette"):
        encode_webp(2, 1, bytes(range(6)), 3, palette=True, subtract_green=True)
    with pytest.raises(ValueError, match="palette"):
        encode_webp(2, 1, bytes(range(6)), 3, palette=True, predictor=True)
    with pytest.raises(ValueError, match="palette"):
        encode_webp(2, 1, bytes(range(6)), 3, palette=True, cross_color=True)
    with pytest.raises(ValueError, match="transform_bits"):
        encode_webp(2, 1, bytes(range(6)), 3, predictor=True, transform_bits=1)
    with pytest.raises(ValueError, match="transform_bits"):
        encode_webp(2, 1, bytes(range(6)), 3, cross_color=True, transform_bits=10)


def test_predictor_compresses_gradients_and_transforms_do_real_work():
    """The mode chooser must be live, not decorative: on a smooth
    gradient (where every real encoder leans on prediction) the
    predictor stream is dramatically smaller than the literal-entropy
    stream, and on channel-correlated pixels cross-color does not lose
    to plain — while both still round-trip bit-exactly. Guards against a
    regression where the transforms silently degrade to identity
    (mode/delta 0 everywhere) yet round-trips keep passing."""
    h, w = 48, 48
    grad = (
        (np.arange(h)[:, None, None] * 2 + np.arange(w)[None, :, None] * 3)
        % 256
        * np.ones((1, 1, 3))
    ).astype(np.uint8)
    raw = grad.tobytes()
    plain = encode_webp(w, h, raw, 3, use_lz77=True)
    pred = encode_webp(w, h, raw, 3, use_lz77=True, predictor=True)
    assert len(pred) < len(plain) / 4, (len(pred), len(plain))
    assert decode_webp(pred)[3].tobytes() == raw
    rng = _rng()
    g = rng.integers(0, 256, (h, w), dtype=np.uint8)
    corr = np.stack(
        [((g // 2) + 10) & 0xFF, g, ((g // 2) + 50) & 0xFF], axis=-1
    ).astype(np.uint8)
    cc = encode_webp(w, h, corr.tobytes(), 3, cross_color=True)
    base = encode_webp(w, h, corr.tobytes(), 3)
    assert len(cc) <= len(base)
    assert decode_webp(cc)[3].tobytes() == corr.tobytes()


# ------------------------------------------------------------- properties

from hypothesis import given, settings, strategies as st  # noqa: E402


@settings(max_examples=40, deadline=None)
@given(
    w=st.integers(1, 23),
    h=st.integers(1, 17),
    mode=st.integers(0, len(MODES) - 1),
    data=st.data(),
)
def test_property_any_raster_any_mode_roundtrips(w, h, mode, data):
    """Property: EVERY raster round-trips bit-exactly through every
    encode mode — hypothesis explores dimension/pixel/mode corners the
    fixed seeds cannot (single-pixel images, constant planes, near-
    palette images, run boundaries at row edges)."""
    raw = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255), min_size=w * h * 3, max_size=w * h * 3
            )
        )
    )
    W, H, C, arr = decode_webp(encode_webp(w, h, raw, 3, **MODES[mode]))
    assert (W, H, C) == (w, h, 3)
    assert arr.tobytes() == raw


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 19),
    h=st.integers(1, 13),
    ncolors=st.integers(1, 17),
    seed=st.integers(0, 2**31),
)
def test_property_palette_roundtrips_across_bundling_widths(w, h, ncolors, seed):
    """Property: palettized rasters round-trip at every bundling width,
    including 1-color images (degenerate palette) and widths that are
    not multiples of the pixels-per-byte packing."""
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    pal[:, 2] = np.arange(ncolors)  # force distinct entries
    raw = pal[rng.integers(0, ncolors, size=(h, w))].tobytes()
    W, H, C, arr = decode_webp(encode_webp(w, h, raw, 3, palette=True))
    assert (W, H, C) == (w, h, 3)
    assert arr.tobytes() == raw


@settings(max_examples=80, deadline=None)
@given(seed=st.integers(0, 2**31), nbytes=st.integers(0, 200))
def test_fuzz_decoder_never_hangs_or_returns_garbage(seed, nbytes):
    """Fuzz: random bytes behind a valid RIFF/VP8L framing must either
    decode (vanishingly unlikely) or raise ValueError — never hang,
    never raise anything else, never crash the worker. This is the
    robustness contract for a decoder that runs inside executor tasks."""
    rng = np.random.default_rng(seed)
    payload = b"\x2f" + rng.integers(0, 256, size=nbytes, dtype=np.uint8).tobytes()
    data = (
        b"RIFF"
        + struct.pack("<I", 12 + 8 + len(payload))
        + b"WEBPVP8L"
        + struct.pack("<I", len(payload))
        + payload
    )
    try:
        w, h, c, arr = decode_webp(data)
        assert arr.shape == (h, w, c)  # if it decodes, it must be coherent
    except ValueError:
        pass


@settings(max_examples=60, deadline=None)
@given(seed=st.integers(0, 2**31), cut=st.floats(0.05, 0.98))
def test_fuzz_truncated_valid_streams_raise_value_error(seed, cut):
    """Fuzz: a VALID stream cut at any point must raise ValueError (the
    zero-padding a buffered peek sees past the end must not leak a
    silently wrong decode)."""
    rng = np.random.default_rng(seed)
    w, h = int(rng.integers(2, 20)), int(rng.integers(2, 16))
    raw = rng.integers(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    good = encode_webp(w, h, raw, 3, use_lz77=True, cache_bits=4)
    k = max(21, int(len(good) * cut))
    if k >= len(good):
        return
    with pytest.raises(ValueError):
        decode_webp(good[:k])


# ---------------------------------------------------------------------------
# Round 15: TWO-WAY interop with the system libwebp — the independent
# implementation the shared-author round trips could never substitute
# for. The code-length-order transcription bug (symbol 16 ninth, not
# last) survived seven rounds of self-round-trips and died the first
# time these tests could exist; they are permanent so that class of
# bug cannot return.

def _libwebp_or_skip():
    import pytest

    from akkastreamprocessnpmpackagedependencies_spark.functions import webplib

    if not webplib.available():
        pytest.skip("system libwebp not present")
    return webplib


@pytest.mark.parametrize("mode_kwargs", MODES)
def test_interop_my_encodes_decode_in_libwebp(mode_kwargs):
    """Every encoder bitstream shape must be accepted BIT-EXACTLY by
    libwebp's decoder."""
    wl = _libwebp_or_skip()
    rng = np.random.default_rng(53)
    px = rng.integers(0, 256, (16, 20, 3)).astype(np.uint8)
    data = encode_webp(20, 16, px.tobytes(), 3, **mode_kwargs)
    rw, rh, ref = wl.decode_rgb(data)
    assert (rw, rh) == (20, 16)
    assert np.array_equal(ref, px)


def test_interop_real_libwebp_streams_decode_here():
    """Real libwebp lossless encodes (palette transforms, its own
    predictor/cross-color choices, multi-group codes) must decode
    BIT-EXACTLY in the pure decoder across content families."""
    import ctypes

    wl = _libwebp_or_skip()
    lib = ctypes.CDLL("libwebp.so.7")
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    rng = np.random.default_rng(0)
    for i in range(12):
        w = int(rng.integers(4, 70))
        h = int(rng.integers(4, 70))
        if i % 3 == 0:
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        elif i % 3 == 1:
            g = (np.indices((h, w)).sum(0) % 31 * 8).astype(np.uint8)
            img = np.stack([g, g // 2, 255 - g], -1)
        else:
            img = rng.integers(0, 4, (h, w, 3)).astype(np.uint8) * 80
        out = ctypes.c_void_p()
        n = lib.WebPEncodeLosslessRGB(
            np.ascontiguousarray(img).tobytes(), w, h, w * 3, ctypes.byref(out)
        )
        real = ctypes.string_at(out.value, n)
        lib.WebPFree(out)
        dw, dh, dc, arr = decode_webp(real)
        assert (dw, dh) == (w, h), i
        got = arr[:, :, :3] if dc == 4 else arr
        assert np.array_equal(got, img), i
