"""Extended WebP (VP8X + ALPH) — functions/webpx.py.

Conformance has two directions: (1) containers BUILT here (libwebp's
simple API never emits VP8X deliberately, so build_vp8x synthesizes
spec-conformant ones) must decode identically in libwebp — proving the
builder writes real VP8X; (2) containers EMITTED by libwebp's real
RGBA encoder (compressed alpha with whatever stream features it picks:
transforms, LZ77, multi-group codes) must decode identically here —
proving the decoder reads real VP8X. Alpha planes compare bit-exactly;
color planes are covered by the VP8/VP8L conformance suites (RGB
output is not compared against libwebp's fancy upsampler by design —
see functions/vp8.py)."""

from __future__ import annotations

import numpy as np
import pytest

from akkastreamprocessnpmpackagedependencies_spark.functions import webp as W
from akkastreamprocessnpmpackagedependencies_spark.functions import webplib as wl
from akkastreamprocessnpmpackagedependencies_spark.functions import webpx

libwebp = pytest.mark.skipif(
    not wl.available(), reason="system libwebp not present"
)


def _gradient_alpha(h, w):
    return (np.linspace(0, 255, h)[:, None] + np.zeros((1, w))).astype(np.uint8)


@libwebp
@pytest.mark.parametrize("compressed", [False, True])
@pytest.mark.parametrize("alpha_filter", [0, 1, 2, 3])
def test_built_containers_conform_in_libwebp(compressed, alpha_filter):
    """build_vp8x output (lossy color + every ALPH shape) decodes in
    libwebp with a BIT-EXACT alpha plane — and round-trips through our
    own decoder identically."""
    rng = np.random.default_rng(alpha_filter + 10 * compressed)
    img = rng.integers(0, 256, (24, 32, 3)).astype(np.uint8)
    color = wl.encode_rgb(img, 70)
    alpha = (
        _gradient_alpha(24, 32) if compressed
        else rng.integers(0, 256, (24, 32)).astype(np.uint8)
    )
    data = webpx.build_vp8x(
        color, alpha, alpha_compressed=compressed, alpha_filter=alpha_filter
    )
    rw, rh, ref = wl.decode_rgba(data)
    assert (rw, rh) == (32, 24)
    assert np.array_equal(ref[:, :, 3], alpha)
    mw, mh, mc, mine = webpx.decode_webp_extended(data)
    assert (mw, mh, mc) == (32, 24, 4)
    assert np.array_equal(mine[:, :, 3], alpha)


@libwebp
def test_real_encoder_vp8x_alpha_decodes_bit_exactly():
    """libwebp's own RGBA encoder emits VP8X + ALPH with whatever
    stream features it chooses (observed: transform-bearing compressed
    alpha, raw noise alpha); our decoder must reproduce its alpha plane
    bit-exactly across content kinds."""
    rng = np.random.default_rng(77)
    cases = []
    base = rng.integers(0, 256, (24, 32, 4)).astype(np.uint8)
    cases.append(("noise-alpha", base.copy()))
    g = base.copy()
    g[:, :, 3] = _gradient_alpha(24, 32)
    cases.append(("gradient-alpha", g))
    b = base.copy()
    b[:, :, 3] = ((np.indices((24, 32)).sum(0) % 9) * 30).astype(np.uint8)
    cases.append(("banded-alpha", b))
    for name, img in cases:
        data = wl.encode_rgba(img, 70)
        assert data[12:16] == b"VP8X", name
        rw, rh, ref = wl.decode_rgba(data)
        mw, mh, mc, mine = webpx.decode_webp_extended(data)
        assert (mw, mh) == (rw, rh), name
        assert np.array_equal(mine[:, :, 3], ref[:, :, 3]), name


@libwebp
def test_vp8x_lossless_color_with_native_alpha():
    """A VP8X wrapping a VP8L color stream: the lossless color (incl.
    its native alpha channel) decodes through the VP8L codec and the
    RGBA reassembles losslessly."""
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (16, 20, 3)).astype(np.uint8)
    color = W.encode_webp(20, 16, px.tobytes(), 3, use_lz77=True, cache_bits=4)
    data = webpx.build_vp8x(color)
    mw, mh, mc, mine = webpx.decode_webp_extended(data)
    assert (mw, mh, mc) == (20, 16, 4)
    assert np.array_equal(mine[:, :, :3], px)
    assert (mine[:, :, 3] == 255).all()
    rw, rh, ref = wl.decode_rgba(data)
    assert np.array_equal(ref, mine)  # lossless: fancy upsampling n/a


def test_alpha_filters_roundtrip_exact():
    """Forward filter -> unfilter is the identity for every method on
    arbitrary planes (pure property, no libwebp needed)."""
    rng = np.random.default_rng(9)
    for method in range(4):
        a = rng.integers(0, 256, (13, 17)).astype(np.uint8)
        f = webpx._filter_alpha_forward(a, method)
        back = webpx._unfilter_alpha(f, method)
        assert np.array_equal(back, a), method


def test_rejects_animation_and_malformed():
    head = bytes([0x02, 0, 0, 0]) + (31).to_bytes(3, "little") + (23).to_bytes(3, "little")
    riff = b"WEBP" + b"VP8X" + (10).to_bytes(4, "little") + head
    data = b"RIFF" + len(riff).to_bytes(4, "little") + riff
    with pytest.raises(ValueError, match="animated"):
        webpx.decode_webp_extended(data)
    with pytest.raises(ValueError, match="not a WebP"):
        webpx.decode_webp_extended(b"JUNK" * 8)
    # VP8X with no color bitstream
    head2 = bytes([0, 0, 0, 0]) + (31).to_bytes(3, "little") + (23).to_bytes(3, "little")
    riff2 = b"WEBP" + b"VP8X" + (10).to_bytes(4, "little") + head2
    data2 = b"RIFF" + len(riff2).to_bytes(4, "little") + riff2
    with pytest.raises(ValueError, match="no color bitstream"):
        webpx.decode_webp_extended(data2)


def test_alph_rejects_lossy_preprocessing_and_reserved():
    with pytest.raises(ValueError, match="level-reduction"):
        webpx.decode_alph(bytes([0x10]) + b"\x00" * 64, 8, 8)
    with pytest.raises(ValueError, match="reserved compression"):
        webpx.decode_alph(bytes([0x02]) + b"\x00" * 64, 8, 8)
    with pytest.raises(ValueError, match="truncated"):
        webpx.decode_alph(bytes([0x00]) + b"\x00" * 10, 8, 8)


@libwebp
def test_decode_image_real_on_vp8x_payloads(spark):
    """The production dispatch routes VP8X through the pure decoder:
    features match the numpy ground truth of the same decode path."""
    from akkastreamprocessnpmpackagedependencies_spark.operators import multimodal as mm

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (24, 32, 4)).astype(np.uint8)
    img[:, :, 3] = _gradient_alpha(24, 32)
    payload = wl.encode_rgba(img, 70)
    dw, dh, dc, arr = webpx.decode_webp_extended(payload)
    df = spark.createDataFrame(
        [(1, bytearray(payload))], "doc_id long, payload binary"
    )
    r = mm.decode_image_real(df).collect()[0]
    assert (r.width, r.height, r.channels) == (dw, dh, 4)
    assert r.mean_intensity == pytest.approx(
        float(int(arr.sum(dtype=np.int64))) / arr.size, abs=1e-12
    )
