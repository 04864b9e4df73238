"""Pure-Python VP8 keyframe decoder (functions/vp8.py) — conformance
and error-path tests.

The conformance oracle is the system libwebp via ctypes
(functions/webplib.py): REAL bitstreams from a real third-party encoder
across a size/quality/content matrix, with the pure decoder required to
match libwebp's decoder BIT-EXACTLY on the Y/U/V planes. This is
stronger falsification than the shared-author round trips the other
codecs use (functions/webp.py docstring) — an independent
implementation judges every covered path. Tests gate on libwebp
presence the way the PIL-dependent paths do; in this container the
library is present and the tests run.

The synthetic-stream tests use tools/vp8_debug_enc.py (a minimal RFC
6386 §7.3 bool encoder + keyframe builder) to craft streams libwebp
itself accepts, pinning individual features (mode grids, token
categories, skip behavior) that a real encoder only exercises
incidentally."""

from __future__ import annotations

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

from akkastreamprocessnpmpackagedependencies_spark.functions import vp8 as V  # noqa: E402
from akkastreamprocessnpmpackagedependencies_spark.functions import webplib as wl  # noqa: E402

libwebp = pytest.mark.skipif(
    not wl.available(), reason="system libwebp not present"
)


def _conform(img: np.ndarray, quality: float) -> None:
    data = wl.encode_rgb(np.ascontiguousarray(img), quality)
    assert data[12:16] == b"VP8 ", "encoder produced a non-lossy container"
    w, h, ry, ru, rv = wl.decode_yuv(data)
    mw, mh, my_, mu, mv = V.decode_webp_vp8(data)
    assert (mw, mh) == (w, h)
    assert np.array_equal(my_, ry), (
        f"Y plane mismatch (max {np.abs(my_.astype(int) - ry.astype(int)).max()})"
    )
    assert np.array_equal(mu, ru), "U plane mismatch"
    assert np.array_equal(mv, rv), "V plane mismatch"


@libwebp
@pytest.mark.parametrize("quality", [10, 35, 60, 85, 100])
def test_conformance_noise(quality):
    rng = np.random.default_rng(quality)
    img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
    _conform(img, quality)


@libwebp
@pytest.mark.parametrize("quality", [10, 50, 95])
def test_conformance_gradient(quality):
    x = np.linspace(0, 255, 64)[None, :] + np.linspace(0, 80, 48)[:, None]
    img = np.stack([x, x[::-1], 0.4 * x], axis=-1).astype(np.uint8)
    _conform(img, quality)


@libwebp
def test_conformance_structured_and_flat():
    img = ((np.indices((32, 48)).sum(0) % 17) * 15).astype(np.uint8)
    _conform(np.stack([img] * 3, -1), 45)
    _conform(np.full((32, 32, 3), 200, np.uint8), 75)
    _conform(np.full((16, 16, 3), 128, np.uint8), 100)


@libwebp
def test_conformance_non_mb_aligned_sizes():
    """Widths/heights that are not multiples of 16 exercise the padded
    reconstruction + crop path and the right/bottom-edge prediction
    conventions."""
    rng = np.random.default_rng(7)
    for w, h in ((17, 9), (24, 24), (33, 50), (8, 64), (95, 15)):
        img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        _conform(img, 60)


@libwebp
def test_conformance_random_matrix():
    """The broad matrix: random sizes x qualities x content kinds. Every
    case must be bit-exact — a single probability-table byte or
    predictor-formula slip fails here immediately."""
    rng = np.random.default_rng(42)
    for i in range(18):
        w = int(rng.integers(8, 97))
        h = int(rng.integers(8, 81))
        kind = i % 3
        if kind == 0:
            img = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        elif kind == 1:
            x = np.linspace(0, 255, w)[None, :] + np.linspace(0, 80, h)[:, None]
            img = np.stack([x, x[::-1], 0.3 * x], -1).astype(np.uint8)
        else:
            g = ((np.indices((h, w)).sum(0) % 17) * 15).astype(np.uint8)
            img = np.stack([g] * 3, -1)
        _conform(img, [10, 35, 60, 85, 100][i % 5])


@libwebp
def test_rgb_wrapper_deterministic_and_close():
    """decode_webp_vp8_rgb: deterministic integer BT.601 conversion —
    not asserted equal to libwebp's fancy upsampler, but it must land
    near libwebp's RGB (sanity: the planes feeding it are bit-exact)
    and be reproducible."""
    x = np.linspace(0, 255, 48)[None, :] + np.linspace(0, 60, 32)[:, None]
    img = np.stack([x, x[::-1], 0.5 * x], axis=-1).astype(np.uint8)
    data = wl.encode_rgb(np.ascontiguousarray(img), 80)
    w, h, c, rgb1 = V.decode_webp_vp8_rgb(data)
    _, _, _, rgb2 = V.decode_webp_vp8_rgb(data)
    assert (w, h, c) == (48, 32, 3)
    assert np.array_equal(rgb1, rgb2)
    # closeness sanity on smooth content (noise is worst-case for the
    # nearest-neighbor chroma upsampling and not a meaningful bound)
    _, _, ref = wl.decode_rgb(data)
    assert float(np.abs(rgb1.astype(int) - ref.astype(int)).mean()) < 8.0


# ----------------------------------------------------- synthetic streams


def _wrap(payload: bytes) -> bytes:
    import vp8_debug_enc as E

    p = bytearray(payload)
    p[0] |= 0x10  # show_frame
    return E.wrap_webp(bytes(p))


@libwebp
def test_synthetic_mode_grid_matches_libwebp():
    """Every 16x16/chroma mode + random B_PRED grids, all-skip: the
    prediction chains (incl. the i16->submode context mapping) are the
    only signal, judged by libwebp on a stream our own builder wrote."""
    import vp8_debug_enc as E

    rng = np.random.default_rng(11)
    grids = {}

    def per_mb(mx, my):
        if (mx + my) % 2 == 0:
            key = (mx, my)
            if key not in grids:
                grids[key] = rng.integers(0, 10, 16).tolist()
            return (V.B_PRED, int(rng.integers(0, 4)), grids[key], None)
        return (int(rng.integers(0, 4)), int(rng.integers(0, 4)), None, None)

    data = _wrap(E.build_frame(4, 3, 20, per_mb))
    w, h, ry, ru, rv = wl.decode_yuv(data)
    mw, mh, my_, mu, mv = V.decode_webp_vp8(data)
    assert np.array_equal(my_, ry) and np.array_equal(mu, ru) and np.array_equal(mv, rv)


@libwebp
def test_synthetic_token_categories_match_libwebp():
    """Every DCT token category (literals 1-4, cat1-cat6 incl. a large
    cat6 value) through the Y2/Y/chroma block types, across a 2x2 MB
    grid with the cross-MB non-zero contexts tracked exactly as the
    spec requires (the writer must model them or the probability
    selection desynchronizes — itself a regression this test guards)."""
    import vp8_debug_enc as E

    zeros = [0] * 16
    # dequantized magnitudes must stay inside int16 (the reference
    # decoder's coefficient type; real encoders never exceed it)
    big = [0, 1, -2, 3, -4, 5, -9, 15, -25, 40, -80, 120, -300, 0, 0, 1]
    uvl = [6, -1, 0, 2, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, -34]
    probs = V._DEFAULT_COEFF_PROBS
    mb_w = mb_h = 2
    # cross-MB nz context state (mirrors _reconstruct's bookkeeping)
    st = {
        "above_y": [[0] * 4 for _ in range(mb_w)],
        "above_u": [[0] * 2 for _ in range(mb_w)],
        "above_v": [[0] * 2 for _ in range(mb_w)],
        "above_y2": [0] * mb_w,
        "left_y": [0] * 4, "left_u": [0] * 2, "left_v": [0] * 2,
        "left_y2": 0, "col": 0,
    }

    def tw_for(mx, my, with_values):
        def tw(enc):
            if st["col"] != mx and mx == 0:  # new MB row
                st["left_y"] = [0] * 4
                st["left_u"] = [0] * 2
                st["left_v"] = [0] * 2
                st["left_y2"] = 0
            st["col"] = mx
            y2 = [7] + [0] * 15 if with_values else zeros
            ctx = st["above_y2"][mx] + st["left_y2"]
            E.TokenWriter(enc, probs[1]).block(y2, 0, ctx)
            nz2 = 1 if any(y2) else 0
            st["above_y2"][mx] = st["left_y2"] = nz2
            nz = [0] * 16
            for sb in range(16):
                lev = list(big) if (with_values and sb in (0, 5, 10, 15)) else list(zeros)
                lev[0] = 0  # DC rides in Y2 for i16 macroblocks
                r, c = sb >> 2, sb & 3
                actx = nz[sb - 4] if r > 0 else st["above_y"][mx][c]
                lctx = nz[sb - 1] if c > 0 else st["left_y"][r]
                E.TokenWriter(enc, probs[0]).block(lev, 1, actx + lctx)
                nz[sb] = 1 if any(lev[1:]) else 0
            st["above_y"][mx] = nz[12:16]
            st["left_y"] = [nz[3], nz[7], nz[11], nz[15]]
            for pl, (akey, lkey) in ((0, ("above_u", "left_u")),
                                     (1, ("above_v", "left_v"))):
                cnz = [0] * 4
                for sb in range(4):
                    lev = list(uvl) if (with_values and sb == 0) else zeros
                    r, c = sb >> 1, sb & 1
                    actx = cnz[sb - 2] if r > 0 else st[akey][mx][c]
                    lctx = cnz[sb - 1] if c > 0 else st[lkey][r]
                    E.TokenWriter(enc, probs[2]).block(lev, 0, actx + lctx)
                    cnz[sb] = 1 if any(lev) else 0
                st[akey][mx] = [cnz[2], cnz[3]]
                st[lkey] = [cnz[1], cnz[3]]
        return tw

    def per_mb(mx, my):
        return (V.TM_PRED, V.V_PRED, None,
                tw_for(mx, my, (mx + my) % 2 == 0))

    data = _wrap(E.build_frame(mb_w, mb_h, 40, per_mb))
    w, h, ry, ru, rv = wl.decode_yuv(data)
    mw, mh, my_, mu, mv = V.decode_webp_vp8(data)
    assert np.array_equal(my_, ry) and np.array_equal(mu, ru) and np.array_equal(mv, mv) and np.array_equal(mv, rv)


def test_bool_codec_roundtrip_randomized():
    """The §7.3 encoder and §7.2 decoder are independent ports; random
    (prob, bit) sequences must round-trip exactly (the conformance
    tests above anchor the PAIR to libwebp's reading)."""
    import vp8_debug_enc as E

    rng = np.random.default_rng(13)
    for trial in range(20):
        seq = [
            (int(rng.integers(1, 256)), int(rng.integers(0, 2)))
            for _ in range(int(rng.integers(1, 400)))
        ]
        enc = E.BoolEncoder()
        for prob, bit in seq:
            enc.put(prob, bit)
        data = enc.flush()
        bd = V._BoolDecoder(data)
        for prob, bit in seq:
            assert bd.get_bool(prob) == bit, (trial, prob, bit)


# --------------------------------------------------------- error paths


def test_rejects_non_keyframe():
    # frame tag with frame_type bit set (interframe)
    bad = bytes([0x01, 0x00, 0x00]) + b"\x9d\x01\x2a" + b"\x10\x00\x10\x00" + b"\x00" * 8
    with pytest.raises(ValueError, match="key frame"):
        V.decode_vp8(bad)


def test_rejects_bad_start_code_and_truncation():
    with pytest.raises(ValueError, match="start code"):
        V.decode_vp8(bytes([0x00, 0x00, 0x00]) + b"\xff\x01\x2a" + b"\x10\x00\x10\x00" + b"\x00" * 4)
    with pytest.raises(ValueError, match="shorter"):
        V.decode_vp8(b"\x00\x00")
    # declared first-partition size overruns the payload
    tag = (1000 << 5)
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    with pytest.raises(ValueError, match="overruns"):
        V.decode_vp8(hdr + b"\x9d\x01\x2a" + b"\x10\x00\x10\x00" + b"\x00" * 4)


def test_rejects_vp8x_container():
    riff = b"WEBP" + b"VP8X" + (10).to_bytes(4, "little") + b"\x00" * 10
    data = b"RIFF" + len(riff).to_bytes(4, "little") + riff
    with pytest.raises(ValueError, match="VP8X"):
        V.decode_webp_vp8(data)


def test_rejects_zero_dimension():
    tag = 1 << 5
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    with pytest.raises(ValueError, match="zero"):
        V.decode_vp8(hdr + b"\x9d\x01\x2a" + b"\x00\x00\x10\x00" + b"\x00" * 4)


@libwebp
def test_corrupt_payload_differs_or_raises_loudly():
    """Flipping header-region bytes must not be silently accepted as the
    original image: either a loud ValueError or a (deterministically)
    different decode."""
    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    data = bytearray(wl.encode_rgb(img, 70))
    _, _, y0, _, _ = V.decode_webp_vp8(bytes(data))
    data[25] ^= 0xFF  # inside the first partition
    try:
        _, _, y1, _, _ = V.decode_webp_vp8(bytes(data))
        assert not np.array_equal(y0, y1)
    except ValueError:
        pass


@libwebp
def test_adversarial_int16_coefficient_wrap_matches_reference():
    """A syntactically valid stream whose dequantized coefficient
    overflows int16 (cat6 level x large quantizer): the reference
    decoder's int16 coefficient buffer wraps, and bit-exactness
    requires reproducing that wrap rather than keeping full
    precision."""
    import vp8_debug_enc as E

    zeros = [0] * 16
    probs = V._DEFAULT_COEFF_PROBS

    def tw(enc):
        E.TokenWriter(enc, probs[1]).block([7] + [0] * 15, 0, 0)
        nz = [0] * 16
        for sb in range(16):
            lev = (
                [0, 1, -2, 3, -4, 5, -9, 15, -25, 40, -80, 300, -1500, 0, 0, 1]
                if sb == 0 else zeros
            )
            r, c = sb >> 2, sb & 3
            E.TokenWriter(enc, probs[0]).block(
                lev, 1, (nz[sb - 4] if r > 0 else 0) + (nz[sb - 1] if c > 0 else 0)
            )
            nz[sb] = 1 if any(lev[1:]) else 0
        for sb in range(8):
            E.TokenWriter(enc, probs[2]).block(zeros, 0, 1 if sb in (1, 5) else 0)

    def per_mb(mx, my):
        return (V.TM_PRED, V.V_PRED, None, tw)

    data = _wrap(E.build_frame(1, 1, 40, per_mb))
    w, h, ry, ru, rv = wl.decode_yuv(data)
    mw, mh, my_, mu, mv = V.decode_webp_vp8(data)
    assert np.array_equal(my_, ry) and np.array_equal(mu, ru) and np.array_equal(mv, rv)
