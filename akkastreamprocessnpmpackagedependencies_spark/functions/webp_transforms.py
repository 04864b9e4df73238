"""VP8L spatial transforms: PREDICTOR and CROSS-COLOR, forward and
inverse (public spec: RFC 9649 / the WebP lossless bitstream spec §4;
reference pixel semantics cross-checked against the spec's pseudocode).

DELIBERATELY NOT imported by ``functions/webp.py`` yet: the four decode
queries hash that module whole (measured in round 10 — even a pure
append moves exactly their fingerprints), and the round-10 evidence
window has no slot for them; the recorded round-11 rotation plan
(``__spark_entry__._PRIORITY`` tail) reserves slots so the wiring —
decoder accepting transform types 0/1 via these inverses, encoder
optionally emitting them for the cross-path identity oracle — lands
then. Until wired, this module carries the full transform logic behind
its own round-trip test suite (``tests/test_webp_transforms.py``):
forward(image) -> inverse == identity for arbitrary images, block
sizes, and mode/delta sub-images, which is the falsifiability pattern
the codec family already uses (a bug must exist identically in two
unrelated code shapes to hide).

Pixel model matches ``webp.py``: a row-major list of uint32 ARGB ints.
Transform sub-images (per-block predictor modes / color-transform
elements) are row-major lists over the ceil(w/2^bits) x ceil(h/2^bits)
block grid, encoded exactly as the bitstream carries them (mode in the
GREEN channel; cross-color deltas in blue/green/red).

No reference analogue (the reference is text-only); this extends the
multimodal north-star requirement.
"""

from __future__ import annotations

# ------------------------------------------------------------ helpers

_BLACK = 0xFF000000


def _chans(p: int) -> tuple[int, int, int, int]:
    return (p >> 24) & 0xFF, (p >> 16) & 0xFF, (p >> 8) & 0xFF, p & 0xFF


def _pack(a: int, r: int, g: int, b: int) -> int:
    return (a << 24) | (r << 16) | (g << 8) | b


def _avg2(x: int, y: int) -> int:
    """Per-channel (x + y) >> 1 — the spec's Average2."""
    a1, r1, g1, b1 = _chans(x)
    a2, r2, g2, b2 = _chans(y)
    return _pack((a1 + a2) >> 1, (r1 + r2) >> 1, (g1 + g2) >> 1, (b1 + b2) >> 1)


def _clamp(v: int) -> int:
    return 0 if v < 0 else 255 if v > 255 else v


def _select(t: int, l: int, tl: int) -> int:  # noqa: E741 - spec names
    """The spec's Select: the prediction is L + T - TL per channel; return
    whichever of T / L is Manhattan-closer to it, T on ties (the spec's
    ``pa_minus_pb <= 0`` branch with a = T)."""
    dist_t = 0
    dist_l = 0
    for (ct, cl, ctl) in zip(_chans(t), _chans(l), _chans(tl)):
        p = cl + ct - ctl
        dist_t += abs(p - ct)
        dist_l += abs(p - cl)
    return t if dist_t <= dist_l else l


def _clamp_add_sub_full(l: int, t: int, tl: int) -> int:  # noqa: E741
    """Per channel Clamp(L + T - TL)."""
    out = []
    for (cl, ct, ctl) in zip(_chans(l), _chans(t), _chans(tl)):
        out.append(_clamp(cl + ct - ctl))
    return _pack(*out)


def _clamp_add_sub_half(l: int, t: int, tl: int) -> int:  # noqa: E741
    """Per channel Clamp(ave + (ave - TL) / 2) with ave = (L + T) >> 1 and
    C-style truncation-toward-zero division of the possibly-negative
    difference (the spec's AddSubtractComponentHalf)."""
    ave = _avg2(l, t)
    out = []
    for (ca, ctl) in zip(_chans(ave), _chans(tl)):
        d = ca - ctl
        half = d // 2 if d >= 0 else -((-d) // 2)
        out.append(_clamp(ca + half))
    return _pack(*out)


def predict(mode: int, l: int, t: int, tl: int, tr: int) -> int:  # noqa: E741
    """The 14 VP8L predictors over the (left, top, top-left, top-right)
    neighborhood. Edge handling (which neighbor values to feed, and the
    forced modes on the first row/column) is the caller's job — see
    ``_neighbors``."""
    if mode == 0:
        return _BLACK
    if mode == 1:
        return l
    if mode == 2:
        return t
    if mode == 3:
        return tr
    if mode == 4:
        return tl
    if mode == 5:
        return _avg2(_avg2(l, tr), t)
    if mode == 6:
        return _avg2(l, tl)
    if mode == 7:
        return _avg2(l, t)
    if mode == 8:
        return _avg2(tl, t)
    if mode == 9:
        return _avg2(t, tr)
    if mode == 10:
        return _avg2(_avg2(l, tl), _avg2(t, tr))
    if mode == 11:
        return _select(t, l, tl)
    if mode == 12:
        return _clamp_add_sub_full(l, t, tl)
    if mode == 13:
        return _clamp_add_sub_half(l, t, tl)
    raise ValueError(f"VP8L predictor mode {mode} out of range 0..13")


def _neighbors(out: list[int], x: int, y: int, w: int) -> tuple[int, int, int, int]:
    """(L, T, TL, TR) of pixel (x, y) over the ALREADY-RECONSTRUCTED
    buffer ``out``. Spec edge rule: the top-right neighbor of the
    rightmost column is the FIRST pixel of the CURRENT row (the
    bitstream is one contiguous scan, so 'up and to the right' wraps to
    the pixel decoded w-1 positions ago), already reconstructed at that
    point in the scan."""
    row = y * w
    l = out[row + x - 1]  # noqa: E741
    t = out[row - w + x]
    tl = out[row - w + x - 1]
    tr = out[row + 0] if x == w - 1 else out[row - w + x + 1]
    return l, t, tl, tr


def _sub_px(actual: int, pred: int) -> int:
    a1, r1, g1, b1 = _chans(actual)
    a2, r2, g2, b2 = _chans(pred)
    return _pack((a1 - a2) & 0xFF, (r1 - r2) & 0xFF, (g1 - g2) & 0xFF, (b1 - b2) & 0xFF)


def _add_px(residual: int, pred: int) -> int:
    a1, r1, g1, b1 = _chans(residual)
    a2, r2, g2, b2 = _chans(pred)
    return _pack((a1 + a2) & 0xFF, (r1 + r2) & 0xFF, (g1 + g2) & 0xFF, (b1 + b2) & 0xFF)


def _block_index(x: int, y: int, w: int, size_bits: int) -> int:
    bw = (w + (1 << size_bits) - 1) >> size_bits
    return (y >> size_bits) * bw + (x >> size_bits)


# ------------------------------------------------------- predictor

def predictor_inverse(
    pixels: list[int], w: int, h: int, modes: list[int], size_bits: int
) -> list[int]:
    """Reconstruct an image from predictor residuals: per pixel, add
    (mod 256 per channel) the predictor of its block's mode — carried in
    the GREEN channel of the mode sub-image, as the bitstream stores it —
    over the already-reconstructed neighborhood."""
    out: list[int] = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if y == 0 and x == 0:
                pred = _BLACK
            elif y == 0:
                pred = out[i - 1]
            elif x == 0:
                pred = out[i - w]
            else:
                mode = (modes[_block_index(x, y, w, size_bits)] >> 8) & 0xFF
                pred = predict(mode, *_neighbors(out, x, y, w))
            out[i] = _add_px(pixels[i], pred)
    return out


def predictor_forward(
    pixels: list[int], w: int, h: int, modes: list[int], size_bits: int
) -> list[int]:
    """The encoder side: per-pixel residual = actual - predicted (mod 256
    per channel), predicting over the ACTUAL pixels (which is exactly
    what the decoder will have reconstructed when it reaches each
    pixel). ``modes`` is any mode sub-image — the round-trip identity
    holds for every choice, which is what the tests exploit."""
    out: list[int] = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            if y == 0 and x == 0:
                pred = _BLACK
            elif y == 0:
                pred = pixels[i - 1]
            elif x == 0:
                pred = pixels[i - w]
            else:
                mode = (modes[_block_index(x, y, w, size_bits)] >> 8) & 0xFF
                pred = predict(mode, *_neighbors(pixels, x, y, w))
            out[i] = _sub_px(pixels[i], pred)
    return out


def choose_predictor_modes(
    pixels: list[int], w: int, h: int, size_bits: int
) -> list[int]:
    """A simple encoder-side mode chooser: per block, the mode minimizing
    the summed absolute residual (ties to the lower mode — deterministic).
    Returns a mode sub-image with the winning mode in the green channel,
    alpha 0xff, matching the bitstream encoding."""
    bw = (w + (1 << size_bits) - 1) >> size_bits
    bh = (h + (1 << size_bits) - 1) >> size_bits
    best = [0xFF000000] * (bw * bh)
    for by in range(bh):
        for bx in range(bw):
            best_mode, best_cost = 0, None
            for mode in range(14):
                cost = 0
                for y in range(by << size_bits, min((by + 1) << size_bits, h)):
                    for x in range(bx << size_bits, min((bx + 1) << size_bits, w)):
                        if y == 0 and x == 0:
                            pred = _BLACK
                        elif y == 0:
                            pred = pixels[y * w + x - 1]
                        elif x == 0:
                            pred = pixels[(y - 1) * w + x]
                        else:
                            pred = predict(mode, *_neighbors(pixels, x, y, w))
                        for ca, cp in zip(
                            _chans(pixels[y * w + x]), _chans(pred)
                        ):
                            d = (ca - cp) & 0xFF
                            cost += min(d, 256 - d)
                if best_cost is None or cost < best_cost:
                    best_mode, best_cost = mode, cost
            best[by * bw + bx] = 0xFF000000 | (best_mode << 8)
    return best


# ------------------------------------------------------ cross-color

def _i8(v: int) -> int:
    """Reinterpret a byte as signed int8 — both the stored deltas and the
    color values they multiply are signed in the spec's
    ColorTransformDelta."""
    return v - 256 if v >= 128 else v


def _ct_delta(t: int, c: int) -> int:
    """The spec's ColorTransformDelta: (int8)t * (int8)c >> 5 with an
    ARITHMETIC shift (Python's >> on negative ints floors, matching)."""
    return (_i8(t & 0xFF) * _i8(c & 0xFF)) >> 5


def _cte(ct_pixel: int) -> tuple[int, int, int]:
    """Unpack a ColorTransformElement from its sub-image pixel:
    green_to_red in the BLUE byte, green_to_blue in the GREEN byte,
    red_to_blue in the RED byte."""
    return ct_pixel & 0xFF, (ct_pixel >> 8) & 0xFF, (ct_pixel >> 16) & 0xFF


def cross_color_inverse(
    pixels: list[int], w: int, h: int, ctes: list[int], size_bits: int
) -> list[int]:
    """Undo the cross-color transform: red regains its green-scaled delta,
    then blue regains its green-scaled delta PLUS its delta scaled by the
    just-reconstructed red — the ordering the spec mandates (the forward
    side subtracted the ORIGINAL red's contribution)."""
    out: list[int] = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            g2r, g2b, r2b = _cte(ctes[_block_index(x, y, w, size_bits)])
            a, r, g, b = _chans(pixels[i])
            r = (r + _ct_delta(g2r, g)) & 0xFF
            b = (b + _ct_delta(g2b, g) + _ct_delta(r2b, r)) & 0xFF
            out[i] = _pack(a, r, g, b)
    return out


def cross_color_forward(
    pixels: list[int], w: int, h: int, ctes: list[int], size_bits: int
) -> list[int]:
    """Apply the cross-color transform: subtract from red its green-scaled
    delta and from blue its green- and ORIGINAL-red-scaled deltas. Any
    delta sub-image round-trips (the identities are per-byte modular),
    which is what the tests exploit."""
    out: list[int] = [0] * (w * h)
    for y in range(h):
        for x in range(w):
            i = y * w + x
            g2r, g2b, r2b = _cte(ctes[_block_index(x, y, w, size_bits)])
            a, r, g, b = _chans(pixels[i])
            new_r = (r - _ct_delta(g2r, g)) & 0xFF
            new_b = (b - _ct_delta(g2b, g) - _ct_delta(r2b, r)) & 0xFF
            out[i] = _pack(a, new_r, g, new_b)
    return out
