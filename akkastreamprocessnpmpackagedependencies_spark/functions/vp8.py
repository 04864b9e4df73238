"""Pure-Python VP8 keyframe decoder (lossy WebP) — RFC 6386.

Round 15 closes the last codec seam: lossy "VP8 " WebP payloads used to
route to PIL (absent in this container) with a documented
NotImplementedError. This module decodes VP8 KEY frames — the only
frame type a still-image WebP carries — end to end with nothing beyond
numpy: boolean arithmetic decoder (§7), frame/header parsing (§9),
segment & loop-filter feature parsing (§9.2-9.4, §10), up to 8 DCT
coefficient partitions (§9.5), full token decoding with the
context-dependent probability model and per-frame updates (§13),
dequantization with per-segment quantizers (§9.6, §14.1), the exact
integer inverse DCT/WHT (§14.3-14.4), all intra prediction modes —
16x16 Y, 8x8 chroma, and the ten 4x4 B_PRED subblock modes with their
edge rules (§12) — and both loop filters (simple + normal, §15).

Interframes are out of scope BY CONSTRUCTION for still images; a
non-keyframe raises ValueError loudly.

Falsifiability (stronger than the other codecs could get): the VP8L /
JPEG / PNG codecs validate by shared-author round-trips through
materially different code paths, because no independent implementation
ships in-container. For VP8 one DOES: the system libwebp
(functions/webplib.py). tests/test_vp8.py encodes real bitstreams with
libwebp's encoder across a quality/size/content matrix and requires
THIS decoder's Y/U/V output to agree BIT-EXACTLY with libwebp's
decoder — spec-level conformance on every covered path, not
self-consistency. The empirical constant tables ride in
``vp8_tables.py`` (recovered from the same public library by
tools/extract_vp8_tables.py and pinned by those bit-exact tests).

The decoder returns the raw 4:2:0 planes; RFC 6386 defines output in
YUV space and deliberately does not standardize RGB conversion. The
``decode_vp8_rgb`` wrapper applies the fixed-point BT.601 full-range
conversion documented there for feature extraction — deterministic
across environments, NOT guaranteed identical to libwebp's fancy
upsampler (which is why conformance tests compare YUV).

No reference analogue (the reference is text-only: Main.scala:20-24);
this extends the multimodal north-star requirement.
"""

from __future__ import annotations

import numpy as np

from . import vp8_tables as _t

# ------------------------------------------------------------ tables

# fixed keyframe mode probabilities (§11.3, §11.5 — these four/three
# values are part of the bitstream spec, not per-frame data)
_KF_YMODE_PROB = (145, 156, 163, 128)
_KF_UV_MODE_PROB = (142, 114, 183)

# intra y modes (§11.2): B_PRED decodes per-subblock modes
DC_PRED, V_PRED, H_PRED, TM_PRED, B_PRED = range(5)
# 4x4 subblock modes (§11.2)
(B_DC_PRED, B_TM_PRED, B_VE_PRED, B_HE_PRED, B_LD_PRED,
 B_RD_PRED, B_VR_PRED, B_VL_PRED, B_HD_PRED, B_HU_PRED) = range(10)

# token trees (§11.3, §11.5, §13.2) in the RFC's tree-array encoding:
# even entries = take-bool-0 branch, odd = take-bool-1; negative = leaf
_KF_YMODE_TREE = (-B_PRED, 2, 4, 6, -DC_PRED, -V_PRED, -H_PRED, -TM_PRED)
_UV_MODE_TREE = (-DC_PRED, 2, -V_PRED, 4, -H_PRED, -TM_PRED)
_BMODE_TREE = (
    -B_DC_PRED, 2,
    -B_TM_PRED, 4,
    -B_VE_PRED, 6,
    8, 12,
    -B_HE_PRED, 10,
    -B_RD_PRED, -B_VR_PRED,
    -B_LD_PRED, 14,
    -B_VL_PRED, 16,
    -B_HD_PRED, -B_HU_PRED,
)
# DCT token alphabet (§13.1)
_ZERO_TOKEN, _ONE_TOKEN, _TWO_TOKEN, _THREE_TOKEN, _FOUR_TOKEN = range(5)
_CAT1, _CAT2, _CAT3, _CAT4, _CAT5, _CAT6 = range(5, 11)
_EOB = 11
_COEFF_TREE = (
    -_EOB, 2,
    -_ZERO_TOKEN, 4,
    -_ONE_TOKEN, 6,
    8, 12,
    -_TWO_TOKEN, 10,
    -_THREE_TOKEN, -_FOUR_TOKEN,
    14, 16,
    -_CAT1, -_CAT2,
    18, 20,
    -_CAT3, -_CAT4,
    -_CAT5, -_CAT6,
)
_CAT_BASE = (5, 7, 11, 19, 35, 67)  # first value of each category (§13.2)

_BANDS = _t.COEFF_BANDS
_ZIGZAG = _t.ZIGZAG


def _nest(flat, *dims):
    """Row-major reshape of a flat python list into nested lists."""
    if len(dims) == 1:
        return list(flat)
    step = 1
    for d in dims[1:]:
        step *= d
    return [_nest(flat[i * step : (i + 1) * step], *dims[1:]) for i in range(dims[0])]


_DEFAULT_COEFF_PROBS = _nest(_t.DEFAULT_COEFF_PROBS, 4, 8, 3, 11)
_COEFF_UPDATE_PROBS = _nest(_t.COEFF_UPDATE_PROBS, 4, 8, 3, 11)
_KF_B_MODE_PROBS = _nest(_t.KF_B_MODE_PROBS, 10, 10, 9)


# ----------------------------------------------------- boolean decoder


class _BoolDecoder:
    """RFC 6386 §7.2 boolean arithmetic decoder, ported verbatim from
    the spec's reference C (value window = 16 bits, byte-at-a-time
    refill). Reads past the partition end yield zero bytes — the spec's
    tolerated over-read — but the consumed-byte accounting stays exact
    so truncation inside REQUIRED data still surfaces as garbage caught
    by the conformance checks, and container-level size checks reject
    short partitions before decode starts."""

    __slots__ = ("_d", "_n", "_pos", "value", "range", "bit_count")

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._n = len(data)
        b0 = data[0] if self._n > 0 else 0
        b1 = data[1] if self._n > 1 else 0
        self.value = (b0 << 8) | b1
        self._pos = 2
        self.range = 255
        self.bit_count = 0

    def get_bool(self, probability: int) -> int:
        split = 1 + (((self.range - 1) * probability) >> 8)
        big = split << 8
        if self.value >= big:
            ret = 1
            self.range -= split
            self.value -= big
        else:
            ret = 0
            self.range = split
        while self.range < 128:
            self.value <<= 1
            self.range <<= 1
            self.bit_count += 1
            if self.bit_count == 8:
                self.bit_count = 0
                b = self._d[self._pos] if self._pos < self._n else 0
                self._pos += 1
                self.value |= b
        return ret

    def get_literal(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.get_bool(128)
        return v

    def get_signed(self, n: int) -> int:
        v = self.get_literal(n)
        return -v if self.get_bool(128) else v

    def get_tree(self, tree, probs, start: int = 0) -> int:
        i = start
        while True:
            i = tree[i + self.get_bool(probs[i >> 1])]
            if i <= 0:
                return -i


# ------------------------------------------------------ frame headers


class _Segment:
    __slots__ = ("quant_idx", "lf_level")

    def __init__(self) -> None:
        self.quant_idx = 0
        self.lf_level = 0


class _FrameHeader:
    """Parsed first-partition state shared by the MB loop."""

    __slots__ = (
        "width", "height", "mb_w", "mb_h",
        "seg_enabled", "seg_update_map", "seg_absolute", "segments",
        "seg_tree_probs",
        "filter_type", "filter_level", "sharpness",
        "lf_delta_enabled", "ref_lf_deltas", "mode_lf_deltas",
        "y_ac_qi", "y_dc_delta", "y2_dc_delta", "y2_ac_delta",
        "uv_dc_delta", "uv_ac_delta",
        "coeff_probs", "use_skip", "skip_prob",
    )


def _clamp_q(v: int) -> int:
    return 0 if v < 0 else (127 if v > 127 else v)


class _QuantFactors:
    """Per-segment dequantization factors (§9.6, §14.1)."""

    __slots__ = ("y1", "y2", "uv")

    def __init__(self, hdr: _FrameHeader, seg_id: int) -> None:
        if hdr.seg_enabled:
            base = hdr.segments[seg_id].quant_idx
            q = base if hdr.seg_absolute else hdr.y_ac_qi + base
        else:
            q = hdr.y_ac_qi
        q = _clamp_q(q)
        dcq = _t.DC_QLOOKUP
        acq = _t.AC_QLOOKUP
        y1dc = dcq[_clamp_q(q + hdr.y_dc_delta)]
        y1ac = acq[q]
        y2dc = dcq[_clamp_q(q + hdr.y2_dc_delta)] * 2
        y2ac = acq[_clamp_q(q + hdr.y2_ac_delta)] * 155 // 100
        if y2ac < 8:
            y2ac = 8
        uvdc = dcq[_clamp_q(q + hdr.uv_dc_delta)]
        if uvdc > 117:
            uvdc = 117
        uvac = acq[_clamp_q(q + hdr.uv_ac_delta)]
        self.y1 = (y1dc, y1ac)
        self.y2 = (y2dc, y2ac)
        self.uv = (uvdc, uvac)


def _parse_segmentation(bd: _BoolDecoder, hdr: _FrameHeader) -> None:
    """§9.3: segmentation feature data + optional per-MB map probs."""
    hdr.seg_update_map = bd.get_bool(128)
    update_data = bd.get_bool(128)
    if update_data:
        hdr.seg_absolute = bool(bd.get_bool(128))
        for s in hdr.segments:
            s.quant_idx = bd.get_signed(7) if bd.get_bool(128) else 0
        for s in hdr.segments:
            s.lf_level = bd.get_signed(6) if bd.get_bool(128) else 0
    if hdr.seg_update_map:
        hdr.seg_tree_probs = [
            bd.get_literal(8) if bd.get_bool(128) else 255 for _ in range(3)
        ]


def _parse_filter_header(bd: _BoolDecoder, hdr: _FrameHeader) -> None:
    """§9.4 loop filter type/level/sharpness + §9.4/§10 delta adjustments."""
    hdr.filter_type = bd.get_bool(128)  # 1 = simple
    hdr.filter_level = bd.get_literal(6)
    hdr.sharpness = bd.get_literal(3)
    hdr.lf_delta_enabled = bool(bd.get_bool(128))
    hdr.ref_lf_deltas = [0, 0, 0, 0]
    hdr.mode_lf_deltas = [0, 0, 0, 0]
    if hdr.lf_delta_enabled and bd.get_bool(128):  # mode_ref_lf_delta_update
        for i in range(4):
            if bd.get_bool(128):
                hdr.ref_lf_deltas[i] = bd.get_signed(6)
        for i in range(4):
            if bd.get_bool(128):
                hdr.mode_lf_deltas[i] = bd.get_signed(6)


def _parse_quant_header(bd: _BoolDecoder, hdr: _FrameHeader) -> None:
    """§9.6 quantizer indices: base + five optional deltas."""
    hdr.y_ac_qi = bd.get_literal(7)
    hdr.y_dc_delta = bd.get_signed(4) if bd.get_bool(128) else 0
    hdr.y2_dc_delta = bd.get_signed(4) if bd.get_bool(128) else 0
    hdr.y2_ac_delta = bd.get_signed(4) if bd.get_bool(128) else 0
    hdr.uv_dc_delta = bd.get_signed(4) if bd.get_bool(128) else 0
    hdr.uv_ac_delta = bd.get_signed(4) if bd.get_bool(128) else 0


def _parse_token_prob_updates(bd: _BoolDecoder, hdr: _FrameHeader) -> None:
    """§13.4: per-frame coefficient probability updates."""
    probs = hdr.coeff_probs
    upd = _COEFF_UPDATE_PROBS
    for t in range(4):
        for b in range(8):
            for c in range(3):
                row_u = upd[t][b][c]
                row_p = probs[t][b][c]
                for p in range(11):
                    if bd.get_bool(row_u[p]):
                        row_p[p] = bd.get_literal(8)


def parse_headers(data: bytes):
    """Parse the uncompressed chunk header (§9.1) + the first-partition
    frame header of a keyframe. ``data`` is the raw "VP8 " chunk
    payload. Returns (hdr, bd_first, partitions) where ``bd_first`` is
    positioned at the start of the per-MB data and ``partitions`` is
    the list of coefficient-partition _BoolDecoders."""
    if len(data) < 10:
        raise ValueError("VP8: payload shorter than the frame header")
    tag = data[0] | (data[1] << 8) | (data[2] << 16)
    frame_type = tag & 1
    version = (tag >> 1) & 7
    first_part_size = tag >> 5
    if frame_type != 0:
        raise ValueError(
            "VP8: not a key frame — interframes cannot occur in a "
            "still-image WebP and are out of scope (RFC 6386 §9.1)"
        )
    if version > 3:
        raise ValueError(f"VP8: reserved version {version}")
    if data[3:6] != b"\x9d\x01\x2a":
        raise ValueError("VP8: bad keyframe start code")
    w_code = data[6] | (data[7] << 8)
    h_code = data[8] | (data[9] << 8)
    width, height = w_code & 0x3FFF, h_code & 0x3FFF
    if width == 0 or height == 0:
        raise ValueError("VP8: zero frame dimension")
    body = data[10:]
    if first_part_size > len(body):
        raise ValueError("VP8: first partition overruns the payload")
    bd = _BoolDecoder(body[:first_part_size])

    hdr = _FrameHeader()
    hdr.width, hdr.height = width, height
    hdr.mb_w = (width + 15) >> 4
    hdr.mb_h = (height + 15) >> 4
    color_space = bd.get_bool(128)
    if color_space != 0:
        raise ValueError("VP8: reserved color space bit set")
    bd.get_bool(128)  # clamping_type: both values decode identically here
    hdr.segments = [_Segment() for _ in range(4)]
    hdr.seg_tree_probs = [255, 255, 255]
    hdr.seg_absolute = False
    hdr.seg_update_map = 0
    hdr.seg_enabled = bool(bd.get_bool(128))
    if hdr.seg_enabled:
        _parse_segmentation(bd, hdr)
    _parse_filter_header(bd, hdr)
    # §9.5: coefficient partitions
    log2_parts = bd.get_literal(2)
    n_parts = 1 << log2_parts
    rest = body[first_part_size:]
    sizes_bytes = 3 * (n_parts - 1)
    if len(rest) < sizes_bytes:
        raise ValueError("VP8: truncated partition size table")
    offsets = []
    pos = sizes_bytes
    for i in range(n_parts - 1):
        sz = rest[3 * i] | (rest[3 * i + 1] << 8) | (rest[3 * i + 2] << 16)
        offsets.append((pos, sz))
        pos += sz
    if pos > len(rest):
        raise ValueError("VP8: coefficient partition overruns the payload")
    offsets.append((pos, len(rest) - pos))  # last partition: remainder
    partitions = [_BoolDecoder(rest[o : o + n]) for o, n in offsets]
    _parse_quant_header(bd, hdr)
    bd.get_bool(128)  # refresh_entropy_probs: no effect within one frame
    hdr.coeff_probs = [
        [[list(_DEFAULT_COEFF_PROBS[t][b][c]) for c in range(3)] for b in range(8)]
        for t in range(4)
    ]
    _parse_token_prob_updates(bd, hdr)
    hdr.use_skip = bd.get_bool(128)
    hdr.skip_prob = bd.get_literal(8) if hdr.use_skip else 0
    return hdr, bd, partitions


# ----------------------------------------------------- per-MB modes


class _MBInfo:
    __slots__ = ("seg_id", "skip", "ymode", "uvmode", "bmodes")

    def __init__(self) -> None:
        self.seg_id = 0
        self.skip = 0
        self.ymode = DC_PRED
        self.uvmode = DC_PRED
        self.bmodes = None  # list[16] when ymode == B_PRED


def parse_mb_modes(hdr: _FrameHeader, bd: _BoolDecoder) -> list[list[_MBInfo]]:
    """§11: keyframe macroblock prediction records, in raster order.
    Subblock mode contexts come from the above/left SUBBLOCK modes,
    with B_DC_PRED assumed outside the frame (§11.4); non-B_PRED
    macroblocks contribute the §11.4 mode-to-submode mapping."""
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    # per-MB "effective submodes" rows for context (bottom row / right col)
    above_sub = [[B_DC_PRED] * 4 for _ in range(mb_w)]
    rows: list[list[_MBInfo]] = []
    ymode_to_sub = {
        DC_PRED: B_DC_PRED, V_PRED: B_VE_PRED,
        H_PRED: B_HE_PRED, TM_PRED: B_TM_PRED,
    }
    for _my in range(mb_h):
        row: list[_MBInfo] = []
        left_sub = [B_DC_PRED] * 4
        for mx in range(mb_w):
            mb = _MBInfo()
            if hdr.seg_enabled and hdr.seg_update_map:
                p = hdr.seg_tree_probs
                if bd.get_bool(p[0]):
                    mb.seg_id = 2 + bd.get_bool(p[2])
                else:
                    mb.seg_id = bd.get_bool(p[1])
            if hdr.use_skip:
                mb.skip = bd.get_bool(hdr.skip_prob)
            mb.ymode = bd.get_tree(_KF_YMODE_TREE, _KF_YMODE_PROB)
            if mb.ymode == B_PRED:
                bmodes = []
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    above = (
                        bmodes[sb - 4] if r > 0 else above_sub[mx][c]
                    )
                    left = bmodes[sb - 1] if c > 0 else left_sub[r]
                    probs = _KF_B_MODE_PROBS[above][left]
                    bmodes.append(bd.get_tree(_BMODE_TREE, probs))
                mb.bmodes = bmodes
                above_sub[mx] = bmodes[12:16]
                left_sub = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                sub = ymode_to_sub[mb.ymode]
                above_sub[mx] = [sub] * 4
                left_sub = [sub] * 4
            mb.uvmode = bd.get_tree(_UV_MODE_TREE, _KF_UV_MODE_PROB)
            row.append(mb)
        rows.append(row)
    return rows


# ------------------------------------------------------ token decoding


def _decode_block_tokens(
    bd: _BoolDecoder, probs_tbl, first: int, ctx: int, dqf
) -> tuple[np.ndarray, int]:
    """§13: one 4x4 block's DCT tokens -> dequantized coefficients in
    raster order. ``probs_tbl`` is coeff_probs[block_type]; ``first``
    is 1 for Y blocks whose DC rides in Y2. Returns (coeffs, nnz).

    Hot path: the boolean decoder state is held in LOCALS for the whole
    block (the per-bool method-call overhead dominated the profile) and
    written back once; dequantized values reproduce the reference's
    int16 coefficient wrap."""
    out = [0] * 16
    nnz = 0
    i = first
    start = 0  # tree start node: 2 skips EOB after a ZERO token
    dc_q, ac_q = dqf
    # localize decoder state (restored at every exit path)
    d = bd._d
    dn = bd._n
    pos = bd._pos
    value = bd.value
    range_ = bd.range
    bit_count = bd.bit_count
    tree = _COEFF_TREE
    bands = _BANDS
    zigzag = _ZIGZAG
    cat_probs = _t.CAT_PROBS
    cat_base = _CAT_BASE
    while i < 16:
        row = probs_tbl[bands[i]][ctx]
        # inline tree walk
        j = start
        while True:
            p = row[j >> 1]
            split = 1 + (((range_ - 1) * p) >> 8)
            big = split << 8
            if value >= big:
                bit = 1
                range_ -= split
                value -= big
            else:
                bit = 0
                range_ = split
            while range_ < 128:
                value <<= 1
                range_ <<= 1
                bit_count += 1
                if bit_count == 8:
                    bit_count = 0
                    if pos < dn:
                        value |= d[pos]
                    pos += 1
            j = tree[j + bit]
            if j <= 0:
                token = -j
                break
        if token == _EOB:
            break
        if token == _ZERO_TOKEN:
            ctx = 0
            start = 2
            i += 1
            continue
        if token < _CAT1:
            v = token  # literal 1..4
            ctx = 1 if v == 1 else 2
        else:
            extra = 0
            for p in cat_probs[token - _CAT1]:
                split = 1 + (((range_ - 1) * p) >> 8)
                big = split << 8
                if value >= big:
                    extra = (extra << 1) | 1
                    range_ -= split
                    value -= big
                else:
                    extra <<= 1
                    range_ = split
                while range_ < 128:
                    value <<= 1
                    range_ <<= 1
                    bit_count += 1
                    if bit_count == 8:
                        bit_count = 0
                        if pos < dn:
                            value |= d[pos]
                        pos += 1
            v = cat_base[token - _CAT1] + extra
            ctx = 2
        # sign bool at prob 128
        split = 1 + ((range_ - 1) >> 1)
        big = split << 8
        if value >= big:
            v = -v
            range_ -= split
            value -= big
        else:
            range_ = split
        while range_ < 128:
            value <<= 1
            range_ <<= 1
            bit_count += 1
            if bit_count == 8:
                bit_count = 0
                if pos < dn:
                    value |= d[pos]
                pos += 1
        dq = v * (dc_q if i == 0 else ac_q)
        # the reference decoder stores dequantized coefficients in
        # int16; a syntactically valid but adversarial stream (cat6
        # level x large quantizer) overflows it, and bit-exactness
        # demands the same wrap here
        out[zigzag[i]] = ((dq & 0xFFFF) ^ 0x8000) - 0x8000
        nnz += 1
        start = 0
        i += 1
    bd._pos = pos
    bd.value = value
    bd.range = range_
    bd.bit_count = bit_count
    return out, nnz


# ------------------------------------------------- inverse transforms


def _iwht4x4(ip) -> list:
    """§14.3 inverse Walsh-Hadamard (Y2 DC transform), exact integer —
    pure-int scalar arithmetic (a 4x4 is far below numpy's efficiency
    floor; the profile showed the array path dominated by overhead)."""
    o = [0] * 16
    t = [0] * 16
    for c in range(4):
        a1 = ip[c] + ip[12 + c]
        b1 = ip[4 + c] + ip[8 + c]
        c1 = ip[4 + c] - ip[8 + c]
        d1 = ip[c] - ip[12 + c]
        t[c] = a1 + b1
        t[4 + c] = c1 + d1
        t[8 + c] = a1 - b1
        t[12 + c] = d1 - c1
    for r in range(0, 16, 4):
        a1 = t[r] + t[r + 3]
        b1 = t[r + 1] + t[r + 2]
        c1 = t[r + 1] - t[r + 2]
        d1 = t[r] - t[r + 3]
        o[r] = (a1 + b1 + 3) >> 3
        o[r + 1] = (c1 + d1 + 3) >> 3
        o[r + 2] = (a1 - b1 + 3) >> 3
        o[r + 3] = (d1 - c1 + 3) >> 3
    return o  # flat 16, raster order: entry n = DC of Y block n


_C1 = 20091  # cos(pi/8)*sqrt(2) - 1, Q16 (§14.4)
_C2 = 35468  # sin(pi/8)*sqrt(2), Q16


def _idct4x4(ip) -> np.ndarray:
    """§14.4 inverse DCT, exact integer (Python's >> floors, matching
    C's signed arithmetic shift) — pure-int scalars for the same
    efficiency-floor reason as _iwht4x4."""
    t = [0] * 16
    for c in range(4):
        x1, x5, x9, x13 = ip[c], ip[4 + c], ip[8 + c], ip[12 + c]
        a1 = x1 + x9
        b1 = x1 - x9
        c1 = ((x5 * _C2) >> 16) - (x13 + ((x13 * _C1) >> 16))
        d1 = (x5 + ((x5 * _C1) >> 16)) + ((x13 * _C2) >> 16)
        t[c] = a1 + d1
        t[4 + c] = b1 + c1
        t[8 + c] = b1 - c1
        t[12 + c] = a1 - d1
    o = [0] * 16
    for r in range(0, 16, 4):
        x0, x1, x2, x3 = t[r], t[r + 1], t[r + 2], t[r + 3]
        a1 = x0 + x2
        b1 = x0 - x2
        c1 = ((x1 * _C2) >> 16) - (x3 + ((x3 * _C1) >> 16))
        d1 = (x1 + ((x1 * _C1) >> 16)) + ((x3 * _C2) >> 16)
        o[r] = (a1 + d1 + 4) >> 3
        o[r + 1] = (b1 + c1 + 4) >> 3
        o[r + 2] = (b1 - c1 + 4) >> 3
        o[r + 3] = (a1 - d1 + 4) >> 3
    return np.array(o, np.int32).reshape(4, 4)


# ---------------------------------------------------- intra prediction


def _clip255(a):
    return np.clip(a, 0, 255)


def _pred16_or_8(plane: np.ndarray, x: int, y: int, n: int, mode: int) -> np.ndarray:
    """§12.2: whole-macroblock prediction (16x16 luma / 8x8 chroma) from
    the unfiltered reconstruction. Frame-edge conventions: above row is
    127, left column is 129, above-left 129 except 127 on the top row."""
    has_above, has_left = y > 0, x > 0
    above = plane[y - 1, x : x + n].astype(np.int32) if has_above else np.full(n, 127, np.int32)
    left = plane[y : y + n, x - 1].astype(np.int32) if has_left else np.full(n, 129, np.int32)
    if mode == DC_PRED:
        if has_above and has_left:
            dc = (int(above.sum()) + int(left.sum()) + n) >> (5 if n == 16 else 4)
        elif has_above:
            dc = (int(above.sum()) + (n >> 1)) >> (4 if n == 16 else 3)
        elif has_left:
            dc = (int(left.sum()) + (n >> 1)) >> (4 if n == 16 else 3)
        else:
            dc = 128
        return np.full((n, n), dc, np.int32)
    if mode == V_PRED:
        return np.tile(above, (n, 1))
    if mode == H_PRED:
        return np.tile(left[:, None], (1, n))
    # TM_PRED. Border conventions (§12.2 / the reference decoder's
    # buffer init): the row above the frame reads 127 INCLUDING its
    # above-left corner; the column left of the frame reads 129,
    # including the corner when an above row exists.
    if not has_above:
        tl = 127
    elif not has_left:
        tl = 129
    else:
        tl = int(plane[y - 1, x - 1])
    return _clip255(left[:, None] + above[None, :] - tl)


def _pred4(sub: np.ndarray, tr: np.ndarray, mode: int) -> np.ndarray:
    """§12.3: one 4x4 subblock prediction. ``sub`` is the 5x5 (corner +
    above row + left column) neighborhood [tl, A0..A3] / [L0..L3] packed
    as: sub[0] = above-left, sub[1:5] = above, sub[5:9] = left;
    ``tr`` = the four above-right pixels."""
    P = int(sub[0])
    A = sub[1:5].astype(np.int32)
    L = sub[5:9].astype(np.int32)
    AR = tr.astype(np.int32)
    o = np.empty((4, 4), np.int32)
    if mode == B_DC_PRED:
        o[:] = (int(A.sum()) + int(L.sum()) + 4) >> 3
    elif mode == B_TM_PRED:
        o[:] = _clip255(L[:, None] + A[None, :] - P)
    elif mode == B_VE_PRED:
        e = np.array([P, A[0], A[1], A[2], A[3], AR[0]], np.int32)
        row = (e[:4] + 2 * e[1:5] + e[2:6] + 2) >> 2
        o[:] = row[None, :]
    elif mode == B_HE_PRED:
        e = np.array([P, L[0], L[1], L[2], L[3], L[3]], np.int32)
        col = (e[:4] + 2 * e[1:5] + e[2:6] + 2) >> 2
        o[:] = col[:, None]
    elif mode == B_LD_PRED:
        a = np.concatenate([A, AR])
        d = np.empty(7, np.int32)
        d[:6] = (a[:6] + 2 * a[1:7] + a[2:8] + 2) >> 2
        d[6] = (a[6] + 3 * a[7] + 2) >> 2
        for r in range(4):
            o[r] = d[r : r + 4]
    elif mode in (B_RD_PRED, B_VR_PRED, B_HD_PRED):
        pp = np.array(
            [L[3], L[2], L[1], L[0], P, A[0], A[1], A[2], A[3]], np.int32
        )
        avg3 = (pp[:7] + 2 * pp[1:8] + pp[2:9] + 2) >> 2
        avg2 = (pp[:8] + pp[1:9] + 1) >> 1
        if mode == B_RD_PRED:
            for r in range(4):
                for c in range(4):
                    o[r, c] = avg3[3 + c - r]
        elif mode == B_VR_PRED:
            # explicit cell table, ported verbatim from §12.3 (a closed
            # form over (r, c) exists but is error-prone to derive)
            o[3, 0] = avg3[1]
            o[2, 0] = avg3[2]
            o[3, 1] = o[1, 0] = avg3[3]
            o[2, 1] = o[0, 0] = avg2[4]
            o[3, 2] = o[1, 1] = avg3[4]
            o[2, 2] = o[0, 1] = avg2[5]
            o[3, 3] = o[1, 2] = avg3[5]
            o[2, 3] = o[0, 2] = avg2[6]
            o[1, 3] = avg3[6]
            o[0, 3] = avg2[7]
        else:  # B_HD_PRED
            o[3, 0] = avg2[0]
            o[3, 1] = avg3[0]
            o[2, 0] = o[3, 2] = avg2[1]
            o[2, 1] = o[3, 3] = avg3[1]
            o[2, 2] = o[1, 0] = avg2[2]
            o[2, 3] = o[1, 1] = avg3[2]
            o[1, 2] = o[0, 0] = avg2[3]
            o[1, 3] = o[0, 1] = avg3[3]
            o[0, 2] = avg3[4]
            o[0, 3] = avg3[5]
    elif mode == B_VL_PRED:
        pp = np.concatenate([A, AR])
        avg2 = (pp[:7] + pp[1:8] + 1) >> 1
        avg3 = (pp[:6] + 2 * pp[1:7] + pp[2:8] + 2) >> 2
        o[0, 0] = avg2[0]
        o[1, 0] = avg3[0]
        o[2, 0] = o[0, 1] = avg2[1]
        o[1, 1] = o[3, 0] = avg3[1]
        o[2, 1] = o[0, 2] = avg2[2]
        o[3, 1] = o[1, 2] = avg3[2]
        o[0, 3] = o[2, 2] = avg2[3]
        o[1, 3] = o[3, 2] = avg3[3]
        o[2, 3] = avg3[4]
        o[3, 3] = avg3[5]
    elif mode == B_HU_PRED:
        pp = L
        o[0, 0] = (pp[0] + pp[1] + 1) >> 1
        o[0, 1] = (pp[0] + 2 * pp[1] + pp[2] + 2) >> 2
        o[0, 2] = o[1, 0] = (pp[1] + pp[2] + 1) >> 1
        o[0, 3] = o[1, 1] = (pp[1] + 2 * pp[2] + pp[3] + 2) >> 2
        o[1, 2] = o[2, 0] = (pp[2] + pp[3] + 1) >> 1
        o[1, 3] = o[2, 1] = (pp[2] + 3 * pp[3] + 2) >> 2
        o[2, 2] = o[2, 3] = pp[3]
        o[3, :] = pp[3]
    else:  # pragma: no cover - tree cannot produce other values
        raise ValueError(f"VP8: bad subblock mode {mode}")
    return o


# ------------------------------------------------------ reconstruction


def _sub_neighborhood(yplane, px: int, py: int, mb_w: int):
    """Above-left + above row + left column for the 4x4 subblock whose
    top-left plane coordinate is (px, py), with the frame border
    conventions (above = 127, left = 129, corner per _pred16_or_8)."""
    sub = np.empty(9, np.int32)
    if py == 0:
        sub[0] = 127
        sub[1:5] = 127
    else:
        sub[1:5] = yplane[py - 1, px : px + 4]
        sub[0] = 127 if py == 0 else (129 if px == 0 else int(yplane[py - 1, px - 1]))
    if px == 0:
        sub[5:9] = 129
    else:
        sub[5:9] = yplane[py : py + 4, px - 1]
    return sub


def _above_right4(yplane, mx: int, my: int, r: int, c: int, mb_w: int):
    """The four above-right pixels for subblock (r, c) of MB (mx, my).
    Interior subblocks read the already-reconstructed pixels directly;
    every c==3 subblock reads the MACROBLOCK's above-right row (the
    §12.3 quirk — those pixels are constant down the MB), replicated
    from the last above pixel on the rightmost MB column."""
    x0, y0 = mx * 16, my * 16
    if c < 3:
        py = y0 + 4 * r - 1
        if py < 0:
            return np.full(4, 127, np.int32)
        return yplane[py, x0 + 4 * c + 4 : x0 + 4 * c + 8].astype(np.int32)
    if my == 0:
        return np.full(4, 127, np.int32)
    if mx == mb_w - 1:
        return np.full(4, int(yplane[y0 - 1, x0 + 15]), np.int32)
    return yplane[y0 - 1, x0 + 16 : x0 + 20].astype(np.int32)


def _reconstruct(hdr: _FrameHeader, mbs, partitions):
    """Token-decode + reconstruct the whole frame (unfiltered planes,
    padded to macroblock multiples), §11-14. Returns
    (Y, U, V, mb_flags) where mb_flags[my][mx] is True when the MB has
    any non-zero coefficient (the loop filter's interior-edge gate)."""
    mb_w, mb_h = hdr.mb_w, hdr.mb_h
    Y = np.zeros((mb_h * 16, mb_w * 16), np.uint8)
    U = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    Vp = np.zeros((mb_h * 8, mb_w * 8), np.uint8)
    quants = [_QuantFactors(hdr, s) for s in range(4)]
    n_parts = len(partitions)
    probs = hdr.coeff_probs
    # non-zero contexts (§13.3): per-position flags along the above row
    # and the left column — 4 Y + 2 U + 2 V + 1 Y2 per macroblock
    above_y = [[0] * 4 for _ in range(mb_w)]
    above_u = [[0] * 2 for _ in range(mb_w)]
    above_v = [[0] * 2 for _ in range(mb_w)]
    above_y2 = [0] * mb_w
    has_coeffs = [[False] * mb_w for _ in range(mb_h)]

    for my in range(mb_h):
        bd = partitions[my % n_parts]
        left_y = [0] * 4
        left_u = [0] * 2
        left_v = [0] * 2
        left_y2 = 0
        for mx in range(mb_w):
            mb = mbs[my][mx]
            q = quants[mb.seg_id]
            is_b = mb.ymode == B_PRED
            ycoefs = None
            ucoefs = vcoefs = None
            total_nnz = 0
            if mb.skip:
                left_y[:] = [0] * 4
                above_y[mx][:] = [0] * 4
                left_u[:] = [0] * 2
                above_u[mx][:] = [0] * 2
                left_v[:] = [0] * 2
                above_v[mx][:] = [0] * 2
                if not is_b:
                    # an absent Y2 (B_PRED) leaves the Y2 context
                    # untouched for the next MB that has one (§13.3)
                    above_y2[mx] = left_y2 = 0
            else:
                ycoefs = [None] * 16
                ucoefs = [None] * 4
                vcoefs = [None] * 4
                if not is_b:
                    ctx = above_y2[mx] + left_y2
                    y2c, nnz2 = _decode_block_tokens(
                        bd, probs[1], 0, ctx, q.y2
                    )
                    above_y2[mx] = left_y2 = 1 if nnz2 else 0
                    total_nnz += nnz2
                    y2out = _iwht4x4(y2c) if nnz2 else None
                ytype = 3 if is_b else 0
                first = 0 if is_b else 1
                ynz = [0] * 16
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    actx = ynz[sb - 4] if r > 0 else above_y[mx][c]
                    lctx = ynz[sb - 1] if c > 0 else left_y[r]
                    coefs, nnz = _decode_block_tokens(
                        bd, probs[ytype], first, actx + lctx, q.y1
                    )
                    ynz[sb] = 1 if nnz else 0
                    total_nnz += nnz
                    ycoefs[sb] = coefs
                if not is_b and y2out is not None:
                    for sb in range(16):
                        ycoefs[sb][0] = y2out[sb]
                for plane_c, above_c, left_c, qf in (
                    (ucoefs, above_u[mx], left_u, q.uv),
                    (vcoefs, above_v[mx], left_v, q.uv),
                ):
                    cnz = [0] * 4
                    for sb in range(4):
                        r, c = sb >> 1, sb & 1
                        actx = cnz[sb - 2] if r > 0 else above_c[c]
                        lctx = cnz[sb - 1] if c > 0 else left_c[r]
                        coefs, nnz = _decode_block_tokens(
                            bd, probs[2], 0, actx + lctx, qf
                        )
                        cnz[sb] = 1 if nnz else 0
                        total_nnz += nnz
                        plane_c[sb] = coefs
                    above_c[0], above_c[1] = cnz[2], cnz[3]
                    left_c[0], left_c[1] = cnz[1], cnz[3]
                above_y[mx][:] = ynz[12:16]
                left_y[:] = [ynz[3], ynz[7], ynz[11], ynz[15]]
            has_coeffs[my][mx] = total_nnz > 0

            # ---- reconstruct this MB into the planes
            x0, y0 = mx * 16, my * 16
            if is_b:
                for sb in range(16):
                    r, c = sb >> 2, sb & 3
                    px, py = x0 + 4 * c, y0 + 4 * r
                    sub = _sub_neighborhood(Y, px, py, mb_w)
                    tr = _above_right4(Y, mx, my, r, c, mb_w)
                    pred = _pred4(sub, tr, mb.bmodes[sb])
                    if ycoefs is not None and any(ycoefs[sb]):
                        pred = pred + _idct4x4(ycoefs[sb])
                    Y[py : py + 4, px : px + 4] = _clip255(pred)
            else:
                pred = _pred16_or_8(Y, x0, y0, 16, mb.ymode).copy()
                if ycoefs is not None:
                    for sb in range(16):
                        if any(ycoefs[sb]):
                            r, c = sb >> 2, sb & 3
                            pred[
                                4 * r : 4 * r + 4, 4 * c : 4 * c + 4
                            ] += _idct4x4(ycoefs[sb])
                Y[y0 : y0 + 16, x0 : x0 + 16] = _clip255(pred)
            cx0, cy0 = mx * 8, my * 8
            for plane, coefs_c in ((U, ucoefs), (Vp, vcoefs)):
                predc = _pred16_or_8(plane, cx0, cy0, 8, mb.uvmode).copy()
                if coefs_c is not None:
                    for sb in range(4):
                        if any(coefs_c[sb]):
                            r, c = sb >> 1, sb & 1
                            predc[
                                4 * r : 4 * r + 4, 4 * c : 4 * c + 4
                            ] += _idct4x4(coefs_c[sb])
                plane[cy0 : cy0 + 8, cx0 : cx0 + 8] = _clip255(predc)
    return Y, U, Vp, has_coeffs


# --------------------------------------------------------- loop filter


def _c128(a):
    return np.clip(a, -128, 127)


def _lf_level_for(hdr: _FrameHeader, mb: _MBInfo) -> int:
    level = hdr.filter_level
    if hdr.seg_enabled:
        s = hdr.segments[mb.seg_id]
        level = s.lf_level if hdr.seg_absolute else level + s.lf_level
        level = min(max(level, 0), 63)
    if hdr.lf_delta_enabled:
        # keyframe macroblocks always reference INTRA_FRAME (index 0);
        # mode delta 0 applies to B_PRED (§10)
        level += hdr.ref_lf_deltas[0]
        if mb.ymode == B_PRED:
            level += hdr.mode_lf_deltas[0]
        level = min(max(level, 0), 63)
    return level


def _lf_params(level: int, sharpness: int) -> tuple[int, int, int, int]:
    """(interior_limit, hev_threshold, mb_edge_limit, sub_edge_limit)
    for the normal filter at a keyframe (§15.1-15.2)."""
    ilim = level
    if sharpness:
        ilim >>= 1 if sharpness <= 4 else 2
        if ilim > 9 - sharpness:
            ilim = 9 - sharpness
    if ilim < 1:
        ilim = 1
    hev = 0
    if level >= 40:
        hev = 2
    elif level >= 15:
        hev = 1
    return ilim, hev, ((level + 2) * 2) + ilim, (level * 2) + ilim


class _EdgeView:
    """p3..q3 as length-n int32 vectors across one edge, writable back.
    For a vertical edge the filtered pixels sit left/right of column
    ``x0``; for a horizontal edge above/below row ``y0``."""

    __slots__ = ("_plane", "_vert", "_x0", "_y0", "_n")

    def __init__(self, plane, vert: bool, x0: int, y0: int, n: int) -> None:
        self._plane, self._vert = plane, vert
        self._x0, self._y0, self._n = x0, y0, n

    def p(self, i: int):
        if self._vert:
            return self._plane[
                self._y0 : self._y0 + self._n, self._x0 - 1 - i
            ].astype(np.int32)
        return self._plane[
            self._y0 - 1 - i, self._x0 : self._x0 + self._n
        ].astype(np.int32)

    def q(self, i: int):
        if self._vert:
            return self._plane[
                self._y0 : self._y0 + self._n, self._x0 + i
            ].astype(np.int32)
        return self._plane[
            self._y0 + i, self._x0 : self._x0 + self._n
        ].astype(np.int32)

    def set_p(self, i: int, v) -> None:
        out = np.clip(v, 0, 255).astype(np.uint8)
        if self._vert:
            self._plane[self._y0 : self._y0 + self._n, self._x0 - 1 - i] = out
        else:
            self._plane[self._y0 - 1 - i, self._x0 : self._x0 + self._n] = out

    def set_q(self, i: int, v) -> None:
        out = np.clip(v, 0, 255).astype(np.uint8)
        if self._vert:
            self._plane[self._y0 : self._y0 + self._n, self._x0 + i] = out
        else:
            self._plane[self._y0 + i, self._x0 : self._x0 + self._n] = out


def _normal_filter(ev: _EdgeView, edge_lim: int, ilim: int, hev_t: int,
                   mb_edge: bool) -> None:
    """§15.2-15.4 normal loop filter across one edge, vectorized along
    the edge. All arithmetic on signed (value - 128) with the spec's
    saturating clamps."""
    p3, p2, p1, p0 = ev.p(3), ev.p(2), ev.p(1), ev.p(0)
    q0, q1, q2, q3 = ev.q(0), ev.q(1), ev.q(2), ev.q(3)
    mask = (
        (np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge_lim)
        & (np.abs(p3 - p2) <= ilim) & (np.abs(p2 - p1) <= ilim)
        & (np.abs(p1 - p0) <= ilim) & (np.abs(q1 - q0) <= ilim)
        & (np.abs(q2 - q1) <= ilim) & (np.abs(q3 - q2) <= ilim)
    )
    if not mask.any():
        return
    hev = (np.abs(p1 - p0) > hev_t) | (np.abs(q1 - q0) > hev_t)
    P1, P0, Q0, Q1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    P2, Q2 = p2 - 128, q2 - 128
    if mb_edge:
        # high-variance rows get the common adjustment; the rest get the
        # 27/18/9 wide smoothing (§15.4)
        a = _c128(_c128(P1 - Q1) + 3 * (Q0 - P0))
        F = _c128(a + 4) >> 3
        E = _c128(a + 3) >> 3
        w = _c128(_c128(P1 - Q1) + 3 * (Q0 - P0))
        a27 = _c128((27 * w + 63) >> 7)
        a18 = _c128((18 * w + 63) >> 7)
        a9 = _c128((9 * w + 63) >> 7)
        use_h = mask & hev
        use_w = mask & ~hev
        np0 = np.where(use_h, _c128(P0 + E), np.where(use_w, _c128(P0 + a27), P0))
        nq0 = np.where(use_h, _c128(Q0 - F), np.where(use_w, _c128(Q0 - a27), Q0))
        np1 = np.where(use_w, _c128(P1 + a18), P1)
        nq1 = np.where(use_w, _c128(Q1 - a18), Q1)
        np2 = np.where(use_w, _c128(P2 + a9), P2)
        nq2 = np.where(use_w, _c128(Q2 - a9), Q2)
        ev.set_p(2, np2 + 128)
        ev.set_q(2, nq2 + 128)
    else:
        # subblock edge (§15.3): outer taps only on high-variance rows,
        # then the p1/q1 refinement on the rest
        outer = np.where(hev, _c128(P1 - Q1), 0)
        a = _c128(outer + 3 * (Q0 - P0))
        F = _c128(a + 4) >> 3
        E = _c128(a + 3) >> 3
        np0 = np.where(mask, _c128(P0 + E), P0)
        nq0 = np.where(mask, _c128(Q0 - F), Q0)
        refine = (F + 1) >> 1
        np1 = np.where(mask & ~hev, _c128(P1 + refine), P1)
        nq1 = np.where(mask & ~hev, _c128(Q1 - refine), Q1)
    ev.set_p(0, np0 + 128)
    ev.set_q(0, nq0 + 128)
    ev.set_p(1, np1 + 128)
    ev.set_q(1, nq1 + 128)


def _simple_filter(ev: _EdgeView, edge_lim: int) -> None:
    """§15.2 simple filter: p1..q1 only, common adjustment with outer
    taps, Y plane only."""
    p1, p0, q0, q1 = ev.p(1), ev.p(0), ev.q(0), ev.q(1)
    mask = np.abs(p0 - q0) * 2 + (np.abs(p1 - q1) >> 1) <= edge_lim
    if not mask.any():
        return
    P1, P0, Q0, Q1 = p1 - 128, p0 - 128, q0 - 128, q1 - 128
    a = _c128(_c128(P1 - Q1) + 3 * (Q0 - P0))
    F = _c128(a + 4) >> 3
    E = _c128(a + 3) >> 3
    ev.set_p(0, np.where(mask, _c128(P0 + E), P0) + 128)
    ev.set_q(0, np.where(mask, _c128(Q0 - F), Q0) + 128)


def _loop_filter(hdr: _FrameHeader, mbs, has_coeffs, Y, U, V) -> None:
    """Frame loop filter, macroblock raster order (§15.2): left MB edge,
    interior vertical edges, top MB edge, interior horizontal edges —
    interior edges only for macroblocks with coefficients or B_PRED."""
    if hdr.filter_level == 0 and not hdr.seg_enabled and not hdr.lf_delta_enabled:
        return
    simple = hdr.filter_type == 1
    for my in range(hdr.mb_h):
        for mx in range(hdr.mb_w):
            mb = mbs[my][mx]
            level = _lf_level_for(hdr, mb)
            if level == 0:
                continue
            ilim, hev_t, mb_lim, sb_lim = _lf_params(level, hdr.sharpness)
            inner = has_coeffs[my][mx] or mb.ymode == B_PRED
            x0, y0 = mx * 16, my * 16
            cx0, cy0 = mx * 8, my * 8
            if simple:
                if mx > 0:
                    _simple_filter(_EdgeView(Y, True, x0, y0, 16), mb_lim)
                if inner:
                    for dx in (4, 8, 12):
                        _simple_filter(
                            _EdgeView(Y, True, x0 + dx, y0, 16), sb_lim
                        )
                if my > 0:
                    _simple_filter(_EdgeView(Y, False, x0, y0, 16), mb_lim)
                if inner:
                    for dy in (4, 8, 12):
                        _simple_filter(
                            _EdgeView(Y, False, x0, y0 + dy, 16), sb_lim
                        )
                continue
            if mx > 0:
                _normal_filter(_EdgeView(Y, True, x0, y0, 16), mb_lim, ilim, hev_t, True)
                _normal_filter(_EdgeView(U, True, cx0, cy0, 8), mb_lim, ilim, hev_t, True)
                _normal_filter(_EdgeView(V, True, cx0, cy0, 8), mb_lim, ilim, hev_t, True)
            if inner:
                for dx in (4, 8, 12):
                    _normal_filter(
                        _EdgeView(Y, True, x0 + dx, y0, 16), sb_lim, ilim, hev_t, False
                    )
                _normal_filter(
                    _EdgeView(U, True, cx0 + 4, cy0, 8), sb_lim, ilim, hev_t, False
                )
                _normal_filter(
                    _EdgeView(V, True, cx0 + 4, cy0, 8), sb_lim, ilim, hev_t, False
                )
            if my > 0:
                _normal_filter(_EdgeView(Y, False, x0, y0, 16), mb_lim, ilim, hev_t, True)
                _normal_filter(_EdgeView(U, False, cx0, cy0, 8), mb_lim, ilim, hev_t, True)
                _normal_filter(_EdgeView(V, False, cx0, cy0, 8), mb_lim, ilim, hev_t, True)
            if inner:
                for dy in (4, 8, 12):
                    _normal_filter(
                        _EdgeView(Y, False, x0, y0 + dy, 16), sb_lim, ilim, hev_t, False
                    )
                _normal_filter(
                    _EdgeView(U, False, cx0, cy0 + 4, 8), sb_lim, ilim, hev_t, False
                )
                _normal_filter(
                    _EdgeView(V, False, cx0, cy0 + 4, 8), sb_lim, ilim, hev_t, False
                )


# ----------------------------------------------------------- public API


def decode_vp8(data: bytes):
    """Decode a raw "VP8 " chunk payload (a keyframe) to the 4:2:0
    planes: (width, height, y, u, v) with y shaped (h, w) and u/v
    ((h+1)//2, (w+1)//2) — the RFC 6386 output surface."""
    hdr, bd, partitions = parse_headers(data)
    mbs = parse_mb_modes(hdr, bd)
    Y, U, V, has_coeffs = _reconstruct(hdr, mbs, partitions)
    _loop_filter(hdr, mbs, has_coeffs, Y, U, V)
    w, h = hdr.width, hdr.height
    cw, ch = (w + 1) >> 1, (h + 1) >> 1
    return w, h, Y[:h, :w], U[:ch, :cw], V[:ch, :cw]


def decode_webp_vp8(data: bytes):
    """Decode a complete lossy WebP container (RIFF + "VP8 " chunk) to
    (width, height, y, u, v). VP8X extended containers are rejected
    here — they route to libwebp/PIL in the production dispatch."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("VP8: not a WebP RIFF container")
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        body = data[pos + 8 : pos + 8 + size]
        if tag == b"VP8 ":
            return decode_vp8(body)
        if tag in (b"VP8X", b"ANIM"):
            raise ValueError(
                "VP8: extended (VP8X) WebP is out of pure-Python scope; "
                "use the libwebp/PIL path"
            )
        pos += 8 + size + (size & 1)
    raise ValueError("VP8: no VP8 chunk in the container")


def yuv420_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Deterministic integer BT.601 limited-range YUV -> RGB with
    nearest-neighbor chroma upsampling. NOT libwebp's fancy upsampler —
    conformance is asserted on the YUV planes; this conversion exists
    for feature extraction and is identical in every environment."""
    h, w = y.shape
    up = np.repeat(np.repeat(u, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    vp = np.repeat(np.repeat(v, 2, axis=0), 2, axis=1)[:h, :w].astype(np.int32)
    yy = (y.astype(np.int32) - 16) * 76309  # 1.164 in Q16
    r = (yy + 104597 * (vp - 128) + 32768) >> 16
    g = (yy - 25675 * (up - 128) - 53279 * (vp - 128) + 32768) >> 16
    b = (yy + 132201 * (up - 128) + 32768) >> 16
    return np.clip(np.stack([r, g, b], axis=-1), 0, 255).astype(np.uint8)


def decode_webp_vp8_rgb(data: bytes):
    """(width, height, 3, rgb) convenience wrapper for the decode
    dispatch in operators/multimodal.py."""
    w, h, y, u, v = decode_webp_vp8(data)
    return w, h, 3, yuv420_to_rgb(y, u, v)
