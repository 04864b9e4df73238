"""Scratch: minimal VP8 keyframe bitstream builder (RFC 6386 §7.3 bool
encoder + §9 headers) used to debug the pure decoder against libwebp on
CONTROLLED streams. Evolves into the targeted-path test harness."""

from __future__ import annotations

import numpy as np


class BoolEncoder:
    """RFC 6386 §7.3, ported from the spec's reference C."""

    def __init__(self) -> None:
        self.out = bytearray()
        self.range = 255
        self.bottom = 0
        self.bit_count = 24

    def _carry(self) -> None:
        i = len(self.out) - 1
        while self.out[i] == 255:
            self.out[i] = 0
            i -= 1
        self.out[i] += 1

    def put(self, prob: int, bit: int) -> None:
        split = 1 + (((self.range - 1) * prob) >> 8)
        if bit:
            self.bottom += split
            self.range -= split
        else:
            self.range = split
        while self.range < 128:
            self.range <<= 1
            if self.bottom & (1 << 31):
                self._carry()
            self.bottom = (self.bottom << 1) & 0xFFFFFFFF
            self.bit_count -= 1
            if self.bit_count == 0:
                self.out.append((self.bottom >> 24) & 0xFF)
                self.bottom &= (1 << 24) - 1
                self.bit_count = 8

    def literal(self, n: int, v: int) -> None:
        for i in range(n - 1, -1, -1):
            self.put(128, (v >> i) & 1)

    def flush(self) -> bytes:
        for _ in range(32):
            self.put(128, 0)
        return bytes(self.out)


def build_frame(
    mb_w: int,
    mb_h: int,
    q_index: int = 0,
    per_mb=None,
    filter_level: int = 0,
    filter_type: int = 0,
    sharpness: int = 0,
):
    """Assemble a keyframe "VP8 " chunk: no segmentation, no lf deltas,
    1 token partition, no prob updates, mb_no_coeff_skip on.

    per_mb(mx, my) -> (ymode, uvmode, bmodes|None, token_writer|None)
    where token_writer(enc2) writes the MB's tokens; None = skip MB."""
    first = BoolEncoder()
    first.put(128, 0)  # color space
    first.put(128, 0)  # clamping
    first.put(128, 0)  # segmentation_enabled
    first.put(128, filter_type)
    first.literal(6, filter_level)
    first.literal(3, sharpness)
    first.put(128, 0)  # lf delta enabled
    first.literal(2, 0)  # log2 partitions = 0 -> 1 partition
    first.literal(7, q_index)
    for _ in range(5):
        first.put(128, 0)  # no quant deltas
    first.put(128, 0)  # refresh entropy (ignored)
    from akkastreamprocessnpmpackagedependencies_spark.functions import vp8 as V

    for t in range(4):
        for b in range(8):
            for c in range(3):
                for p in range(11):
                    first.put(V._COEFF_UPDATE_PROBS[t][b][c][p], 0)
    first.put(128, 1)  # mb_no_coeff_skip
    first.literal(8, 128)  # prob_skip_false

    tokens = BoolEncoder()
    # mode/skip records + tokens
    kf_y = V._KF_YMODE_PROB
    kf_uv = V._KF_UV_MODE_PROB

    def put_tree(enc, tree, probs, leaf):
        # DFS from the root NODE PAIR (array index 0) for the bit path;
        # an entry <= 0 is a leaf only when reached THROUGH a branch
        def dfs(i, bits):
            for bit in (0, 1):
                nxt = tree[i + bit]
                newbits = bits + [(i >> 1, bit)]
                if nxt <= 0:
                    if -nxt == leaf:
                        return newbits
                else:
                    r = dfs(nxt, newbits)
                    if r is not None:
                        return r
            return None

        path = dfs(0, [])
        if path is None:
            raise ValueError(f"leaf {leaf} not in tree")
        for node, bit in path:
            enc.put(probs[node], bit)

    ymode_to_sub = {
        V.DC_PRED: V.B_DC_PRED, V.V_PRED: V.B_VE_PRED,
        V.H_PRED: V.B_HE_PRED, V.TM_PRED: V.B_TM_PRED,
    }
    above_sub = [[V.B_DC_PRED] * 4 for _ in range(mb_w)]
    for my in range(mb_h):
        left_sub = [V.B_DC_PRED] * 4
        for mx in range(mb_w):
            ymode, uvmode, bmodes, tw = per_mb(mx, my)
            skip = tw is None
            first.put(128, 1 if skip else 0)  # skip bit (prob 128)
            put_tree(first, V._KF_YMODE_TREE, kf_y, ymode)
            if ymode == V.B_PRED:
                for sb, m in enumerate(bmodes):
                    r, c = sb >> 2, sb & 3
                    above = bmodes[sb - 4] if r > 0 else above_sub[mx][c]
                    left = bmodes[sb - 1] if c > 0 else left_sub[r]
                    put_tree(
                        first, V._BMODE_TREE,
                        V._KF_B_MODE_PROBS[above][left], m,
                    )
                above_sub[mx] = bmodes[12:16]
                left_sub = [bmodes[3], bmodes[7], bmodes[11], bmodes[15]]
            else:
                sub = ymode_to_sub[ymode]
                above_sub[mx] = [sub] * 4
                left_sub = [sub] * 4
            put_tree(first, V._UV_MODE_TREE, kf_uv, uvmode)
            if not skip:
                tw(tokens)

    fp = first.flush()
    tp = tokens.flush()
    tag = (len(fp) << 5) | 0  # keyframe, version 0, show=0
    hdr = bytes([tag & 0xFF, (tag >> 8) & 0xFF, (tag >> 16) & 0xFF])
    hdr += b"\x9d\x01\x2a"
    hdr += bytes([(mb_w * 16) & 0xFF, (mb_w * 16) >> 8])
    hdr += bytes([(mb_h * 16) & 0xFF, (mb_h * 16) >> 8])
    return hdr + fp + tp


def wrap_webp(vp8_payload: bytes) -> bytes:
    n = len(vp8_payload)
    chunk = b"VP8 " + n.to_bytes(4, "little") + vp8_payload
    if n & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


class TokenWriter:
    """Write one 4x4 block's tokens given quantization LEVELS (not
    dequantized values) in zigzag order."""

    def __init__(self, enc: BoolEncoder, probs) -> None:
        self.enc = enc
        self.probs = probs

    def block(self, levels, first: int, ctx: int) -> int:
        from akkastreamprocessnpmpackagedependencies_spark.functions import vp8 as V

        enc, probs = self.enc, self.probs
        # find last nonzero
        last = -1
        for i in range(first, 16):
            if levels[i]:
                last = i
        i = first
        start = 0
        while i < 16:
            p = probs[V._BANDS[i]][ctx]
            if i > last:
                # EOB
                enc.put(p[0], 0)
                break
            v = levels[i]
            if start == 0:
                enc.put(p[0], 1)  # not EOB
            if v == 0:
                enc.put(p[1], 0)
                ctx = 0
                start = 2
                i += 1
                continue
            enc.put(p[1], 1)
            a = abs(v)
            if a == 1:
                enc.put(p[2], 0)
                ctx = 1
            else:
                enc.put(p[2], 1)
                if a <= 4:
                    enc.put(p[3], 0)
                    if a == 2:
                        enc.put(p[4], 0)
                    else:
                        enc.put(p[4], 1)
                        enc.put(p[5], 1 if a == 4 else 0)
                else:
                    enc.put(p[3], 1)
                    # categories
                    cats = [(5, 6, 0), (7, 10, 1), (11, 18, 2),
                            (19, 34, 3), (35, 66, 4), (67, 2048, 5)]
                    for lo, hi, cat in cats:
                        if lo <= a <= hi:
                            break
                    if cat < 2:
                        enc.put(p[6], 0)
                        enc.put(p[7], cat)
                    else:
                        enc.put(p[6], 1)
                        if cat < 4:
                            enc.put(p[8], 0)
                            enc.put(p[9], cat - 2)
                        else:
                            enc.put(p[8], 1)
                            enc.put(p[10], cat - 4)
                    extra = a - [5, 7, 11, 19, 35, 67][cat]
                    from akkastreamprocessnpmpackagedependencies_spark.functions import (
                        vp8_tables as T,
                    )
                    nbits = len(T.CAT_PROBS[cat])
                    for k, pb in enumerate(T.CAT_PROBS[cat]):
                        enc.put(pb, (extra >> (nbits - 1 - k)) & 1)
                ctx = 2
            enc.put(128, 1 if v < 0 else 0)
            start = 0
            i += 1
        return ctx
