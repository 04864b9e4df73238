"""Extended WebP (VP8X) still images in pure Python — round 15/16.

The VP8X container (WebP container spec) wraps a color bitstream
("VP8 " lossy keyframe or "VP8L" lossless) with optional feature
chunks; for STILL images the one that affects pixels is ALPH, the
alpha plane a lossy-VP8 color stream cannot carry itself. This module:

- walks the RIFF/VP8X chunk layout (canvas dims, feature flags),
  rejecting animations loudly (ANIM/ANMF are genuinely out of
  still-image scope);
- decodes ALPH: raw (C=0) or LOSSLESS-COMPRESSED (C=1) alpha, the
  latter being a HEADERLESS level-0 VP8L image stream whose alpha
  values ride the green channel. Rather than duplicating the VP8L
  entropy machinery, the headerless stream is re-wrapped into a full
  VP8L container — the signature byte plus the 32 header bits
  (14+14-bit dims, alpha, version) are exactly byte-aligned, so the
  stream appends verbatim — and handed to ``webp.decode_webp``:
  one decoder, zero code duplication, and the wrapper is covered by
  the same tests as the main codec;
- inverts the three ALPH prediction filters (horizontal / vertical /
  gradient, applied modulo 256 per the spec) — level-reduction
  pre-processing (P=1, emitted only for lossy alpha_quality < 100)
  raises ValueError and routes to the libwebp/PIL fallback in the
  production dispatch;
- assembles RGBA: color from ``vp8.decode_webp_vp8_rgb`` (lossy) or
  ``webp.decode_webp`` (lossless) plus the alpha plane.

``build_vp8x`` assembles spec-conformant VP8X containers (the fixture
generator for tests — libwebp's simple API never emits VP8X, so the
conformance tests build containers here and require libwebp to decode
them to the SAME alpha plane bit-exactly; the color planes are already
covered by the VP8/VP8L conformance suites).

No reference analogue (the reference is text-only: Main.scala:20-24);
this extends the multimodal north-star requirement.
"""

from __future__ import annotations

import struct

import numpy as np

from . import webp as _webp
from .vp8 import decode_vp8, yuv420_to_rgb


def _decode_alpha_lossless(stream: bytes, w: int, h: int) -> np.ndarray:
    """C=1 compressed alpha: a headerless level-0 VP8L image stream at
    the canvas dims, alpha in the green channel. Re-wrap as a full
    VP8L container and decode with the existing codec."""
    # header bits, LSB-first: 14 bits (w-1), 14 bits (h-1),
    # 1 alpha bit, 3 version bits = 32 bits after the 0x2F signature
    hdr = (w - 1) | ((h - 1) << 14) | (0 << 28) | (0 << 29)
    payload = b"\x2f" + struct.pack("<I", hdr)[:4]
    # the headerless stream continues bit-aligned after the 32 header
    # bits — byte-aligned here, so no shifting is needed; simply append
    body = payload + stream
    chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    container = b"RIFF" + len(riff).to_bytes(4, "little") + riff
    dw, dh, dc, arr = _webp.decode_webp(container)
    if (dw, dh) != (w, h):
        raise ValueError("ALPH: compressed alpha dims disagree with canvas")
    # green channel carries the alpha values
    return arr[:, :, 1] if arr.ndim == 3 else arr


def _unfilter_alpha(a: np.ndarray, method: int) -> np.ndarray:
    """Invert the ALPH prediction filter (spec: predictions added
    modulo 256; left/top borders predict from the opposite neighbor,
    the top-left pixel from zero)."""
    if method == 0:
        return a
    h, w = a.shape
    out = a.astype(np.int32)
    if method == 1:  # horizontal
        for y in range(h):
            row = out[y]
            prev = out[y - 1, 0] if y > 0 else 0
            row[0] = (row[0] + prev) & 0xFF
            for x in range(1, w):
                row[x] = (row[x] + row[x - 1]) & 0xFF
    elif method == 2:  # vertical
        out[0, 0] = out[0, 0] & 0xFF
        for x in range(1, w):
            out[0, x] = (out[0, x] + out[0, x - 1]) & 0xFF
        for y in range(1, h):
            out[y] = (out[y] + out[y - 1]) & 0xFF
    elif method == 3:  # gradient
        for y in range(h):
            for x in range(w):
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = out[0, x - 1]
                elif x == 0:
                    pred = out[y - 1, 0]
                else:
                    left = int(out[y, x - 1])
                    top = int(out[y - 1, x])
                    tl = int(out[y - 1, x - 1])
                    pred = min(255, max(0, left + top - tl))
                out[y, x] = (out[y, x] + pred) & 0xFF
    else:
        raise ValueError(f"ALPH: reserved filter method {method}")
    return out.astype(np.uint8)


def decode_alph(chunk: bytes, w: int, h: int) -> np.ndarray:
    """Decode one ALPH chunk body to the (h, w) alpha plane."""
    if not chunk:
        raise ValueError("ALPH: empty chunk")
    b0 = chunk[0]
    if b0 >> 6:
        raise ValueError("ALPH: reserved header bits set")
    pre = (b0 >> 4) & 3
    filt = (b0 >> 2) & 3
    comp = b0 & 3
    if pre == 1:
        raise ValueError(
            "ALPH: level-reduction pre-processing (lossy alpha) is out "
            "of pure-Python scope; use the libwebp/PIL path"
        )
    if pre > 1:
        raise ValueError(f"ALPH: reserved pre-processing {pre}")
    if comp == 0:
        if len(chunk) - 1 < w * h:
            raise ValueError("ALPH: raw alpha truncated")
        a = np.frombuffer(chunk[1 : 1 + w * h], np.uint8).reshape(h, w)
    elif comp == 1:
        a = _decode_alpha_lossless(chunk[1:], w, h)
    else:
        raise ValueError(f"ALPH: reserved compression method {comp}")
    return _unfilter_alpha(a, filt)


def _walk_chunks(data: bytes):
    pos = 12
    while pos + 8 <= len(data):
        tag = data[pos : pos + 4]
        size = int.from_bytes(data[pos + 4 : pos + 8], "little")
        yield tag, data[pos + 8 : pos + 8 + size]
        pos += 8 + size + (size & 1)


def decode_webp_extended(data: bytes):
    """Decode a VP8X still image to (width, height, 4, rgba). Lossy
    color runs through the pure VP8 keyframe decoder (BT.601 RGB),
    lossless through the VP8L codec; ALPH (raw or lossless-compressed,
    any prediction filter) supplies alpha, defaulting to opaque.
    Animations raise ValueError loudly."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("VP8X: not a WebP RIFF container")
    chunks = list(_walk_chunks(data))
    if not chunks or chunks[0][0] != b"VP8X":
        raise ValueError("VP8X: first chunk is not VP8X")
    head = chunks[0][1]
    if len(head) < 10:
        raise ValueError("VP8X: truncated header chunk")
    flags = head[0]
    has_anim = flags & 0x02
    cw = 1 + int.from_bytes(head[4:7], "little")
    ch = 1 + int.from_bytes(head[7:10], "little")
    if has_anim:
        raise ValueError("VP8X: animated WebP is out of still-image scope")
    alpha_plane = None
    rgb = None
    for tag, body in chunks[1:]:
        if tag == b"ALPH" and alpha_plane is None:
            alpha_plane = decode_alph(body, cw, ch)
        elif tag == b"VP8 " and rgb is None:
            w, h, y, u, v = decode_vp8(body)
            if (w, h) != (cw, ch):
                raise ValueError("VP8X: color dims disagree with canvas")
            rgb = yuv420_to_rgb(y, u, v)
        elif tag == b"VP8L" and rgb is None:
            # re-wrap as a bare VP8L container for the codec
            chunk = b"VP8L" + len(body).to_bytes(4, "little") + body
            if len(body) & 1:
                chunk += b"\x00"
            riff = b"WEBP" + chunk
            dw, dh, dc, arr = _webp.decode_webp(
                b"RIFF" + len(riff).to_bytes(4, "little") + riff
            )
            if (dw, dh) != (cw, ch):
                raise ValueError("VP8X: color dims disagree with canvas")
            if dc == 4:
                if alpha_plane is None:
                    alpha_plane = arr[:, :, 3]
                arr = arr[:, :, :3]
            rgb = arr
    if rgb is None:
        raise ValueError("VP8X: no color bitstream (VP8/VP8L) in container")
    if alpha_plane is None:
        alpha_plane = np.full((ch, cw), 255, np.uint8)
    return cw, ch, 4, np.dstack([rgb, alpha_plane])


def build_vp8x(
    color_payload: bytes,
    alpha: np.ndarray | None = None,
    alpha_compressed: bool = False,
    alpha_filter: int = 0,
) -> bytes:
    """Assemble a spec-conformant VP8X container around an existing
    bare WebP payload (lossy or lossless). The test-fixture generator:
    libwebp's simple API never EMITS VP8X, so conformance tests build
    containers here and require libwebp to DECODE them identically.

    ``alpha`` (h, w) adds an ALPH chunk — raw, or lossless-compressed
    through the repo's VP8L encoder when ``alpha_compressed`` (the
    headerless re-wrap of _decode_alpha_lossless, inverted);
    ``alpha_filter`` applies the given prediction filter forward."""
    if color_payload[:4] != b"RIFF" or color_payload[8:12] != b"WEBP":
        raise ValueError("color payload is not a WebP container")
    inner = list(_walk_chunks(color_payload))
    tag, body = inner[0]
    if tag == b"VP8 ":
        t = body[0] | (body[1] << 8) | (body[2] << 16)
        if t & 1:
            raise ValueError("color payload is not a keyframe")
        w = (body[6] | (body[7] << 8)) & 0x3FFF
        h = (body[8] | (body[9] << 8)) & 0x3FFF
    elif tag == b"VP8L":
        if body[0] != 0x2F:
            raise ValueError("bad VP8L signature")
        bits = int.from_bytes(body[1:5], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
    else:
        raise ValueError(f"unsupported inner chunk {tag!r}")
    flags = 0
    chunks = b""
    if alpha is not None:
        if alpha.shape != (h, w):
            raise ValueError(f"alpha shape {alpha.shape} != canvas {(h, w)}")
        flags |= 0x10  # ALPHA flag
        filtered = _filter_alpha_forward(alpha, alpha_filter)
        if alpha_compressed:
            # (the transient libwebp rejections of LZ77/cache alpha
            # shapes during bring-up were the code-length-order bug
            # fixed in webp.py round 15 — every encode shape is
            # accepted now)
            full = _webp.encode_webp(
                w, h,
                np.dstack([filtered] * 3).tobytes(),
                3, use_lz77=True, cache_bits=4,
            )
            vp8l_body = next(b for t, b in _walk_chunks(full) if t == b"VP8L")
            # strip signature byte + 32 header bits (byte-aligned)
            stream = vp8l_body[5:]
            alph = bytes([(alpha_filter << 2) | 1]) + stream
        else:
            alph = bytes([(alpha_filter << 2) | 0]) + filtered.tobytes()
        chunks += b"ALPH" + len(alph).to_bytes(4, "little") + alph
        if len(alph) & 1:
            chunks += b"\x00"
    head = bytes([flags, 0, 0, 0]) + (w - 1).to_bytes(3, "little") + (
        h - 1
    ).to_bytes(3, "little")
    chunks = b"VP8X" + (10).to_bytes(4, "little") + head + chunks
    color_chunk = tag + len(body).to_bytes(4, "little") + body
    if len(body) & 1:
        color_chunk += b"\x00"
    riff = b"WEBP" + chunks + color_chunk
    return b"RIFF" + len(riff).to_bytes(4, "little") + riff


def _filter_alpha_forward(a: np.ndarray, method: int) -> np.ndarray:
    """Forward ALPH prediction filter (encode side of _unfilter_alpha)."""
    if method == 0:
        return a.astype(np.uint8)
    h, w = a.shape
    src = a.astype(np.int32)
    out = np.zeros_like(src)
    for y in range(h):
        for x in range(w):
            if method == 1:
                pred = src[y, x - 1] if x > 0 else (src[y - 1, 0] if y > 0 else 0)
            elif method == 2:
                pred = src[y - 1, x] if y > 0 else (src[0, x - 1] if x > 0 else 0)
            else:
                if x == 0 and y == 0:
                    pred = 0
                elif y == 0:
                    pred = src[0, x - 1]
                elif x == 0:
                    pred = src[y - 1, 0]
                else:
                    pred = min(
                        255,
                        max(0, int(src[y, x - 1]) + int(src[y - 1, x]) - int(src[y - 1, x - 1])),
                    )
            out[y, x] = (src[y, x] - pred) & 0xFF
    return out.astype(np.uint8)
