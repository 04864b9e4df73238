"""Pure-Python Netpbm (PPM/PGM) image decode — the executable half of the
multimodal codec seam.

The container ships no imaging library (PIL/opencv), so the production
``decode_image_real`` operator needs a codec that actually runs on real
pixel data without new dependencies. Binary Netpbm is that format: the
header is ASCII (`P6\\n<width> <height>\\n<maxval>\\n`), the payload is raw
big-endian samples — width*height*3 bytes for P6 (RGB) or width*height for
P5 (grayscale) at maxval <= 255. Decoding is a header parse plus one
``np.frombuffer`` — no compression, no codec tables — which makes it the
honest minimal decoder: real bytes in, real pixel array out.

PIL remains the documented production path for compressed formats
(JPEG/PNG/WebP); ``decode_image_real`` tries it first and falls back here
for Netpbm payloads, so the same operator runs today and upgrades in place
when a codec library lands.

No reference analogue (the reference is text-only: Main.scala:20-24); this
implements the multimodal north-star requirement.
"""

from __future__ import annotations

import numpy as np

_MAGIC_CHANNELS = {b"P5": 1, b"P6": 3}


def encode_ppm(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Assemble a binary Netpbm payload (P6 for 3 channels, P5 for 1) from
    raw 8-bit samples. ``pixels`` must hold exactly width*height*channels
    bytes — the encoder is the test-fixture generator, so it validates."""
    if channels not in (1, 3):
        raise ValueError(f"channels must be 1 or 3, got {channels}")
    if len(pixels) != width * height * channels:
        raise ValueError(
            f"pixel buffer holds {len(pixels)} bytes, need {width * height * channels}"
        )
    magic = b"P6" if channels == 3 else b"P5"
    return magic + f"\n{width} {height}\n255\n".encode("ascii") + pixels


def decode_netpbm(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a binary Netpbm payload -> (width, height, channels, pixel
    array of shape (height, width, channels), dtype uint8).

    Handles the full header grammar: `#` comments between tokens and any
    whitespace run as a separator, with the single whitespace byte after
    maxval delimiting the raster (per the Netpbm spec). maxval > 255
    (2-byte samples) is rejected — out of scope for 8-bit training
    pipelines. Raises ValueError on malformed input, never truncates
    silently."""
    b = bytes(payload)
    magic = b[:2]
    if magic not in _MAGIC_CHANNELS:
        raise ValueError(f"not a binary Netpbm payload (magic {magic!r})")
    channels = _MAGIC_CHANNELS[magic]

    # tokenize the header: 3 ASCII integers (width, height, maxval),
    # separated by whitespace, with #-to-EOL comments allowed
    pos, tokens = 2, []
    while len(tokens) < 3:
        while pos < len(b) and b[pos : pos + 1].isspace():
            pos += 1
        if pos >= len(b):
            raise ValueError("truncated Netpbm header")
        if b[pos : pos + 1] == b"#":
            while pos < len(b) and b[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(b) and not b[pos : pos + 1].isspace():
            pos += 1
        tok = b[start:pos]
        if not tok.isdigit():
            raise ValueError(f"bad Netpbm header token {tok!r}")
        tokens.append(int(tok))
    width, height, maxval = tokens
    if width <= 0 or height <= 0:
        raise ValueError(f"bad Netpbm dimensions {width}x{height}")
    if not 0 < maxval <= 255:
        raise ValueError(f"unsupported Netpbm maxval {maxval} (8-bit only)")
    pos += 1  # the single whitespace byte after maxval
    n = width * height * channels
    raster = b[pos : pos + n]
    if len(raster) != n:
        raise ValueError(f"raster holds {len(raster)} bytes, need {n}")
    return width, height, channels, np.frombuffer(raster, dtype=np.uint8).reshape(
        height, width, channels
    )
