"""Pure-Python WebP (VP8L lossless) codec — the last image-codec seam.

Rounds 4-7 closed Netpbm, PNG, and baseline+progressive JPEG with
nothing beyond the standard library; WebP remained PIL-delegated. This
module closes the LOSSLESS half (VP8L), which is pure entropy coding —
LSB-first bit reader, canonical prefix codes (both VP8L code forms:
2-symbol "simple" codes and full codes whose code lengths are themselves
prefix-coded with the 16/17/18 repeat symbols), meta-prefix entropy
images, an LRU-less color cache (multiplicative hash), and LZ77
backward references over the ARGB pixel stream — plus ALL FOUR spatial
transforms: subtract-green, color-indexing (including the <=16-color
sub-byte pixel bundling), and — since round 11 — the PREDICTOR (14
modes over the reconstructed neighborhood, forced edge modes, the
rightmost-column top-right wrap) and CROSS-COLOR (signed-byte
green->red / green->blue / red->blue deltas with arithmetic-shift
rounding) transforms, whose per-block sub-images ride the same entropy
coding. The transform arithmetic lives in ``webp_transforms.py``
(hypothesis-round-trip-tested in isolation before it was wired here);
this module owns the bitstream framing on both sides.

MAINTENANCE INVARIANT: the four registered decode queries hash THIS
module whole (closure-local import), but NOT ``webp_transforms.py`` —
the evidence fingerprint does not follow module-level imports
transitively. Any behavioral edit to webp_transforms.py MUST be
accompanied by bumping the revision tag on the next line so the decode
fingerprints move and the staleness gate sees the change.
webp_transforms rev: 3 (round 14: LZ77 2D distance plane codes wired —
decoder maps symbols 1..120 through the spec-derived neighborhood,
encoder optionally emits them; helpers staged in rounds 12-13)

Scope (honest limits, validated loudly — the PNG/JPEG pattern):

- VP8 LOSSY payloads ("VP8 " chunk) raise ValueError: a DCT video
  intraframe codec is out of scope for a data-pipeline container.
- The 2D distance plane-code map (distance symbols 1..120) DECODES via
  ``webp_transforms.plane_code_to_distance`` (RFC 9649 §4.2.2, the
  table re-derived from the spec's construction and pinned against its
  packed-nibble constants), and the encoder emits plane codes under
  ``plane_codes=True`` — the last entropy-coding seam that used to
  route real cwebp output to PIL. PIL remains the documented
  production path for arbitrary wild WebP (e.g. lossy VP8).

The encoder exists to make the decoder falsifiable without PIL: it can
emit the same raster through materially different code paths (pure
literals; LZ77 run copies with direct distances; color-cache hits;
subtract-green; palette/color-indexing with bundling; per-block
predictor residuals; cross-color-decorrelated planes), and the tests
assert all paths reproduce the source bytes exactly. A shared-author
round trip cannot prove spec conformance the way an independent decoder
could, but cross-PATH identity means a bug must exist identically in
two unrelated code shapes to hide — the baseline/progressive JPEG
technique (functions/jpeg.py).

No reference analogue (the reference is text-only: Main.scala:20-24);
this extends the multimodal north-star requirement.
"""

from __future__ import annotations

import struct

import numpy as np

from . import webp_transforms as _wt

# ---------------------------------------------------------------- bits

# RFC 9649 kCodeLengthCodeOrder — NOTE symbol 16 sits NINTH, not last.
# Round 15: the original transcription had 16 at the end; the shared
# encoder/decoder constant kept every self-round-trip green for seven
# rounds while making real-world interop silently impossible (streams
# whose code-length code uses >8 order slots misparse in either
# direction). Caught the first time an independent implementation was
# available to test against (libwebp rejected our streams; its own
# streams hit Kraft violations here), pinned by locating the constant
# in the reference binary. The conformance tests in test_webp.py now
# cross-validate both directions against libwebp whenever it is
# present, so this class of bug cannot survive a round again.
_CODE_LENGTH_ORDER = [17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15]
_MAX_ALLOWED_CODE_LENGTH = 15


class _BitReader:
    """LSB-first bit reader (VP8L convention: bits fill each byte from
    the least significant end; multi-bit fields are little-endian)."""

    def __init__(self, data: bytes) -> None:
        self._d = data
        self._nbits = len(data) * 8
        self.pos = 0  # in bits

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.pos + n > self._nbits:
            raise ValueError("VP8L: bitstream truncated")
        p, o = divmod(self.pos, 8)
        chunk = int.from_bytes(self._d[p : p + ((o + n + 7) >> 3)], "little")
        self.pos += n
        return (chunk >> o) & ((1 << n) - 1)

    def peek(self, n: int) -> int:
        """Up to ``n`` bits without consuming; bits past the end read as
        zero (the consuming ``advance`` enforces the boundary loudly)."""
        p, o = divmod(self.pos, 8)
        chunk = int.from_bytes(self._d[p : p + ((o + n + 7) >> 3)], "little")
        return (chunk >> o) & ((1 << n) - 1)

    def advance(self, n: int) -> None:
        if self.pos + n > self._nbits:
            raise ValueError("VP8L: bitstream truncated")
        self.pos += n


class _BitWriter:
    def __init__(self) -> None:
        self._out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, n: int) -> None:
        self._acc |= (value & ((1 << n) - 1)) << self._nbits
        self._nbits += n
        while self._nbits >= 8:
            self._out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._nbits -= 8

    def write_code(self, code: int, length: int) -> None:
        """Prefix codes are transmitted MSB-first bit by bit."""
        for i in range(length - 1, -1, -1):
            self.write((code >> i) & 1, 1)

    def bytes(self) -> bytes:
        out = bytearray(self._out)
        if self._nbits:
            out.append(self._acc & 0xFF)
        return bytes(out)


# ------------------------------------------------------------- huffman


class _Code:
    """Decoding table for one canonical prefix code: maps (length,
    MSB-first code value) -> symbol; ``zero_bit`` marks the degenerate
    single-symbol code that consumes no bits."""

    __slots__ = ("table", "max_len", "zero_bit_symbol")

    def __init__(self, table, max_len, zero_bit_symbol=None):
        self.table = table
        self.max_len = max_len
        self.zero_bit_symbol = zero_bit_symbol

    def decode(self, br: _BitReader) -> int:
        if self.zero_bit_symbol is not None:
            return self.zero_bit_symbol
        # ONE buffered peek instead of a read() per bit (the decode hot
        # path); the stream is LSB-first, the code MSB-first, so code
        # bit i is peek bit i. advance() re-checks the true stream end,
        # so a match assembled from past-the-end zero padding still
        # fails loudly.
        peek = br.peek(self.max_len)
        code = 0
        table = self.table
        for length in range(1, self.max_len + 1):
            code = (code << 1) | ((peek >> (length - 1)) & 1)
            sym = table.get((length, code))
            if sym is not None:
                br.advance(length)
                return sym
        raise ValueError("VP8L: invalid prefix code in bitstream")


def _canonical_code(lengths: list[int]) -> _Code:
    """Build the canonical prefix code (RFC-1951 numbering: codes assigned
    in length-major, then symbol order). Rejects incomplete or
    oversubscribed codes — except the degenerate one-symbol case, which
    VP8L treats as a zero-bit code."""
    nz = [(l, s) for s, l in enumerate(lengths) if l > 0]
    if not nz:
        raise ValueError("VP8L: prefix code with no symbols")
    if len(nz) == 1:
        return _Code({}, 0, zero_bit_symbol=nz[0][1])
    max_len = max(l for l, _ in nz)
    if max_len > _MAX_ALLOWED_CODE_LENGTH:
        raise ValueError("VP8L: code length exceeds 15")
    kraft = sum(1 << (max_len - l) for l, _ in nz)
    if kraft != (1 << max_len):
        raise ValueError("VP8L: prefix code not complete (Kraft violation)")
    bl_count = [0] * (max_len + 1)
    for l, _ in nz:
        bl_count[l] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for l in range(1, max_len + 1):
        code = (code + bl_count[l - 1]) << 1
        next_code[l] = code
    table = {}
    for sym, l in enumerate(lengths):
        if l > 0:
            table[(l, next_code[l])] = sym
            next_code[l] += 1
    return _Code(table, max_len)


def _bit_reverse(code: int, length: int) -> int:
    r = 0
    for _ in range(length):
        r = (r << 1) | (code & 1)
        code >>= 1
    return r


def _canonical_encoder(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (BIT-REVERSED code, length) for the same canonical
    numbering: prefix codes transmit MSB-first into the LSB-first stream,
    so pre-reversing once per code lets the hot emit path be a single
    ``_BitWriter.write`` instead of a per-bit loop."""
    code = _canonical_code(lengths)
    if code.zero_bit_symbol is not None:
        return {code.zero_bit_symbol: (0, 0)}
    return {sym: (_bit_reverse(c, l), l) for (l, c), sym in code.table.items()}


def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _Code:
    """One prefix code: the 1-2 symbol 'simple' form or the full form
    whose code lengths are themselves prefix-coded."""
    if br.read(1):  # simple code
        num_symbols = br.read(1) + 1
        if br.read(1):  # first symbol in 8 bits
            sym0 = br.read(8)
        else:
            sym0 = br.read(1)
        if num_symbols == 2:
            # codes follow TRANSMISSION order (first symbol -> code 0),
            # not canonical symbol order
            sym1 = br.read(8)
            if sym0 >= alphabet_size or sym1 >= alphabet_size or sym0 == sym1:
                raise ValueError("VP8L: invalid simple code symbols")
            return _Code({(1, 0): sym0, (1, 1): sym1}, 1)
        if sym0 >= alphabet_size:
            raise ValueError("VP8L: invalid simple code symbol")
        return _Code({}, 0, zero_bit_symbol=sym0)
    # full code: read the code-length code, then the lengths
    num_code_lengths = 4 + br.read(4)
    cl_lengths = [0] * 19
    for i in range(num_code_lengths):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    cl_code = _canonical_code(cl_lengths)
    if br.read(1):  # explicit max_symbol
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size and max_symbol > 0:
        max_symbol -= 1
        sym = cl_code.decode(br)
        if sym < 16:
            lengths[i] = sym
            i += 1
            if sym:
                prev_len = sym
        elif sym == 16:
            for _ in range(3 + br.read(2)):
                if i >= alphabet_size:
                    raise ValueError("VP8L: code length repeat overruns alphabet")
                lengths[i] = prev_len
                i += 1
        elif sym == 17:
            i += 3 + br.read(3)
        else:  # 18
            i += 11 + br.read(7)
        if i > alphabet_size:
            raise ValueError("VP8L: code length run overruns alphabet")
    return _canonical_code(lengths)


def _prefix_value(code: int, br: _BitReader) -> int:
    """LZ77 length/distance prefix decoding: 1-based value from the
    prefix symbol plus extra bits."""
    if code < 4:
        return code + 1
    extra = (code - 2) >> 1
    offset = (2 + (code & 1)) << extra
    return offset + br.read(extra) + 1


def _prefix_symbol(value: int) -> tuple[int, int, int]:
    """Inverse of _prefix_value: (prefix code, extra-bit payload, nbits)."""
    if value <= 4:
        return value - 1, 0, 0
    v = value - 1
    extra = v.bit_length() - 2
    rem = v - (2 << extra)
    if rem < (1 << extra):
        return 2 * extra + 2, rem, extra
    return 2 * extra + 3, rem - (1 << extra), extra


_HASH_MUL = 0x1E35A7BD


def _cache_index(argb: int, bits: int) -> int:
    return ((_HASH_MUL * argb) & 0xFFFFFFFF) >> (32 - bits)


# ------------------------------------------------------------- decoder


def _decode_entropy_image(br: _BitReader, w: int, h: int) -> list[int]:
    """A transform/meta sub-image: an entropy-coded ARGB image with no
    transforms of its own (spec: only the top-level image carries
    transforms; sub-images may still use a color cache)."""
    return _decode_pixels(br, w, h, level0=False)


def _decode_pixels(br: _BitReader, w: int, h: int, level0: bool) -> list[int]:
    # spec order: color-cache info FIRST, then the prefix-code section
    # whose leading bit (top level only) announces a meta prefix image
    cache_bits = 0
    cache = None
    if br.read(1):
        cache_bits = br.read(4)
        if not 1 <= cache_bits <= 11:
            raise ValueError("VP8L: invalid color cache size")
        cache = [0] * (1 << cache_bits)
    meta = None
    meta_bits = 0
    if level0 and br.read(1):
        meta_bits = br.read(3) + 2
        mw = (w + (1 << meta_bits) - 1) >> meta_bits
        mh = (h + (1 << meta_bits) - 1) >> meta_bits
        meta = _decode_entropy_image(br, mw, mh)
        num_groups = max((p >> 8) & 0xFFFF for p in meta) + 1
    else:
        num_groups = 1
    groups = []
    for _ in range(num_groups):
        green = _read_prefix_code(br, 256 + 24 + (1 << cache_bits if cache_bits else 0))
        red = _read_prefix_code(br, 256)
        blue = _read_prefix_code(br, 256)
        alpha = _read_prefix_code(br, 256)
        dist = _read_prefix_code(br, 40)
        groups.append((green, red, blue, alpha, dist))

    n = w * h
    out: list[int] = []
    mw = ((w + (1 << meta_bits) - 1) >> meta_bits) if meta is not None else 0

    def push(argb: int) -> None:
        out.append(argb)
        if cache is not None:
            cache[_cache_index(argb, cache_bits)] = argb

    while len(out) < n:
        if meta is not None:
            x = len(out) % w
            y = len(out) // w
            mp = meta[(y >> meta_bits) * mw + (x >> meta_bits)]
            g_code, r_code, b_code, a_code, d_code = groups[(mp >> 8) & 0xFFFF]
        else:
            g_code, r_code, b_code, a_code, d_code = groups[0]
        sym = g_code.decode(br)
        if sym < 256:
            r = r_code.decode(br)
            b = b_code.decode(br)
            a = a_code.decode(br)
            push((a << 24) | (r << 16) | (sym << 8) | b)
        elif sym < 256 + 24:
            length = _prefix_value(sym - 256, br)
            dist_code = _prefix_value(d_code.decode(br), br)
            # symbols 1..120 are the 2D plane-code neighborhood at THIS
            # stream's width (sub-images decode at their own xsize);
            # >120 is linear — both handled by the spec-derived helper
            dist = _wt.plane_code_to_distance(w, dist_code)
            if dist < 1 or dist > len(out):
                raise ValueError("VP8L: backward reference out of range")
            for _ in range(length):
                push(out[-dist])
                if len(out) > n:
                    raise ValueError("VP8L: backward reference overruns image")
        else:
            if cache is None:
                raise ValueError("VP8L: cache symbol without color cache")
            out.append(cache[sym - 256 - 24])  # cache hit does not re-insert
        if len(out) > n:
            raise ValueError("VP8L: pixel stream overruns image")
    return out


def decode_webp(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode a lossless WebP (VP8L) payload into (width, height,
    channels, uint8 HxWxC array). Channels is 4 when the header declares
    alpha, else 3. Raises ValueError on anything outside the supported
    (and therefore tested) surface — see the module docstring."""
    if len(data) < 20 or data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP (RIFF/WEBP) container")
    chunk = data[12:16]
    if chunk == b"VP8 ":
        raise ValueError("VP8 lossy WebP unsupported (DCT codec out of scope)")
    if chunk == b"VP8X":
        raise ValueError("VP8X extended WebP unsupported; re-encode as plain VP8L")
    if chunk != b"VP8L":
        raise ValueError(f"unknown WebP chunk {chunk!r}")
    size = struct.unpack("<I", data[16:20])[0]
    payload = data[20 : 20 + size]
    if len(payload) < size:
        raise ValueError("VP8L: chunk truncated")
    if payload[0] != 0x2F:
        raise ValueError("VP8L: bad signature byte")
    br = _BitReader(payload[1:])
    w = br.read(14) + 1
    h = br.read(14) + 1
    alpha_used = br.read(1)
    if br.read(3) != 0:
        raise ValueError("VP8L: unknown version")

    # transforms (top level only), applied inversely in reverse order
    transforms: list[tuple] = []
    xsize = w
    while br.read(1):
        ttype = br.read(2)
        if any(t[0] == ttype for t in transforms):
            raise ValueError("VP8L: duplicate transform")
        if ttype == 2:  # subtract green
            transforms.append((2,))
        elif ttype == 3:  # color indexing
            palette_size = br.read(8) + 1
            palette = _decode_entropy_image(br, palette_size, 1)
            # palette entries are delta-coded componentwise
            for i in range(1, palette_size):
                p, q = palette[i], palette[i - 1]
                palette[i] = (
                    (((p >> 24) + (q >> 24)) & 0xFF) << 24
                    | ((((p >> 16) & 0xFF) + ((q >> 16) & 0xFF)) & 0xFF) << 16
                    | ((((p >> 8) & 0xFF) + ((q >> 8) & 0xFF)) & 0xFF) << 8
                    | (((p & 0xFF) + (q & 0xFF)) & 0xFF)
                )
            if palette_size <= 2:
                xbits = 3
            elif palette_size <= 4:
                xbits = 2
            elif palette_size <= 16:
                xbits = 1
            else:
                xbits = 0
            transforms.append((3, palette, xbits, xsize))
            xsize = (xsize + (1 << xbits) - 1) >> xbits
        else:  # 0 = predictor, 1 = cross-color: same header + sub-image
            size_bits = br.read(3) + 2
            sub_w = (xsize + (1 << size_bits) - 1) >> size_bits
            sub_h = (h + (1 << size_bits) - 1) >> size_bits
            sub = _decode_entropy_image(br, sub_w, sub_h)
            # xsize at parse time IS the pixel-buffer width when this
            # transform's inverse runs: inverses apply in reverse stream
            # order, so any later width-changing transform (color
            # indexing) has already been undone by then
            transforms.append((ttype, size_bits, sub, xsize))

    pixels = _decode_pixels(br, xsize, h, level0=True)

    for t in reversed(transforms):
        if t[0] == 0:  # predictor: add back per-block-mode predictions
            _, size_bits, modes, tw = t
            pixels = _wt.predictor_inverse(pixels, tw, h, modes, size_bits)
        elif t[0] == 1:  # cross-color: restore r/b from green-scaled deltas
            _, size_bits, ctes, tw = t
            pixels = _wt.cross_color_inverse(pixels, tw, h, ctes, size_bits)
        elif t[0] == 2:  # add green back
            for i, p in enumerate(pixels):
                g = (p >> 8) & 0xFF
                r = (((p >> 16) & 0xFF) + g) & 0xFF
                b = ((p & 0xFF) + g) & 0xFF
                pixels[i] = (p & 0xFF00FF00) | (r << 16) | b
        else:  # color indexing: indices live in the green channel
            _, palette, xbits, full_w = t
            if xbits == 0:
                try:
                    pixels = [palette[(p >> 8) & 0xFF] for p in pixels]
                except IndexError:
                    raise ValueError("VP8L: palette index out of range") from None
            else:
                per = 1 << xbits
                mask = (1 << (8 >> xbits)) - 1
                bits = 8 >> xbits
                packed_w = (full_w + per - 1) >> xbits
                unbundled = []
                for y in range(h):
                    row = pixels[y * packed_w : (y + 1) * packed_w]
                    line = []
                    for p in row:
                        g = (p >> 8) & 0xFF
                        for k in range(per):
                            line.append((g >> (k * bits)) & mask)
                    del line[full_w:]
                    try:
                        unbundled.extend(palette[i] for i in line)
                    except IndexError:
                        raise ValueError("VP8L: palette index out of range") from None
                pixels = unbundled

    if len(pixels) != w * h:
        raise ValueError("VP8L: decoded pixel count mismatch")
    arr = np.array(pixels, dtype=np.uint32).reshape(h, w)
    a = (arr >> 24).astype(np.uint8)
    r = ((arr >> 16) & 0xFF).astype(np.uint8)
    g = ((arr >> 8) & 0xFF).astype(np.uint8)
    b = (arr & 0xFF).astype(np.uint8)
    if alpha_used:
        return w, h, 4, np.stack([r, g, b, a], axis=-1)
    return w, h, 3, np.stack([r, g, b], axis=-1)


# ------------------------------------------------------------- encoder


def _scaled_lengths(freqs: dict[int, int], alphabet_size: int, max_len: int) -> list[int]:
    """Huffman code lengths capped at ``max_len`` by halving counts until
    the tree fits (simple, always-terminating depth limiter)."""
    import heapq

    counts = dict(freqs)
    while True:
        heap = [(c, sym, None) for sym, c in counts.items()]
        if not heap:
            raise ValueError("empty alphabet")
        if len(heap) == 1:
            sym = heap[0][1]
            lengths = [0] * alphabet_size
            lengths[sym] = 1
            return lengths  # caller pads to completeness
        heapq.heapify(heap)
        serial = alphabet_size  # tie-breaker ids for internal nodes
        while len(heap) > 1:
            c1, s1, n1 = heapq.heappop(heap)
            c2, s2, n2 = heapq.heappop(heap)
            heapq.heappush(heap, (c1 + c2, serial, ((c1, s1, n1), (c2, s2, n2))))
            serial += 1
        lengths = [0] * alphabet_size
        depth_ok = True

        stack = [(heap[0], 0)]
        while stack:
            (c, s, kids), d = stack.pop()
            if kids is None:
                if d > max_len:
                    depth_ok = False
                    break
                lengths[s] = max(d, 1)
            else:
                stack.append((kids[0], d + 1))
                stack.append((kids[1], d + 1))
        if depth_ok:
            return lengths
        counts = {s: (c + 1) // 2 for s, c in counts.items()}


def _complete_lengths(freqs: dict[int, int], alphabet_size: int) -> list[int]:
    """Kraft-complete code lengths for the used symbols; a single-symbol
    histogram gets a dummy partner so the canonical code is complete
    (the decoder's strict Kraft check is part of the spec surface)."""
    if len(freqs) == 1:
        (sym,) = freqs
        lengths = [0] * alphabet_size
        lengths[sym] = 1
        dummy = 0 if sym != 0 else 1
        lengths[dummy] = 1
        return lengths
    return _scaled_lengths(freqs, alphabet_size, _MAX_ALLOWED_CODE_LENGTH)


def _write_full_code(bw: _BitWriter, lengths: list[int]) -> None:
    """Emit one full prefix code: RLE the lengths with 16/17/18, prefix-
    code the RLE symbols with the 19-symbol code-length code."""
    # RLE pass
    tokens: list[tuple[int, int, int]] = []  # (symbol, extra payload, extra bits)
    i = 0
    n = len(lengths)
    while i < n:
        l = lengths[i]
        if l == 0:
            run = 1
            while i + run < n and lengths[i + run] == 0:
                run += 1
            i += run
            while run >= 11:
                take = min(run, 11 + 127)
                tokens.append((18, take - 11, 7))
                run -= take
            while run >= 3:
                take = min(run, 3 + 7)
                tokens.append((17, take - 3, 3))
                run -= take
            for _ in range(run):
                tokens.append((0, 0, 0))
            continue
        tokens.append((l, 0, 0))
        i += 1
        run = 0
        while i + run < n and lengths[i + run] == l:
            run += 1
        taken = 0
        while run - taken >= 3:
            take = min(run - taken, 3 + 3)
            tokens.append((16, take - 3, 2))
            taken += take
        # any sub-3 remainder falls back to literal lengths on the next
        # outer iterations
        i += taken
    # code-length code over the token symbols
    cl_freqs: dict[int, int] = {}
    for s, _, _ in tokens:
        cl_freqs[s] = cl_freqs.get(s, 0) + 1
    cl_lengths = (
        _complete_lengths(cl_freqs, 19)
        if len(cl_freqs) > 1
        else _pad_single(cl_freqs, 19)
    )
    # depth cap 7: the header stores each code-length-code length in 3 bits
    if max(cl_lengths) > 7:
        cl_lengths = _scaled_lengths(cl_freqs, 19, 7)
        if len([l for l in cl_lengths if l]) == 1:
            cl_lengths = _pad_single(cl_freqs, 19)
    enc = _canonical_encoder(cl_lengths)
    bw.write(0, 1)  # not simple
    # num_code_lengths: enough of the fixed order to cover every used entry
    used = max(
        (idx for idx, sym in enumerate(_CODE_LENGTH_ORDER) if cl_lengths[sym] > 0),
        default=0,
    )
    num_code_lengths = max(4, used + 1)
    bw.write(num_code_lengths - 4, 4)
    for k in range(num_code_lengths):
        bw.write(cl_lengths[_CODE_LENGTH_ORDER[k]], 3)
    bw.write(0, 1)  # no explicit max_symbol
    for s, payload, nbits in tokens:
        c, l = enc[s]
        bw.write(c, l)
        if nbits:
            bw.write(payload, nbits)


def _pad_single(freqs: dict[int, int], alphabet_size: int) -> list[int]:
    (sym,) = freqs
    lengths = [0] * alphabet_size
    lengths[sym] = 1
    lengths[0 if sym != 0 else 1] = 1
    return lengths


def _write_prefix_code(bw: _BitWriter, freqs: dict[int, int], alphabet_size: int) -> dict:
    """Emit a code for ``freqs`` (simple form when 1-2 symbols all <256,
    else full form); returns the symbol->(code,length) encoder map."""
    syms = sorted(freqs)
    if 1 <= len(syms) <= 2 and all(s < 256 for s in syms):
        bw.write(1, 1)  # simple
        bw.write(len(syms) - 1, 1)
        if syms[0] > 1:
            bw.write(1, 1)
            bw.write(syms[0], 8)
        else:
            bw.write(0, 1)
            bw.write(syms[0], 1)
        if len(syms) == 2:
            bw.write(syms[1], 8)
            return {syms[0]: (0, 1), syms[1]: (1, 1)}
        return {syms[0]: (0, 0)}
    lengths = _complete_lengths(freqs, alphabet_size)
    _write_full_code(bw, lengths)
    return _canonical_encoder(lengths)


def encode_webp(
    width: int,
    height: int,
    pixels: bytes,
    channels: int = 3,
    *,
    use_lz77: bool = True,
    cache_bits: int = 0,
    subtract_green: bool = False,
    palette: bool = False,
    predictor: bool = False,
    cross_color: bool = False,
    transform_bits: int = 4,
    plane_codes: bool = False,
) -> bytes:
    """Encode raw pixel bytes (HxWxC, C in {3,4}) as a lossless WebP.

    The mode flags select materially different bitstream shapes (the
    cross-path test surface): greedy LZ77 run copies with direct
    distances 1 and width, a color cache, the subtract-green transform,
    a palette (color-indexing transform, with sub-byte bundling when
    the palette has <=16 colors), per-block PREDICTOR residuals, or
    CROSS-COLOR decorrelation (both with mode/delta sub-images of block
    size 2**transform_bits, chosen per block by the deterministic
    minimum-residual searches in webp_transforms.py). All decode back
    bit-identically. Transform stream order follows the forward
    application order subtract-green -> predictor -> cross-color (the
    decoder inverts in reverse); palette does not combine with the
    spatial transforms (indices are not a metric space to predict
    over)."""
    if channels not in (3, 4):
        raise ValueError("channels must be 3 (RGB) or 4 (RGBA)")
    if palette and (predictor or cross_color):
        raise ValueError("palette mode does not compose with predictor/cross-color")
    if not 2 <= transform_bits <= 9:
        raise ValueError("transform_bits out of the 3-bit header range 2..9")
    if not 1 <= width <= 1 << 14 or not 1 <= height <= 1 << 14:
        raise ValueError("dimensions out of VP8L range")
    n = width * height
    if len(pixels) != n * channels:
        raise ValueError("pixel buffer size mismatch")
    px = np.frombuffer(pixels, dtype=np.uint8).reshape(n, channels).astype(np.uint32)
    r, g, b = px[:, 0], px[:, 1], px[:, 2]
    a = px[:, 3] if channels == 4 else np.full(n, 255, dtype=np.uint32)
    argb = ((a << 24) | (r << 16) | (g << 8) | b).tolist()
    alpha_used = channels == 4 and bool((a != 255).any())

    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if alpha_used else 0, 1)
    bw.write(0, 3)  # version

    xsize = width
    if palette:
        if subtract_green:
            raise ValueError("palette mode composes poorly with subtract_green here")
        colors = sorted(set(argb))
        if len(colors) > 256:
            raise ValueError("palette mode needs <=256 distinct colors")
        index_of = {c: i for i, c in enumerate(colors)}
        psize = len(colors)
        bw.write(1, 1)  # transform present
        bw.write(3, 2)  # color indexing
        bw.write(psize - 1, 8)
        # palette as a delta-coded entropy image (literal-only)
        deltas = []
        prev = 0
        for c in colors:
            d = (
                (((c >> 24) - (prev >> 24)) & 0xFF) << 24
                | ((((c >> 16) & 0xFF) - ((prev >> 16) & 0xFF)) & 0xFF) << 16
                | ((((c >> 8) & 0xFF) - ((prev >> 8) & 0xFF)) & 0xFF) << 8
                | (((c & 0xFF) - (prev & 0xFF)) & 0xFF)
            )
            deltas.append(d)
            prev = c
        _encode_pixel_stream(
            bw, deltas, cache_bits=0, use_lz77=False, width=psize, level0=False
        )
        if psize <= 2:
            xbits = 3
        elif psize <= 4:
            xbits = 2
        elif psize <= 16:
            xbits = 1
        else:
            xbits = 0
        idx = [index_of[c] for c in argb]
        if xbits:
            per = 1 << xbits
            bits = 8 >> xbits
            packed_w = (width + per - 1) >> xbits
            packed = []
            for y in range(height):
                row = idx[y * width : (y + 1) * width]
                for start in range(0, width, per):
                    gbyte = 0
                    for k, v in enumerate(row[start : start + per]):
                        gbyte |= v << (k * bits)
                    packed.append(0xFF000000 | (gbyte << 8))
            argb = packed
            xsize = packed_w
        else:
            argb = [0xFF000000 | (i << 8) for i in idx]
    elif subtract_green:
        bw.write(1, 1)
        bw.write(2, 2)
        argb = [
            (p & 0xFF00FF00)
            | (((((p >> 16) & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF) << 16)
            | ((((p & 0xFF) - ((p >> 8) & 0xFF)) & 0xFF))
            for p in argb
        ]
    if predictor:
        bw.write(1, 1)  # transform present
        bw.write(0, 2)  # predictor
        bw.write(transform_bits - 2, 3)
        modes = _wt.choose_predictor_modes(argb, xsize, height, transform_bits)
        sub_w = (xsize + (1 << transform_bits) - 1) >> transform_bits
        _encode_pixel_stream(
            bw, modes, cache_bits=0, use_lz77=False, width=sub_w, level0=False
        )
        argb = _wt.predictor_forward(argb, xsize, height, modes, transform_bits)
    if cross_color:
        bw.write(1, 1)  # transform present
        bw.write(1, 2)  # cross-color
        bw.write(transform_bits - 2, 3)
        ctes = _wt.choose_cross_color_deltas(argb, xsize, height, transform_bits)
        sub_w = (xsize + (1 << transform_bits) - 1) >> transform_bits
        _encode_pixel_stream(
            bw, ctes, cache_bits=0, use_lz77=False, width=sub_w, level0=False
        )
        argb = _wt.cross_color_forward(argb, xsize, height, ctes, transform_bits)
    bw.write(0, 1)  # no more transforms

    _encode_pixel_stream(
        bw, argb, cache_bits=cache_bits, use_lz77=use_lz77, width=xsize,
        plane_codes=plane_codes,
    )

    payload = b"\x2f" + bw.bytes()
    vp8l = b"VP8L" + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        vp8l += b"\x00"  # RIFF pads odd chunks
    riff = b"WEBP" + vp8l
    return b"RIFF" + struct.pack("<I", len(riff)) + riff + b""


def _encode_pixel_stream(
    bw: _BitWriter,
    argb: list[int],
    *,
    cache_bits: int,
    use_lz77: bool,
    width: int,
    level0: bool = True,
    plane_codes: bool = False,
) -> None:
    """Tokenize one ARGB stream (literals / copy(len,dist) with direct
    distance codes / cache hits), then emit the five prefix codes and the
    token stream. No meta codes (single group); the meta bit exists only
    in top-level streams (spec), so sub-images skip it."""
    cache = [0] * (1 << cache_bits) if cache_bits else None
    tokens: list[tuple] = []  # ('lit', argb) | ('copy', len, dist) | ('hit', idx)
    n = len(argb)
    i = 0
    while i < n:
        if use_lz77 and i > 0:
            # greedy: prefer the longer of a dist-1 or dist-width run
            best_len, best_dist = 0, 0
            for dist in (1, width):
                if dist == 0 or dist > i:
                    continue
                l = 0
                while i + l < n and l < 4096 and argb[i + l] == argb[i + l - dist]:
                    l += 1
                if l > best_len:
                    best_len, best_dist = l, dist
            if best_len >= 3:
                tokens.append(("copy", best_len, best_dist))
                if cache is not None:
                    for k in range(best_len):
                        p = argb[i + k]
                        cache[_cache_index(p, cache_bits)] = p
                i += best_len
                continue
        p = argb[i]
        if cache is not None and cache[_cache_index(p, cache_bits)] == p:
            tokens.append(("hit", _cache_index(p, cache_bits)))
        else:
            tokens.append(("lit", p))
            if cache is not None:
                cache[_cache_index(p, cache_bits)] = p
        i += 1

    green_f: dict[int, int] = {}
    red_f: dict[int, int] = {}
    blue_f: dict[int, int] = {}
    alpha_f: dict[int, int] = {}
    dist_f: dict[int, int] = {}
    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            green_f[(p >> 8) & 0xFF] = green_f.get((p >> 8) & 0xFF, 0) + 1
            red_f[(p >> 16) & 0xFF] = red_f.get((p >> 16) & 0xFF, 0) + 1
            blue_f[p & 0xFF] = blue_f.get(p & 0xFF, 0) + 1
            alpha_f[(p >> 24) & 0xFF] = alpha_f.get((p >> 24) & 0xFF, 0) + 1
        elif t[0] == "copy":
            lcode, _, _ = _prefix_symbol(t[1])
            green_f[256 + lcode] = green_f.get(256 + lcode, 0) + 1
            dsym = (
                _wt.distance_to_plane_code(width, t[2])
                if plane_codes else t[2] + 120
            )
            dcode, _, _ = _prefix_symbol(dsym)
            dist_f[dcode] = dist_f.get(dcode, 0) + 1
        else:
            green_f[256 + 24 + t[1]] = green_f.get(256 + 24 + t[1], 0) + 1
    for f in (red_f, blue_f, alpha_f, dist_f):
        if not f:
            f[0] = 1  # unused alphabet still needs a (simple) code

    # spec order: color-cache info first, then (top level only) the
    # meta-prefix-image bit
    if cache_bits:
        bw.write(1, 1)
        bw.write(cache_bits, 4)
    else:
        bw.write(0, 1)
    if level0:
        bw.write(0, 1)  # no meta prefix image
    green_alpha = 256 + 24 + ((1 << cache_bits) if cache_bits else 0)
    g_enc = _write_prefix_code(bw, green_f, green_alpha)
    r_enc = _write_prefix_code(bw, red_f, 256)
    b_enc = _write_prefix_code(bw, blue_f, 256)
    a_enc = _write_prefix_code(bw, alpha_f, 256)
    d_enc = _write_prefix_code(bw, dist_f, 40)

    for t in tokens:
        if t[0] == "lit":
            p = t[1]
            c, l = g_enc[(p >> 8) & 0xFF]
            bw.write(c, l)
            c, l = r_enc[(p >> 16) & 0xFF]
            bw.write(c, l)
            c, l = b_enc[p & 0xFF]
            bw.write(c, l)
            c, l = a_enc[(p >> 24) & 0xFF]
            bw.write(c, l)
        elif t[0] == "copy":
            lcode, payload, nbits = _prefix_symbol(t[1])
            c, l = g_enc[256 + lcode]
            bw.write(c, l)
            if nbits:
                bw.write(payload, nbits)
            dsym = (
                _wt.distance_to_plane_code(width, t[2])
                if plane_codes else t[2] + 120
            )
            dcode, payload, nbits = _prefix_symbol(dsym)
            c, l = d_enc[dcode]
            bw.write(c, l)
            if nbits:
                bw.write(payload, nbits)
        else:
            c, l = g_enc[256 + 24 + t[1]]
            bw.write(c, l)
