"""Pure-numpy/stdlib media codecs for the multimodal pipeline.

The formats below need NO external media libraries, so their decode
paths are REAL (bit-exact, tested), not stubs:

* images — PPM (``P6``), PGM (``P5``), uncompressed 24-bit BMP,
  PNG (full spec subset: 8-bit gray/RGB/palette/gray-alpha/RGBA,
  all five scanline filters, stdlib ``zlib`` inflate), GIF
  (87a/89a, pure-Python LZW, local palettes, interlacing), and
  baseline JPEG (SOF0, grayscale or YCbCr at any integer sampling
  incl. 4:2:0/4:2:2/4:4:4, restart markers, numpy IDCT) with a
  matching baseline encoder (Annex K tables, libjpeg quality
  scaling, optional 4:2:0);
* audio — WAV PCM (8/16-bit, any channel count, stdlib ``wave``);
* "video" — an MJPEG-style container of concatenated PPM frames
  (the sampler parses real frame boundaries and decodes real frames).

Formats that genuinely need external codecs (progressive/arithmetic
JPEG, MP3, MP4/H.264) raise ``NotImplementedError`` with the library
that would handle them — swap in PIL / pyav on a cluster image that
has them; callers and schemas do not change.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

__all__ = [
    "decode_image",
    "decode_wav",
    "encode_ppm",
    "encode_bmp",
    "encode_png",
    "encode_jpeg",
    "encode_wav",
    "resize_nearest",
    "split_ppm_frames",
]


# ------------------------------------------------------------- images
def _decode_pnm(blob: bytes) -> np.ndarray:
    """P5 (grayscale) / P6 (RGB) binary PNM. Returns HxW or HxWx3
    uint8."""
    # header: magic, whitespace/comment-separated width height maxval
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(blob) and blob[pos : pos + 1].isspace():
            pos += 1
        if blob[pos : pos + 1] == b"#":  # comment to end of line
            pos = blob.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(blob) and not blob[end : end + 1].isspace():
            end += 1
        fields.append(int(blob[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PNM needs no extra lib but is unused")
    channels = 3 if blob[:2] == b"P6" else 1
    data = np.frombuffer(blob, dtype=np.uint8, count=w * h * channels, offset=pos)
    arr = data.reshape(h, w, channels)
    return arr[:, :, 0] if channels == 1 else arr


def _decode_bmp(blob: bytes) -> np.ndarray:
    """Uncompressed 24-bit BI_RGB BMP → HxWx3 uint8 (RGB order)."""
    if blob[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = struct.unpack_from("<I", blob, 10)[0]
    header_size = struct.unpack_from("<I", blob, 14)[0]
    if header_size < 40:
        raise NotImplementedError("BITMAPCOREHEADER BMP")
    w, h = struct.unpack_from("<ii", blob, 18)
    planes, bpp = struct.unpack_from("<HH", blob, 26)
    compression = struct.unpack_from("<I", blob, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={compression}")
    flipped = h > 0
    h = abs(h)
    stride = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    rows = np.frombuffer(blob, dtype=np.uint8, count=stride * h, offset=data_offset)
    rows = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)
    if flipped:  # BMP stores bottom-up
        rows = rows[::-1]
    return rows[:, :, ::-1].copy()  # BGR → RGB


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Invert PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth).

    ``raw`` is the inflated byte stream: h rows of (1 filter byte +
    stride data bytes). Sub/Up/None invert vectorized (Sub via a modular
    cumsum over byte lanes ``bpp`` apart); Average/Paeth carry a
    left+up dependency so those rows fall back to a per-byte loop —
    correct for all encoders, and rare in practice (most write 0/2)."""
    raw = raw.reshape(h, stride + 1)
    filters, data = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((h, stride), dtype=np.int32)
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        row, f = data[y], int(filters[y])
        if f == 0:  # None
            cur = row
        elif f == 1:  # Sub: x + left; cumsum per lane, mod 256
            n_lanes = -(-stride // bpp)
            padded = np.zeros(n_lanes * bpp, dtype=np.int64)
            padded[:stride] = row
            cur = (padded.reshape(n_lanes, bpp).cumsum(axis=0).reshape(-1)[:stride]) % 256
        elif f == 2:  # Up
            cur = (row + prev) % 256
        elif f == 3:  # Average
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = cur[i - bpp] if i >= bpp else 0
                cur[i] = (row[i] + (left + prev[i]) // 2) % 256
        elif f == 4:  # Paeth
            cur = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[i] = (row[i] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f}")
        out[y] = cur
        prev = cur
    return out.astype(np.uint8)


def _decode_png(blob: bytes) -> np.ndarray:
    """PNG → uint8 HxW (grayscale) or HxWx3 (RGB; alpha dropped).

    Stdlib-only: chunk walk + zlib inflate + numpy unfilter. Supports
    bit depth 8, color types 0/2/3/4/6, non-interlaced (Adam7 raises)."""
    if blob[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos, idat, plte = 8, [], None
    w = h = depth = color = interlace = None
    while pos + 8 <= len(blob):
        length, ctype = struct.unpack_from(">I4s", blob, pos)
        body = blob[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            w, h, depth, color, _comp, _filt, interlace = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
    if w is None:
        raise ValueError("PNG missing IHDR")
    if interlace:
        raise NotImplementedError("Adam7-interlaced PNG")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth}")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color)
    if channels is None:
        raise ValueError(f"bad PNG color type {color}")
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * channels
    if raw.size != h * (stride + 1):
        raise ValueError("PNG pixel data size mismatch")
    pixels = _png_unfilter(raw, h, stride, channels).reshape(h, w, channels)
    if color == 3:  # palette indices → RGB
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        return plte[pixels[:, :, 0]]
    if color == 0:
        return pixels[:, :, 0]
    if color == 4:  # gray+alpha → gray
        return pixels[:, :, 0]
    return np.ascontiguousarray(pixels[:, :, :3])  # RGB / RGBA→RGB


def encode_png(arr: np.ndarray) -> bytes:
    """HxW (gray) or HxWx3 (RGB) uint8 → PNG, filter 0, stdlib zlib."""
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    color = 0 if gray else 2
    body = arr.reshape(h, -1)
    scanlines = np.concatenate([np.zeros((h, 1), dtype=np.uint8), body], axis=1)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
        return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    idat = zlib.compress(scanlines.tobytes(), 6)
    return _PNG_SIG + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    """GIF-variant LZW: variable code width, CLEAR/EOI codes, MSB-last
    bit packing within little-endian bytes."""
    clear, eoi = 1 << min_code_size, (1 << min_code_size) + 1
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0
    base = [bytes([i]) for i in range(1 << min_code_size)] + [b"", b""]
    table = list(base)
    width = min_code_size + 1
    acc = nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = list(base)
                width = min_code_size + 1
                prev = None
                continue
            if code == eoi:
                return out[:n_out]
            if code < len(table):
                entry = table[code]
                if prev is not None:
                    table.append(prev + entry[:1])
            elif prev is not None and code == len(table):
                entry = prev + prev[:1]
                table.append(entry)
            else:
                raise ValueError("corrupt LZW stream")
            out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
            n_out += len(entry)
            prev = entry
            if len(table) == (1 << width) and width < 12:
                width += 1
    return out[:n_out]


def _decode_gif(blob: bytes) -> np.ndarray:
    """GIF87a/89a first frame → HxWx3 RGB. Stdlib-free LZW + palette;
    handles local color tables, Adam-style interlacing, and skips
    extension blocks (animation: first frame only, like a thumbnailer)."""
    if blob[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(blob):
        block = blob[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while blob[pos]:
                pos += 1 + blob[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _lx, _ty, w, h, iflags = struct.unpack_from("<HHHHB", blob, pos + 1)
            pos += 10
            palette = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                palette = np.frombuffer(blob, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if palette is None:
                raise ValueError("GIF frame without color table")
            min_code = blob[pos]
            pos += 1
            chunks = []
            while blob[pos]:
                ln = blob[pos]
                chunks.append(blob[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1
            idx = _lzw_decode(b"".join(chunks), min_code, w * h)
            if idx.size < w * h:
                raise ValueError("GIF pixel data truncated")
            idx = idx[: w * h].reshape(h, w)
            if iflags & 0x40:  # interlaced: 4-pass row shuffle
                order = np.concatenate(
                    [np.arange(0, h, 8), np.arange(4, h, 8),
                     np.arange(2, h, 4), np.arange(1, h, 2)]
                )
                deinter = np.empty_like(idx)
                deinter[order] = idx
                idx = deinter
            return palette[idx]
        elif block == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"bad GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")


def encode_gif(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 → GIF89a using a ≤256-color palette built from the
    image (raises if it needs more) and literal-code LZW (a CLEAR every
    flush keeps codes at the minimum width — valid, just uncompressed).
    Test-fixture helper, same role as encode_ppm."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif: more than 256 distinct colors")
    depth = max(2, int(np.ceil(np.log2(max(len(palette), 2)))))
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 7), 0, 0)
    out += pal.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
    min_code = depth
    clear, eoi = 1 << min_code, (1 << min_code) + 1
    width = min_code + 1
    acc = nbits = 0
    stream = bytearray()

    def emit(code):
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            stream.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    emit(clear)
    # literal codes only; CLEAR before the table would grow past width
    budget = (1 << width) - eoi - 2
    for i, px in enumerate(idx.ravel()):
        if budget == 0:
            emit(clear)
            budget = (1 << width) - eoi - 2
        emit(int(px))
        budget -= 1
    emit(eoi)
    if nbits:
        stream.append(acc & 0xFF)
    out.append(min_code)
    for i in range(0, len(stream), 255):
        chunk = stream[i : i + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00\x3b"
    return bytes(out)


# --------------------------------------------------------------- JPEG
# Baseline DCT JFIF, pure numpy/stdlib — no libjpeg. Covers the
# overwhelmingly common case (SOF0 baseline, 8-bit, grayscale or
# YCbCr with any integer sampling factors incl. 4:2:0/4:2:2/4:4:4,
# restart markers). Progressive (SOF2) and arithmetic coding still
# raise with the library that would handle them.

#: orthonormal 8x8 DCT-II basis: spatial = B.T @ coeffs @ B
_DCT_B = np.array(
    [
        [
            (np.sqrt(0.125) if u == 0 else 0.5) * np.cos((2 * x + 1) * u * np.pi / 16)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

_ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
])


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00 byte
    unstuffing; stops at any real marker (0xFF xx, xx≠0)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:  # restart marker mid-fill
                raise _RestartMarker()
            else:
                raise ValueError(f"unexpected marker 0xFF{nxt:02x} in scan")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def restart(self) -> None:
        """Consume an RSTn marker at a byte boundary (DRI intervals)."""
        self.acc = 0
        self.nbits = 0
        while self.data[self.pos] != 0xFF or self.data[self.pos + 1] == 0x00:
            self.pos += 1  # skip pad bits / stuffing remnants
        if not (0xD0 <= self.data[self.pos + 1] <= 0xD7):
            raise ValueError("expected restart marker")
        self.pos += 2


class _RestartMarker(Exception):
    pass


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length <= 16:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in scan")


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map ``size``-bit magnitude to signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _decode_jpeg(blob: bytes) -> np.ndarray:
    """Baseline JFIF → HxW (grayscale) or HxWx3 uint8 RGB."""
    if blob[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    h = w = 0
    restart_interval = 0
    scan_comps: list[dict] = []
    while pos < len(blob):
        if blob[pos] != 0xFF:
            pos += 1
            continue
        marker = blob[pos + 1]
        pos += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI
            break
        seg_len = struct.unpack(">H", blob[pos : pos + 2])[0]
        seg = blob[pos + 2 : pos + seg_len]
        if marker == 0xDB:  # DQT
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0xF
                off += 1
                if pq:  # 16-bit table
                    vals = np.frombuffer(seg, ">u2", 64, off).astype(np.int32)
                    off += 128
                else:
                    vals = np.frombuffer(seg, np.uint8, 64, off).astype(np.int32)
                    off += 64
                table = np.zeros(64, np.int32)
                table[_ZIGZAG] = vals
                qt[tq] = table.reshape(8, 8)
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext. seq.)
            h, w = struct.unpack(">HH", seg[1:5])
            n = seg[5]
            comps = [
                {
                    "id": seg[6 + 3 * i],
                    "h": seg[7 + 3 * i] >> 4,
                    "v": seg[7 + 3 * i] & 0xF,
                    "tq": seg[8 + 3 * i],
                }
                for i in range(n)
            ]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "non-baseline JPEG (progressive/arithmetic) requires PIL/libjpeg"
            )
        elif marker == 0xC4:  # DHT
            off = 0
            while off < len(seg):
                tc, th = seg[off] >> 4, seg[off] & 0xF
                counts = seg[off + 1 : off + 17]
                off += 17
                table: dict[tuple[int, int], int] = {}
                code = 0
                for length in range(1, 17):
                    for _ in range(counts[length - 1]):
                        table[(length, code)] = seg[off]
                        off += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for i in range(ns):
                cid, tt = seg[1 + 2 * i], seg[2 + 2 * i]
                c = next(c for c in comps if c["id"] == cid)
                scan_comps.append({**c, "td": tt >> 4, "ta": tt & 0xF})
            pos += seg_len
            break
        pos += seg_len
    if not scan_comps:
        raise ValueError("no SOS in JPEG")

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in scan_comps
    }
    reader = _BitReader(blob, pos)
    pred = {c["id"]: 0 for c in scan_comps}
    B = _DCT_B
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                reader.restart()
                pred = {c["id"]: 0 for c in scan_comps}
            n_mcu += 1
            for c in scan_comps:
                q = qt[c["tq"]]
                dc_tab, ac_tab = huff[(0, c["td"])], huff[(1, c["ta"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        size = _huff_decode(reader, dc_tab)
                        diff = _extend(reader.receive(size), size) if size else 0
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            sym = _huff_decode(reader, ac_tab)
                            run, size = sym >> 4, sym & 0xF
                            if sym == 0x00:  # EOB
                                break
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            zz[k] = _extend(reader.receive(size), size)
                            k += 1
                        coeffs = np.zeros(64, np.float64)
                        coeffs[_ZIGZAG] = zz
                        block = B.T @ (coeffs.reshape(8, 8) * q) @ B + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[c["id"]][y0 : y0 + 8, x0 : x0 + 8] = block
    out_planes = []
    for c in scan_comps:
        p = planes[c["id"]]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        return np.clip(np.round(out_planes[0]), 0, 255).astype(np.uint8)
    y, cb, cr = out_planes[0], out_planes[1] - 128.0, out_planes[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def decode_image(blob: bytes, mime: str | None = None) -> np.ndarray:
    """blob → uint8 array (HxW grayscale or HxWx3 RGB). Real decode for
    PPM/PGM/BMP/PNG/GIF/baseline-JPEG; formats that need external
    codecs name the library."""
    if blob[:2] in (b"P5", b"P6"):
        return _decode_pnm(blob)
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:8] == _PNG_SIG:
        return _decode_png(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(blob)
    if blob[:3] == b"\xff\xd8\xff":
        return _decode_jpeg(blob)
    raise NotImplementedError(f"unsupported image format (mime={mime!r})")


# Annex K (JPEG spec, public) huffman + quantization constants
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHR = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))
_AC_LUM = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
        0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
        0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
        0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
        0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
        0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
        0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_AC_CHR = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
        0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
        0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
        0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
        0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
        0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
        0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
        0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
    ],
)
_Q_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61, 12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56, 14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77, 24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101, 72, 92, 95, 98, 112, 100, 103, 99,
]).reshape(8, 8)
_Q_CHR = np.array([
    17, 18, 24, 47, 99, 99, 99, 99, 18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99, 47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99, 99,
]).reshape(8, 8)


def _codes_from_spec(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[i]] = (code, length)
            i += 1
            code += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | code
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)  # byte stuffing

    def pad_to_byte(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec

    def raw_marker(self, byte2: int) -> None:
        """Emit an unstuffed marker (RSTn) at a byte boundary."""
        self.pad_to_byte()
        self.buf += bytes([0xFF, byte2])

    def flush(self) -> bytes:
        self.pad_to_byte()
        return bytes(self.buf)


def _scale_q(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    pred: int,
    dc: dict[int, tuple[int, int]],
    ac: dict[int, tuple[int, int]],
) -> int:
    coeffs = _DCT_B @ (block - 128.0) @ _DCT_B.T
    quant = np.round(coeffs / q).astype(np.int32)
    zz = quant.reshape(-1)[_ZIGZAG]

    def put_val(v: int, size: int) -> None:
        if size:
            writer.put(v if v >= 0 else v + (1 << size) - 1, size)

    diff = int(zz[0]) - pred
    size = int(abs(diff)).bit_length()
    writer.put(*dc[size])
    put_val(diff, size)
    run = 0
    last = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            writer.put(*ac[0xF0])  # ZRL
            run -= 16
        size = abs(v).bit_length()
        writer.put(*ac[run * 16 + size])
        put_val(v, size)
        run = 0
    if last < 63:
        writer.put(*ac[0x00])  # EOB
    return int(zz[0])


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """HxW (grayscale) or HxWx3 uint8 RGB → baseline JFIF bytes.
    ``subsample=True`` emits 4:2:0 (2x2 luma sampling) — the common
    camera layout, and the decoder's chroma-upsampling test path.
    ``restart_interval`` emits DRI + RSTn markers every N MCUs (what
    camera JPEGs do for error resilience)."""
    arr = np.asarray(arr, dtype=np.float64)
    gray = arr.ndim == 2
    h, w = arr.shape[:2]
    if gray:
        planes = [arr]
        samps = [(1, 1)]
    else:
        r, g, b = arr[..., 0], arr[..., 1], arr[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # pad to even, 2x2 box-average chroma
            ph, pw = (h + 1) & ~1, (w + 1) & ~1
            def pad(p):
                return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = pad(cb).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = pad(cr).reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            planes, samps = [y, cb, cr], [(2, 2), (1, 1), (1, 1)]
        else:
            planes, samps = [y, cb, cr], [(1, 1), (1, 1), (1, 1)]
    q_lum, q_chr = _scale_q(_Q_LUM, quality), _scale_q(_Q_CHR, quality)
    qts = [q_lum] + ([q_chr] if not gray else [])

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tq, q in enumerate(qts):
        zz = q.reshape(-1)[_ZIGZAG].astype(np.uint8)
        out += b"\xff\xdb" + struct.pack(">HB", 67, tq) + zz.tobytes()
    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for i in range(ncomp):
        hs, vs = samps[i]
        sof += struct.pack("BBB", i + 1, hs * 16 + vs, 0 if i == 0 else 1)
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    tables = [(0, 0, _DC_LUM), (1, 0, _AC_LUM)]
    if not gray:
        tables += [(0, 1, _DC_CHR), (1, 1, _AC_CHR)]
    for tc, th, (bits, vals) in tables:
        body = bytes([tc * 16 + th]) + bytes(bits) + bytes(vals)
        out += b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    sos = bytes([ncomp])
    for i in range(ncomp):
        sos += bytes([i + 1, 0 if i == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    dc_l, ac_l = _codes_from_spec(*_DC_LUM), _codes_from_spec(*_AC_LUM)
    dc_c, ac_c = _codes_from_spec(*_DC_CHR), _codes_from_spec(*_AC_CHR)
    hmax = max(s[0] for s in samps)
    vmax = max(s[1] for s in samps)
    mcux = (w + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    padded = []
    for p, (hs, vs) in zip(planes, samps):
        th_, tw_ = mcuy * vs * 8, mcux * hs * 8
        padded.append(
            np.pad(p, ((0, th_ - p.shape[0]), (0, tw_ - p.shape[1])), mode="edge")
        )
    writer = _BitWriter()
    pred = [0] * ncomp
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                writer.raw_marker(0xD0 + (n_mcu // restart_interval - 1) % 8)
                pred = [0] * ncomp
            n_mcu += 1
            for i in range(ncomp):
                hs, vs = samps[i]
                q = qts[0] if i == 0 else qts[1]
                dc, ac = (dc_l, ac_l) if i == 0 else (dc_c, ac_c)
                for by in range(vs):
                    for bx in range(hs):
                        y0, x0 = (my * vs + by) * 8, (mx * hs + bx) * 8
                        block = padded[i][y0 : y0 + 8, x0 : x0 + 8]
                        pred[i] = _encode_block(writer, block, q, pred[i], dc, ac)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def encode_ppm(arr: np.ndarray) -> bytes:
    """HxW or HxWx3 uint8 → binary PPM/PGM (test fixture helper)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        return b"P5\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]) + arr.tobytes()
    return b"P6\n%d %d\n255\n" % (arr.shape[1], arr.shape[0]) + arr.tobytes()


def encode_bmp(arr: np.ndarray) -> bytes:
    """HxWx3 uint8 RGB → uncompressed 24-bit BMP (bottom-up)."""
    arr = np.asarray(arr, dtype=np.uint8)
    h, w, _ = arr.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # RGB→BGR, flip
    pixels = rows.tobytes()
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pixels), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + info + pixels


def resize_nearest(arr: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index arithmetic."""
    h, w = arr.shape[:2]
    ys = (np.arange(out_h) * h // out_h).clip(0, h - 1)
    xs = (np.arange(out_w) * w // out_w).clip(0, w - 1)
    return arr[ys][:, xs]


# -------------------------------------------------------------- audio
def decode_wav(blob: bytes) -> tuple[np.ndarray, int]:
    """WAV PCM → (mono float64 samples in [-1, 1], sample_rate)."""
    with wave.open(io.BytesIO(blob), "rb") as wf:
        rate = wf.getframerate()
        n = wf.getnframes()
        width = wf.getsampwidth()
        channels = wf.getnchannels()
        raw = wf.readframes(n)
    if width == 2:
        samples = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        samples = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"{width * 8}-bit WAV")
    if channels > 1:
        samples = samples.reshape(-1, channels).mean(axis=1)
    return samples, rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """float samples in [-1, 1] → 16-bit mono WAV (test fixture)."""
    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


# -------------------------------------------------------------- video
def split_ppm_frames(blob: bytes) -> list[bytes]:
    """Parse an MJPEG-style container of concatenated binary PPM frames
    into per-frame byte slices (REAL boundary parsing: each frame's
    length comes from its own header, no delimiter guessing)."""
    frames, pos = [], 0
    while pos < len(blob) and blob[pos : pos + 2] in (b"P5", b"P6"):
        # reuse the PNM header scan to find the pixel-data extent
        sub = blob[pos:]
        hdr_pos, fields = 2, []
        while len(fields) < 3:
            while sub[hdr_pos : hdr_pos + 1].isspace():
                hdr_pos += 1
            if sub[hdr_pos : hdr_pos + 1] == b"#":
                hdr_pos = sub.index(b"\n", hdr_pos) + 1
                continue
            end = hdr_pos
            while not sub[end : end + 1].isspace():
                end += 1
            fields.append(int(sub[hdr_pos:end]))
            hdr_pos = end
        hdr_pos += 1
        w, h, _ = fields
        channels = 3 if sub[:2] == b"P6" else 1
        size = hdr_pos + w * h * channels
        frames.append(sub[:size])
        pos += size
    return frames
