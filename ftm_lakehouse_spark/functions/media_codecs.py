"""Pure-numpy/stdlib media codecs for the multimodal pipeline.

The formats below need NO external media libraries, so their decode
paths are REAL (bit-exact, tested), not stubs:

* images — PPM (``P6``), PGM (``P5``), uncompressed 24-bit BMP,
  PNG (full spec subset: 8-bit gray/RGB/palette/gray-alpha/RGBA,
  all five scanline filters, stdlib ``zlib`` inflate), and GIF
  (87a/89a, pure-Python LZW, local palettes, interlacing);
* audio — WAV PCM (8/16-bit, any channel count, stdlib ``wave``);
* "video" — an MJPEG-style container of concatenated PPM frames
  (the sampler parses real frame boundaries and decodes real frames).

Formats that genuinely need external codecs (JPEG/MP4/...) raise
``NotImplementedError`` with the library that would handle them — swap
in PIL / pyav on a cluster image that has them; callers and schemas do
not change.
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


def decode_image(blob: bytes, mime: str | None = None) -> np.ndarray:
    """blob → uint8 array (HxW grayscale or HxWx3 RGB). Real decode for
    PPM/PGM/BMP/PNG/GIF; formats that need external codecs name the
    library."""
    if blob[:2] in (b"P5", b"P6"):
        return _decode_pnm(blob)
    if blob[:2] == b"BM":
        return _decode_bmp(blob)
    if blob[:8] == _PNG_SIG:
        return _decode_png(blob)
    if blob[:6] in (b"GIF87a", b"GIF89a"):
        return _decode_gif(blob)
    if blob[:3] == b"\xff\xd8\xff":
        raise NotImplementedError("JPEG decode requires PIL/libjpeg (not in image)")
    raise NotImplementedError(f"unsupported image format (mime={mime!r})")


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
