"""Pure-stdlib GIF codec (encoder + decoder) for the real-codec seam.

GIF is the fourth real image container the engine decodes with nothing
beyond the stdlib (after BMP: struct, PNG: struct+zlib, JPEG:
operators/jpeg.py): header + logical screen descriptor, global color
table, extension-block skipping, image descriptor, and genuine
variable-code-width LZW with clear/EOI codes and dictionary growth —
the actual compression algorithm, not a stored-mode shortcut.  The
encoder exists so fixtures are REAL compressed GIF files whose decode
exercises every dictionary path (including the KwKwK case).

Scope (documented, like the BMP/PNG/JPEG decoders): 8-bit color
tables, non-interlaced full-frame images (single via
``decode_gif_gray``, animated multi-frame via ``decode_gif_frames`` /
``encode_gif_animation`` — the video face of the seam), no
transparency compositing — the palette is reduced to integer BT.601
luminance exactly as the BMP path does.  Anything else raises
ValueError at the slot where PIL/ffmpeg would plug in.
"""

from __future__ import annotations

import struct


def _lzw_encode(data: bytes, min_code_size: int) -> bytes:
    """GIF-flavor LZW: variable code width starting min+1 bits,
    dictionary capped at 4096 with an explicit CLEAR reset, EOI
    terminator, little-endian bit packing."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)
    width = min_code_size + 1
    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    out_bits.append((clear, width))
    w = b""
    for ch in data:
        wk = w + bytes([ch])
        if wk in table:
            w = wk
        else:
            out_bits.append((table[w], width))
            table[wk] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
            if next_code > 4096:
                out_bits.append((clear, width))
                table = {bytes([i]): i for i in range(clear)}
                next_code = eoi + 1
                width = min_code_size + 1
            w = bytes([ch])
    if w:
        out_bits.append((table[w], width))
    out_bits.append((eoi, width))
    # little-endian bit packing
    acc = n = 0
    out = bytearray()
    for code, wd in out_bits:
        acc |= code << n
        n += wd
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> bytes:
    clear = 1 << min_code_size
    eoi = clear + 1
    width = min_code_size + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    out = bytearray()
    acc = n = pos = 0
    prev: bytes | None = None
    while len(out) < n_pixels:
        while n < width:
            if pos >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[pos] << n
            pos += 1
            n += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        n -= width
        if code == clear:
            table = [bytes([i]) for i in range(clear)] + [b"", b""]
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"invalid GIF LZW code {code}")
        if prev is not None and len(table) == (1 << width) and width < 12:
            width += 1
        out += entry
        prev = entry
    return bytes(out[:n_pixels])


def encode_gif_gray(img) -> bytes:
    """(H, W) uint8 grayscale ndarray → GIF89a bytes with an identity
    256-entry grayscale global color table (palette luminance is then
    the index itself, keeping the decode oracle pure arithmetic)."""
    h, w = img.shape
    hdr = b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0)  # GCT, 256 entries
    gct = b"".join(bytes((i, i, i)) for i in range(256))
    desc = b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
    lzw = _lzw_encode(img.tobytes(), 8)
    blocks = bytearray([8])  # min code size
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)  # block terminator
    return hdr + gct + desc + bytes(blocks) + b"\x3b"


def decode_gif_gray(buf: bytes):
    """GIF87a/89a → (H, W) uint8 luminance ndarray (integer BT.601
    over the color table, same reduction as the BMP palette path)."""
    import numpy as np

    b = bytes(buf)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF container")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    while pos < len(b):
        blk = b[pos]
        if blk == 0x21:  # extension: label + sub-blocks
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif blk == 0x2C:
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos + 1)
            pos += 10
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported (PIL slots in here)")
            if ct is None:
                raise ValueError("GIF image without a color table")
            mcs = b[pos]
            pos += 1
            lzw = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                lzw += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            idx = np.frombuffer(
                _lzw_decode(bytes(lzw), mcs, w * h), np.uint8
            ).reshape(h, w)
            lum = (
                (
                    ct[:, 0].astype(np.int64) * 299
                    + ct[:, 1].astype(np.int64) * 587
                    + ct[:, 2].astype(np.int64) * 114
                )
                // 1000
            ).astype(np.uint8)
            return lum[idx]
        elif blk == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{blk:02x}")
    raise ValueError("GIF contains no image descriptor")


def encode_gif_animation(frames, delay_cs: int = 4) -> bytes:
    """List of (H, W) uint8 frames (equal shape) → animated GIF89a:
    NETSCAPE loop extension, per-frame graphic-control extension with
    the given delay, each frame an independently LZW-coded full-frame
    image descriptor — a genuine multi-frame video container built
    from nothing but the stdlib."""
    h, w = frames[0].shape
    out = bytearray(b"GIF89a" + struct.pack("<HHBBB", w, h, 0xF7, 0, 0))
    out += b"".join(bytes((i, i, i)) for i in range(256))
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"  # loop forever
    for img in frames:
        if img.shape != (h, w):
            raise ValueError("animation frames must share one shape")
        out += b"\x21\xf9\x04\x00" + struct.pack("<H", delay_cs) + b"\x00\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0)
        lzw = _lzw_encode(img.tobytes(), 8)
        out.append(8)
        for i in range(0, len(lzw), 255):
            chunk = lzw[i : i + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0)
    out += b"\x3b"
    return bytes(out)


def decode_gif_frames(buf: bytes):
    """GIF87a/89a → list of (H, W) uint8 luminance frames: the video
    face of the stdlib codec seam.  Walks every image descriptor in
    the container (skipping graphic-control / application extensions),
    LZW-decodes each frame independently; full-frame non-interlaced
    descriptors only (partial-frame composition / disposal is where
    ffmpeg would slot in)."""
    import numpy as np

    b = bytes(buf)
    if b[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF container")
    sw, sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", b, 6)
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
        pos += n * 3
    frames = []
    while pos < len(b):
        blk = b[pos]
        if blk == 0x21:
            pos += 2
            while b[pos] != 0:
                pos += 1 + b[pos]
            pos += 1
        elif blk == 0x2C:
            left, top, w, h, ipacked = struct.unpack_from("<HHHHB", b, pos + 1)
            pos += 10
            if (left, top, w, h) != (0, 0, sw, sh):
                raise ValueError("partial-frame GIF composition unsupported (ffmpeg slots in here)")
            ct = gct
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                ct = np.frombuffer(b, np.uint8, n * 3, pos).reshape(n, 3)
                pos += n * 3
            if ipacked & 0x40:
                raise ValueError("interlaced GIF unsupported (PIL slots in here)")
            if ct is None:
                raise ValueError("GIF image without a color table")
            mcs = b[pos]
            pos += 1
            lzw = bytearray()
            while b[pos] != 0:
                ln = b[pos]
                lzw += b[pos + 1 : pos + 1 + ln]
                pos += 1 + ln
            pos += 1
            idx = np.frombuffer(
                _lzw_decode(bytes(lzw), mcs, w * h), np.uint8
            ).reshape(h, w)
            lum = (
                (
                    ct[:, 0].astype(np.int64) * 299
                    + ct[:, 1].astype(np.int64) * 587
                    + ct[:, 2].astype(np.int64) * 114
                )
                // 1000
            ).astype(np.uint8)
            frames.append(lum[idx])
        elif blk == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{blk:02x}")
    if not frames:
        raise ValueError("GIF contains no image descriptor")
    return frames
