#!/usr/bin/env python3
"""Deterministic image-header fixtures for the image_header_decode operator.

Generates REAL format bytes (valid PNG files; structurally-valid JPEG
segment streams) so the Spark-side header parser is exercised against the
actual on-disk layouts, not a synthetic stand-in:

- PNG: signature + IHDR (width/height/bit-depth/color-type at fixed
  offsets) + PLTE where the color type requires it + zlib IDAT + IEND,
  CRCs correct.
- JPEG: SOI + APP0(JFIF) + DQT + SOF0/SOF2 + DHT + SOS + EOI. The DQT
  payload deliberately CONTAINS the byte pair FF C0: a naive
  first-occurrence scan for the SOF marker mis-locks on it, so only a
  real segment walker (hop by each segment's length field) parses these
  files — that trap is spec-pinned.
- one non-image file (GIF87a header) for the unknown-format path.

Stdlib only; output is byte-deterministic (no timestamps, fixed zlib
level), so the committed fixtures regenerate identically.
"""
import struct
import zlib
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "images"


def png_chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def make_png(w: int, h: int, depth: int, ctype: int) -> bytes:
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[ctype]
    bits_per_pixel = depth * channels
    row_bytes = (w * bits_per_pixel + 7) // 8
    raw = b"".join(b"\x00" + b"\x00" * row_bytes for _ in range(h))
    out = b"\x89PNG\r\n\x1a\n"
    out += png_chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, ctype, 0, 0, 0))
    if ctype == 3:  # palette images require PLTE
        out += png_chunk(b"PLTE", bytes(range(3)) * 2)
    out += png_chunk(b"IDAT", zlib.compress(raw, 6))
    out += png_chunk(b"IEND", b"")
    return out


def jpeg_seg(marker: int, payload: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def make_jpeg(w: int, h: int, ncomp: int, precision: int = 8,
              progressive: bool = False) -> bytes:
    out = b"\xff\xd8"  # SOI
    out += jpeg_seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    # the FF C0 trap: quantization values are free bytes, so a conforming
    # file MAY contain the SOF0 marker pattern inside a table payload
    qt = bytes([0]) + (bytes([0xFF, 0xC0]) + bytes([16] * 62))[:64]
    out += jpeg_seg(0xDB, qt)
    comps = b"".join(bytes([i + 1, 0x11, 0]) for i in range(ncomp))
    out += jpeg_seg(0xC2 if progressive else 0xC0,
                    bytes([precision]) + struct.pack(">HH", h, w)
                    + bytes([ncomp]) + comps)
    out += jpeg_seg(0xC4, bytes([0]) + bytes(16))  # minimal DHT shell
    out += jpeg_seg(0xDA, bytes([ncomp])
                    + b"".join(bytes([i + 1, 0]) for i in range(ncomp))
                    + bytes([0, 63, 0]))
    out += b"\xff\xd9"  # EOI
    return out


def make_gif(w: int, h: int, color_res: int, version: bytes = b"89a") -> bytes:
    # logical screen descriptor: dims LE, packed (GCT flag + color
    # resolution bits 6-4 + GCT size), background, aspect; minimal GCT
    packed = 0x80 | ((color_res - 1) << 4) | 1
    gct = bytes(range(12))  # 2^(1+1)=4 entries x 3 -- sized for size bits 1
    return (b"GIF" + version + struct.pack("<HH", w, h)
            + bytes([packed, 0, 0]) + gct + b"\x3b")


def make_bmp(w: int, h: int, bit_count: int) -> bytes:
    # BITMAPINFOHEADER; h may be negative (top-down rows)
    row = (abs(w) * bit_count // 8 + 3) // 4 * 4
    data = bytes(row * abs(h))
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bit_count, 0,
                      len(data), 2835, 2835, 0, 0)
    hdr = struct.pack("<2sIHHI", b"BM", 14 + 40 + len(data), 0, 0, 14 + 40)
    return hdr + dib + data


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    files = {
        "rgb_640x480.png": make_png(640, 480, 8, 2),
        "gray16_16x32.png": make_png(16, 32, 16, 0),
        "palette_7x5.png": make_png(7, 5, 8, 3),
        "rgba_1x1.png": make_png(1, 1, 8, 6),
        "baseline_800x600.jpg": make_jpeg(800, 600, 3),
        "progressive_320x200.jpg": make_jpeg(320, 200, 3, progressive=True),
        "gray_1024x768.jpg": make_jpeg(1024, 768, 1),
        "gif87_4x4.gif": make_gif(4, 4, 1, version=b"87a"),
        "gif89_320x200.gif": make_gif(320, 200, 8),
        "bmp24_100x50.bmp": make_bmp(100, 50, 24),
        "bmp32_topdown_64x64.bmp": make_bmp(64, -64, 32),
        "notimage.bin": bytes([0x00, 0x01, 0x02, 0x03] * 4),
    }
    for name, data in files.items():
        (OUT / name).write_bytes(data)
        print(f"{name}: {len(data)} bytes")


if __name__ == "__main__":
    main()
