#!/usr/bin/env python3
"""Deterministic audio-header fixtures for the audio_header_decode operator.

Real RIFF/WAVE layout: 'RIFF' + size + 'WAVE', then chunks (4CC + LE u32
size + payload, odd sizes padded). One fixture plants the bytes 'fmt '
INSIDE a LIST chunk payload that precedes the real fmt chunk — a naive
first-occurrence scan locks onto it and reads garbage, so only a real
chunk walker (hop by size fields) parses that file; the trap is
spec-pinned. Stdlib only, byte-deterministic.
"""
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "audio"


def chunk(cid: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return cid + struct.pack("<I", len(payload)) + payload + pad


def wav(rate: int, channels: int, bits: int, n_frames: int,
        pre_chunks: bytes = b"") -> bytes:
    byte_rate = rate * channels * bits // 8
    block_align = channels * bits // 8
    fmt = struct.pack("<HHIIHH", 1, channels, rate, byte_rate, block_align, bits)
    data = bytes(n_frames * block_align)
    body = b"WAVE" + pre_chunks + chunk(b"fmt ", fmt) + chunk(b"data", data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    # the trap: a LIST chunk whose payload contains the 4CC 'fmt ' (and a
    # bogus tiny "format block") before the real fmt chunk
    trap = chunk(b"LIST", b"INFOfmt " + struct.pack("<HHIIHH", 1, 9, 1, 1, 1, 9))
    files = {
        "pcm16_stereo_44100.wav": wav(44100, 2, 16, 441),
        # odd-sized LIST payload: the walker must hop 8 + size + pad byte
        "pcm8_mono_8000.wav": wav(8000, 1, 8, 80,
                                  pre_chunks=chunk(b"LIST", b"INFOx")),
        "pcm24_mono_48000.wav": wav(48000, 1, 24, 48),
        "listtrap_22050.wav": wav(22050, 2, 16, 220, pre_chunks=trap),
        "notaudio.bin": b"OggS" + bytes(24),
    }
    for name, payload in files.items():
        (OUT / name).write_bytes(payload)
        print(f"{name}: {len(payload)} bytes")


if __name__ == "__main__":
    main()
