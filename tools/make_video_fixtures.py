#!/usr/bin/env python3
"""Deterministic MP4 (ISO-BMFF) header fixtures for video_header_decode.

Real box layout: u32 BE size + 4CC, children nested inside moov/trak.
Fixtures exercise: v0 and v1 mvhd/tkhd (64-bit-time variant shifts every
field offset), multi-track files (audio tracks carry 0x0 dims, so the
video dims are the max over tracks), a 'free' box whose payload contains
the ASCII bytes 'moov'+'mvhd' (first-occurrence scans mis-lock; only box
hopping parses these — spec-pinned trap), and a non-MP4 file. Stdlib
only, byte-deterministic.
"""
import struct
from pathlib import Path

OUT = Path(__file__).resolve().parent.parent / "fixtures" / "video"


def box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def mvhd(timescale: int, duration: int, version: int = 0) -> bytes:
    times = struct.pack(">QQ" if version else ">II", 0, 0)  # ctime, mtime
    dur = struct.pack(">Q" if version else ">I", duration)
    tail = (struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
            + bytes(10) + ident_matrix() + bytes(24) + struct.pack(">I", 2))
    return box(b"mvhd", bytes([version, 0, 0, 0]) + times
               + struct.pack(">I", timescale) + dur + tail)


def ident_matrix() -> bytes:
    return struct.pack(">9I", 0x00010000, 0, 0, 0, 0x00010000, 0, 0, 0, 0x40000000)


def tkhd(track_id: int, w: int, h: int, version: int = 0) -> bytes:
    times = struct.pack(">QQ" if version else ">II", 0, 0)
    dur = struct.pack(">Q" if version else ">I", 0)
    body = (bytes([version, 0, 0, 7]) + times + struct.pack(">I", track_id)
            + bytes(4) + dur + bytes(8) + struct.pack(">HHHH", 0, 0, 0x0100, 0)
            + ident_matrix()
            + struct.pack(">II", w << 16, h << 16))
    return box(b"tkhd", body)


def trak(track_id: int, w: int, h: int, version: int = 0) -> bytes:
    return box(b"trak", tkhd(track_id, w, h, version))


def mp4(tracks, timescale: int, duration: int, version: int = 0,
        pre_moov: bytes = b"") -> bytes:
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    children = box(b"udta", b"\x00" * 4) + mvhd(timescale, duration, version)
    for (tid, w, h) in tracks:
        children += trak(tid, w, h, version)
    return ftyp + pre_moov + box(b"moov", children) + box(b"mdat", bytes(16))


def main() -> None:
    OUT.mkdir(parents=True, exist_ok=True)
    # the trap: a free box whose payload contains 'moov' and 'mvhd' 4CCs
    # plus a bogus timescale/duration block — box hopping must skip it
    trap = box(b"free", b"moovmvhd" + struct.pack(">II", 1, 1) + bytes(8))
    files = {
        "video_640x360.mp4": mp4([(1, 640, 360)], 1000, 2500, pre_moov=trap),
        "two_tracks_1920x1080.mp4":
            mp4([(1, 0, 0), (2, 1920, 1080)], 600, 1200),  # audio trak first
        "v1_times_320x240.mp4": mp4([(1, 320, 240)], 90000, 450000, version=1),
        "notvideo.bin": b"RIFF" + struct.pack("<I", 20) + b"AVI LIST" + bytes(12),
    }
    for name, payload in files.items():
        (OUT / name).write_bytes(payload)
        print(f"{name}: {len(payload)} bytes")


if __name__ == "__main__":
    main()
