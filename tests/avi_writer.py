"""Minimal MJPEG-in-AVI writer (pure Python) — enough container structure
for FFmpeg to decode; used to exercise the native video ingest without an
encoder dependency."""
import io
import struct


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def write_mjpeg_avi(path: str, jpeg_frames, width: int, height: int,
                    fps: int = 25):
    n = len(jpeg_frames)
    max_size = max(len(j) for j in jpeg_frames)

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / fps),  # microseconds per frame
        max_size * fps,  # max bytes per sec
        0,               # padding granularity
        0x10,            # flags: AVIF_HASINDEX
        n,               # total frames
        0,               # initial frames
        1,               # streams
        max_size,        # suggested buffer size
        width, height,
        0, 0, 0, 0)      # reserved

    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG",
        0,               # flags
        0, 0,            # priority, language
        0,               # initial frames
        1, fps,          # scale, rate
        0, n, max_size,  # start, length, suggested buffer
        0xFFFFFFFF, 0,   # quality, sample size
        0, 0, width, height)

    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0)

    hdrl = _list(b"hdrl",
                 _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh)
                         + _chunk(b"strf", strf)))

    movi_payload = b"".join(_chunk(b"00dc", j) for j in jpeg_frames)
    movi = _list(b"movi", movi_payload)

    # idx1: offsets relative to 'movi' fourcc position
    idx_entries = []
    off = 4
    for j in jpeg_frames:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(_chunk(b"RIFF", riff_payload))
