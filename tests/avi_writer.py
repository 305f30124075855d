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
                    fps: int = 25, audio_pcm16: bytes = None,
                    audio_rate: int = 16000):
    n = len(jpeg_frames)
    max_size = max(len(j) for j in jpeg_frames)
    n_streams = 2 if audio_pcm16 else 1

    avih = struct.pack(
        "<IIIIIIIIIIIIII",
        int(1e6 / fps),  # microseconds per frame
        max_size * fps,  # max bytes per sec
        0,               # padding granularity
        0x10,            # flags: AVIF_HASINDEX
        n,               # total frames
        0,               # initial frames
        n_streams,       # streams
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

    strl_v = _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))

    strl_a = b""
    if audio_pcm16:
        n_samples = len(audio_pcm16) // 2
        strh_a = struct.pack(
            "<4s4sIHHIIIIIIIIhhhh",
            b"auds", b"\x00\x00\x00\x00",
            0, 0, 0, 0,
            1, audio_rate,           # scale, rate (samples/sec)
            0, n_samples,            # start, length (samples)
            audio_rate * 2,          # suggested buffer
            0xFFFFFFFF, 2,           # quality, sample size (block align)
            0, 0, 0, 0)
        # WAVEFORMATEX: PCM16 mono
        strf_a = struct.pack("<HHIIHH", 1, 1, audio_rate, audio_rate * 2,
                             2, 16)
        strl_a = _list(b"strl", _chunk(b"strh", strh_a)
                       + _chunk(b"strf", strf_a))

    hdrl = _list(b"hdrl", _chunk(b"avih", avih) + strl_v + strl_a)

    movi_chunks = [(b"00dc", j) for j in jpeg_frames]
    if audio_pcm16:
        movi_chunks.append((b"01wb", audio_pcm16))
    movi_payload = b"".join(_chunk(cc, payload)
                            for cc, payload in movi_chunks)
    movi = _list(b"movi", movi_payload)

    # idx1: offsets relative to 'movi' fourcc position
    idx_entries = []
    off = 4
    for cc, payload in movi_chunks:
        idx_entries.append(struct.pack("<4sIII", cc, 0x10, off,
                                       len(payload)))
        off += 8 + len(payload) + (len(payload) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))

    riff_payload = b"AVI " + hdrl + movi + idx1
    with open(path, "wb") as f:
        f.write(_chunk(b"RIFF", riff_payload))
