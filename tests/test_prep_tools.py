"""Offline prep tools: index generator parity vs the reference module,
in-process A/V audio extraction end-to-end."""
import importlib.util
import io
import os
import random

import numpy as np
import pytest

from missm_tpu.data.index import (
    build_enterface_index, build_mvsa_index, extract_wav, write_wav,
)
from missm_tpu.data import ingest_io
from missm_tpu.ingest import native

REF = "/root/reference/src/utils/generate_index.py"


def _make_enterface_tree(root):
    # subject/emotion/sentence/x.avi layout: label = parts[-3] (emotion)
    for subj in ("s1", "s2"):
        for emo in ("anger", "joy"):
            d = root / subj / emo / "sen1"
            d.mkdir(parents=True, exist_ok=True)
            (d / "a.avi").write_bytes(b"x")
    return str(root)


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_enterface_index_parity(tmp_path):
    spec = importlib.util.spec_from_file_location("ref_gi", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    root = _make_enterface_tree(tmp_path)
    random.seed(2025)
    theirs = ref.eNTERFACE(root)
    random.seed(2025)
    mine = build_enterface_index(root)
    assert mine == theirs


@pytest.mark.skipif(not os.path.exists(REF), reason="reference not mounted")
def test_mvsa_index_parity(tmp_path):
    (tmp_path / "data").mkdir()
    rows = ["ID\ttext\timage\tmultimodal"]
    for i in range(5):
        (tmp_path / "data" / f"{i}.txt").write_text(f"text number {i}\n")
        rows.append(f"{i}\tpos\tneg\tneu")
    (tmp_path / "labelResultAll_vote.txt").write_text("\n".join(rows) + "\n")

    spec = importlib.util.spec_from_file_location("ref_gi2", REF)
    ref = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref)

    random.seed(2025)
    theirs = ref.mvsa(str(tmp_path))
    random.seed(2025)
    mine = build_mvsa_index(str(tmp_path))
    assert mine == theirs


@pytest.mark.skipif(not native.available(), reason="native ingest not built")
def test_extract_wav_from_avi(tmp_path, rng):
    from PIL import Image
    from tests.avi_writer import write_mjpeg_avi

    # 1-second 440 Hz tone @ 8 kHz in an MJPEG AVI
    sr = 8000
    t = np.arange(sr) / sr
    tone = (np.sin(2 * np.pi * 440 * t) * 0.5 * 32767).astype("<i2")
    buf = io.BytesIO()
    Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(buf, "JPEG")
    p = str(tmp_path / "av.avi")
    write_mjpeg_avi(p, [buf.getvalue()] * 4, 16, 16,
                    audio_pcm16=tone.tobytes(), audio_rate=sr)

    out = native.decode_media_audio(p)
    assert out is not None
    wav, got_sr = out
    assert got_sr == sr
    assert abs(len(wav) - sr) < 10

    # full extraction: resample to 16 kHz + wav write, reread
    wav_path = str(tmp_path / "out" / "a.wav")
    extract_wav(p, wav_path, 16000)
    re, re_sr = ingest_io.read_audio(wav_path)
    assert re_sr == 16000
    assert abs(len(re) - 16000) < 20
    # tone survives: dominant frequency ~440
    mid = re[2000:14000] * np.hanning(12000)
    peak_hz = np.argmax(np.abs(np.fft.rfft(mid))) * 16000 / len(mid)
    assert abs(peak_hz - 440) < 5


def test_write_wav_roundtrip(tmp_path, rng):
    wav = (rng.standard_normal(1000) * 0.1).astype(np.float32)
    p = str(tmp_path / "w.wav")
    write_wav(p, wav, 16000)
    got, sr = ingest_io.read_audio(p)
    assert sr == 16000
    # quantization + the 32767-encode / 32768-decode scale skew
    np.testing.assert_allclose(got, wav, atol=2.5 / 32768)
