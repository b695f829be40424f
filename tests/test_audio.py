"""Real audio/video codec layer (core/audio.py) + the multimodal
operators over it: WAV round-trip and chunk walking, closed-form DSP
invariants, sine-wave spectral centroid, M-PNG demux, and the typed
error path for genuinely-unsupported codecs."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawler_spark.core.audio import (audio_feature_vector, mpng_decode,
                                      mpng_encode, wav_decode, wav_encode)
from crawler_spark.core.imaging import png_encode, render_image


def test_wav_roundtrip_and_chunk_walk():
    s = (np.sin(np.linspace(0, 40 * np.pi, 4000)) * 20000).astype(np.int16)
    data = wav_encode(s, 16000)
    out, sr = wav_decode(data)
    assert sr == 16000 and (out == s).all()
    # an extra chunk between fmt and data must be skipped (real WAV
    # files carry LIST/fact chunks); odd-sized chunks are word-aligned
    extra = struct.pack("<4sI", b"LIST", 5) + b"INFOx" + b"\x00"
    patched = data[:36] + extra + data[36:]
    patched = patched[:4] + struct.pack(
        "<I", len(patched) - 8) + patched[8:]
    out2, sr2 = wav_decode(patched)
    assert sr2 == 16000 and (out2 == s).all()


def test_wav_rejects_foreign_containers():
    with pytest.raises(ValueError, match="RIFF"):
        wav_decode(b"ID3\x04rest-of-an-mp3-file")
    # PCM float (fmt 3) / stereo / 8-bit are real boundaries
    s = np.zeros(10, np.int16)
    bad = bytearray(wav_encode(s, 8000))
    bad[20] = 3  # fmt tag -> IEEE float
    with pytest.raises(ValueError, match="unsupported encoding"):
        wav_decode(bytes(bad))


def test_square_wave_features_closed_form():
    amp, half, n = 12000, 5, 1003
    i = np.arange(n)
    s = np.where((i // half) % 2 == 0, amp, -amp).astype(np.int16)
    f = audio_feature_vector(s, 8000)
    assert f["n_samples"] == n
    assert f["peak"] * 32768 == amp          # exact, see oracle note
    assert f["rms"] * 32768 == amp
    assert f["zero_crossings"] == (n - 1) // half


def test_sine_centroid_tracks_frequency():
    sr, freq, n = 8000, 440.0, 8000
    t = np.arange(n) / sr
    s = (np.sin(2 * np.pi * freq * t) * 30000).astype(np.int16)
    f = audio_feature_vector(s, sr)
    # a pure tone's power-weighted centroid sits on the tone
    assert abs(f["centroid_hz"] - freq) < 2.0
    assert f["rms"] == pytest.approx(30000 / 32768 / np.sqrt(2), rel=1e-3)


def test_mpng_roundtrip_and_trailing_guard():
    frames = [png_encode(render_image(f"f{i}", 8, 6)) for i in range(4)]
    blob = mpng_encode(frames)
    assert mpng_decode(blob) == frames
    with pytest.raises(ValueError, match="trailing"):
        mpng_decode(blob + b"junk")
    with pytest.raises(ValueError, match="MPNG"):
        mpng_decode(b"RIFFnope")


def test_operators_real_and_error_paths(spark):
    from crawler_spark.operators.multimodal import (audio_features,
                                                    frame_sample)
    wav = wav_encode((np.ones(100) * 5000).astype(np.int16), 8000)
    rows = [("good", bytearray(wav)),
            ("mp3ish", bytearray(b"ID3\x04not-really-audio"))]
    df = spark.createDataFrame(rows, "sample_id string, bytes binary")
    got = {r["sample_id"]: r for r in audio_features(df).collect()}
    assert got["good"]["n_samples"] == 100
    assert got["good"]["error_msg"] is None
    assert got["good"]["zero_crossings"] == 0  # constant signal
    # unsupported codec surfaces as a typed error row, not a fake
    assert got["mp3ish"]["error_msg"] and got["mp3ish"]["rms"] is None

    frames = [png_encode(render_image(f"g{i}", 8, 6)) for i in range(5)]
    vdf = spark.createDataFrame([("v", bytearray(mpng_encode(frames)))],
                                "video_id string, bytes binary")
    out = frame_sample(vdf, every_n=2).orderBy("frame_index").collect()
    assert [r["frame_index"] for r in out] == [0, 2, 4]
    assert all(r["n_frames"] == 5 and r["frame_w"] == 8
               and r["frame_h"] == 6 for r in out)
    # emitted frame bytes decode back to the exact rendered pixels
    from crawler_spark.core.imaging import png_decode
    assert (png_decode(bytes(out[1]["frame_bytes"]))
            == render_image("g2", 8, 6)).all()
