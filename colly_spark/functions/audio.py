"""From-scratch RIFF/WAVE (PCM16) codec + audio feature extraction.

The multimodal corpus treats audio as an opaque binary column (same
contract as images, reference response.go:189-194 — bodies are bytes);
this module supplies the real container layer: a byte-exact PCM16 WAV
writer/parser (RIFF spec, the container every ASR data pipeline's
ingest normalizes through) and numpy feature extraction
(duration/RMS/peak/zero-crossing-rate — the standard cheap admission
signals for speech-corpus curation, cf. the length/quality gates on
the text side).

Pure numpy — no audio libraries in the container, and none needed:
PCM16 WAV is 44 bytes of header around raw samples.
"""

from __future__ import annotations

import struct

import numpy as np


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """PCM16 WAV. ``samples``: int16 array of shape (frames,) or
    (frames, channels); interleaved little-endian on the wire."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, ch = samples.shape
    data = samples.astype("<i2").tobytes()
    block = ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block, 16)
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(data: bytes):
    """Parse PCM16 WAV → (rate, samples[frames, channels] int16).
    Walks RIFF chunks (skips LIST/fact/etc.), validates the PCM16
    fmt. Raises ValueError on anything that isn't a PCM16 WAV."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE stream")
    pos, end = 12, min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    rate = ch = None
    pcm = None
    while pos + 8 <= end:
        tag = data[pos:pos + 4]
        size = struct.unpack("<I", data[pos + 4:pos + 8])[0]
        payload = data[pos + 8:pos + 8 + size]
        if tag == b"fmt ":
            if len(payload) < 16:
                raise ValueError("short fmt chunk")
            afmt, ch, rate, _br, _ba, bits = struct.unpack(
                "<HHIIHH", payload[:16])
            if afmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={afmt}, bits={bits})")
        elif tag == b"data":
            pcm = payload
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if rate is None or pcm is None:
        raise ValueError("missing fmt/data chunk")
    if len(pcm) % (ch * 2):
        raise ValueError("data chunk not frame-aligned")
    arr = np.frombuffer(pcm, dtype="<i2").reshape(-1, ch)
    return rate, arr


def audio_stats(samples: np.ndarray, rate: int) -> dict:
    """Curation features over int16 frames×channels: duration, RMS /
    peak (normalized to [-1, 1]), zero-crossing rate of channel 0
    (sign changes per frame boundary — the cheap voiced/unvoiced /
    noise discriminator). 6-dp rounds for engine-neutral hashing."""
    frames, ch = samples.shape
    x = samples.astype(np.float64) / 32768.0
    rms = float(np.sqrt(np.mean(x * x))) if frames else 0.0
    peak = float(np.max(np.abs(x))) if frames else 0.0
    if frames > 1:
        s = np.sign(samples[:, 0].astype(np.int64))
        s[s == 0] = 1
        zcr = float(np.count_nonzero(s[1:] != s[:-1])) / (frames - 1)
    else:
        zcr = 0.0
    return dict(
        rate=int(rate), channels=int(ch), n_frames=int(frames),
        duration_ms=int(frames * 1000 // rate),
        rms=round(rms, 6), peak=round(peak, 6), zcr=round(zcr, 6))


def synth_samples(i: int, seed: int = 42):
    """Deterministic per-id test signal: a sine at id-dependent
    frequency/amplitude plus seeded noise, every 7th id near-silence;
    mono/stereo alternating. Returns (rate, int16 samples)."""
    rate = (8000, 11025, 16000)[i % 3]
    ch = 1 + (i % 2)
    frames = 400 + (i % 5) * 160
    rng = np.random.default_rng(seed * 9_999_991 + i)
    t = np.arange(frames, dtype=np.float64) / rate
    if i % 7 == 0:
        base = rng.integers(-8, 9, size=frames).astype(np.float64)
    else:
        amp = 6000.0 + (i % 4) * 4000.0
        freq = 50.0 + 13.0 * (i % 97)
        base = (amp * np.sin(2.0 * np.pi * freq * t)
                + rng.integers(-64, 65, size=frames))
    out = np.empty((frames, ch), dtype=np.int16)
    out[:, 0] = np.clip(np.round(base), -32768, 32767).astype(np.int16)
    if ch == 2:
        out[:, 1] = np.clip(np.round(np.roll(base, 5) * 0.5),
                            -32768, 32767).astype(np.int16)
    return rate, out


def synth_fp_samples(i: int, seed: int = 42, rate: int = 8000,
                     seg_frames: int = 512, n_seg: int = 8):
    """Deterministic per-id FINGERPRINT test signal: ``n_seg``
    segments, each a sum of two seeded tones (frequencies change at
    segment boundaries, so the spectral-peak constellation varies
    over time — constant-tone signals have a degenerate landmark
    set). Longer than synth_samples by design: landmark pairing
    needs enough STFT frames to fan out over. Returns (rate, mono
    int16 samples of n_seg*seg_frames frames)."""
    rng = np.random.default_rng(seed * 31_337 + i)
    out = np.empty(n_seg * seg_frames, dtype=np.float64)
    for s in range(n_seg):
        # bins 4..100 of a 256-point FFT at this rate, kept off bin
        # boundaries' extremes so windowing keeps peaks sharp
        b1, b2 = rng.choice(np.arange(4, 100), size=2, replace=False)
        f1 = b1 * rate / 256.0
        f2 = b2 * rate / 256.0
        t = (np.arange(seg_frames) + s * seg_frames) / rate
        out[s * seg_frames:(s + 1) * seg_frames] = (
            6000.0 * np.sin(2 * np.pi * f1 * t)
            + 4000.0 * np.sin(2 * np.pi * f2 * t))
    out += rng.integers(-32, 33, size=out.shape[0])
    return rate, np.clip(np.round(out), -32768, 32767).astype(np.int16)


def spectral_landmarks(samples: np.ndarray, n_fft: int = 256,
                       hop: int = 128, n_peaks: int = 3,
                       fan_out: int = 3, dt_min: int = 1,
                       dt_max: int = 16, mag_floor: float = 100.0):
    """Shazam-style constellation landmarks (Wang, ISMIR 2003) over a
    mono int16 signal, pure numpy and fully deterministic:

    Hann-windowed |rFFT| frames (``n_fft``/``hop``) → per-frame top
    ``n_peaks`` bins above ``mag_floor`` (ties broken by lower bin;
    bin 0 excluded) → each anchor peak pairs with the next
    ``fan_out`` peaks ``dt_min``..``dt_max`` frames ahead (frame
    order, then bin order). Hash packs (f1, f2, Δt) as
    ``f1<<16 | f2<<6 | Δt`` — integers end to end, so the DuckDB
    oracle replays every downstream decision exactly.

    Returns list of (hash:int, t:int) with t the anchor frame."""
    if samples.ndim == 2:
        samples = samples[:, 0]
    x = samples.astype(np.float64)
    n = x.shape[0]
    if n < n_fft:
        return []
    n_frames = 1 + (n - n_fft) // hop
    idx = (np.arange(n_fft)[None, :]
           + hop * np.arange(n_frames)[:, None])
    win = np.hanning(n_fft)
    mags = np.abs(np.fft.rfft(x[idx] * win[None, :], axis=1))
    peaks = []  # (t, bin) in deterministic order
    for t in range(n_frames):
        m = mags[t]
        cand = np.nonzero(m >= mag_floor)[0]
        cand = cand[cand > 0]
        if cand.size == 0:
            continue
        # stable top-n: magnitude desc, bin asc on ties
        order = np.lexsort((cand, -m[cand]))[:n_peaks]
        for b in sorted(int(cand[j]) for j in order):
            peaks.append((t, b))
    out = []
    for a, (t1, f1) in enumerate(peaks):
        fanned = 0
        for t2, f2 in peaks[a + 1:]:
            dt = t2 - t1
            if dt < dt_min:
                continue
            if dt > dt_max:
                break
            out.append(((f1 << 16) | (f2 << 6) | dt, t1))
            fanned += 1
            if fanned >= fan_out:
                break
    return out
