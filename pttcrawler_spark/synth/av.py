"""Deterministic video/audio payloads — the av analog of synth/images.

The container ships no av libraries (no ffmpeg/pyav/soundfile), so — as the
build contract allows — the *codec* is a deterministic fake, built exactly
like the image codec in ``synth.images``:

- video "SVID": header(magic, w, h, fps, n_frames) + zlib of the concatenated
  RGB frames. Frame f of a video is ``images.make_pixels(f"{vid}/f{f}")``
  shifted by a per-frame brightness ramp, so consecutive frames differ
  deterministically (frame sampling is observable in the output).
- audio "SWAV": header(magic, sample_rate, n_samples) + zlib of int16 PCM.
  The waveform is a seeded sum of two sinusoids + noise, so RMS/duration are
  stable, nontrivial features.

Everything AROUND the codec — binary columns, schema, Arrow batch shape,
vectorized decode in mapInPandas (functions/image_ops.py) — is real; swapping
in a real codec changes only this module. Reference scope note: the reference
crawler handles no av media at all; these operators exist for the
training-data-pipeline surface (SURVEY.md §6 / build brief), not for parity.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

from . import images as img

MAGIC_VIDEO = b"SVID"
MAGIC_AUDIO = b"SWAV"
_VHEADER = struct.Struct(">4sHHBH")   # magic, w, h, fps, n_frames
_AHEADER = struct.Struct(">4sII")     # magic, sample_rate, n_samples


def make_frames(video_id: str, w: int = 32, h: int = 32,
                n_frames: int = 12) -> np.ndarray:
    """Deterministic (n, h, w, 3) uint8 frames: per-frame base pixels plus a
    monotone brightness ramp so frames are distinct and ordered."""
    frames = np.empty((n_frames, h, w, 3), dtype=np.uint8)
    for f in range(n_frames):
        base = img.make_pixels(f"{video_id}/f{f}", w, h).astype(np.uint16)
        frames[f] = np.clip(base + 4 * f, 0, 255).astype(np.uint8)
    return frames


def encode_video(frames: np.ndarray, fps: int = 10) -> bytes:
    n, h, w, _c = frames.shape
    return (_VHEADER.pack(MAGIC_VIDEO, w, h, fps, n)
            + zlib.compress(frames.tobytes(), 1))


def decode_video(data: bytes) -> tuple[np.ndarray, int]:
    """bytes → (frames (n,h,w,3) uint8, fps)."""
    magic, w, h, fps, n = _VHEADER.unpack_from(data)
    if magic != MAGIC_VIDEO:
        raise ValueError("bad video magic")
    raw = zlib.decompress(data[_VHEADER.size:])
    return np.frombuffer(raw, dtype=np.uint8).reshape(n, h, w, 3), fps


def make_waveform(audio_id: str, sample_rate: int = 8000,
                  seconds: float = 1.5) -> np.ndarray:
    """Deterministic int16 PCM: two seeded sinusoids + low noise."""
    rng = np.random.default_rng(img.seed_for(audio_id))
    n = int(sample_rate * seconds)
    t = np.arange(n) / sample_rate
    f1 = 100.0 + float(rng.integers(0, 400))
    f2 = 600.0 + float(rng.integers(0, 2000))
    wave = (0.5 * np.sin(2 * np.pi * f1 * t)
            + 0.3 * np.sin(2 * np.pi * f2 * t)
            + 0.02 * rng.standard_normal(n))
    return np.clip(wave * 32767 / 1.0, -32768, 32767).astype(np.int16)


def encode_audio(pcm: np.ndarray, sample_rate: int = 8000) -> bytes:
    return (_AHEADER.pack(MAGIC_AUDIO, sample_rate, len(pcm))
            + zlib.compress(pcm.tobytes(), 1))


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """bytes → (int16 PCM, sample_rate)."""
    magic, rate, n = _AHEADER.unpack_from(data)
    if magic != MAGIC_AUDIO:
        raise ValueError("bad audio magic")
    raw = zlib.decompress(data[_AHEADER.size:])
    return np.frombuffer(raw, dtype=np.int16)[:n], rate


def build_video_payload(video_id: str, w: int = 32, h: int = 32,
                        n_frames: int = 12, fps: int = 10) -> dict:
    frames = make_frames(video_id, w, h, n_frames)
    return {"video_id": video_id, "bytes": encode_video(frames, fps),
            "w": w, "h": h, "fps": fps, "n_frames": n_frames}


def build_audio_payload(audio_id: str, sample_rate: int = 8000,
                        seconds: float = 1.5) -> dict:
    pcm = make_waveform(audio_id, sample_rate, seconds)
    return {"audio_id": audio_id, "bytes": encode_audio(pcm, sample_rate),
            "sample_rate": sample_rate,
            "duration_s": round(len(pcm) / sample_rate, 6)}
