"""Synthetic media fixtures: WAV writers and episode generators.

The reference keeps its regression media outside the repo (J: drive in
tests.example.json); we instead synthesize deterministic fixtures — noise
"dialogue" bursts on a quiet bed, plus a destination track that is the same
audio time-shifted — so end-to-end runs have known-correct shifts.
"""

from __future__ import annotations

import struct
from typing import List, Optional, Sequence, Tuple

import numpy as np


def write_wav_int16(path: str, samples: np.ndarray, framerate: int = 48000) -> None:
    """Write int16 PCM; ``samples`` is (frames,) mono or (frames, channels)."""
    samples = np.asarray(samples, dtype=np.int16)
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    payload = samples.astype("<i2").tobytes()
    _write_riff(path, payload, framerate, channels, sample_width=2, format_tag=1)


def write_wav_int24(path: str, samples_int24: np.ndarray, framerate: int = 48000) -> None:
    """Write 24-bit PCM from int32 values already in 24-bit range (mono or 2-D)."""
    samples = np.asarray(samples_int24, dtype=np.int32)
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    flat = samples.reshape(-1)
    as_bytes = np.empty((len(flat), 3), np.uint8)
    as_bytes[:, 0] = flat & 0xFF
    as_bytes[:, 1] = (flat >> 8) & 0xFF
    as_bytes[:, 2] = (flat >> 16) & 0xFF
    _write_riff(path, as_bytes.tobytes(), framerate, channels, sample_width=3, format_tag=1)


def _write_riff(
    path: str, payload: bytes, framerate: int, channels: int, sample_width: int, format_tag: int
) -> None:
    block_align = channels * sample_width
    byte_rate = framerate * block_align
    fmt = struct.pack(
        "<HHLLHH", format_tag, channels, framerate, byte_rate, block_align, sample_width * 8
    )
    data_size = len(payload)
    # RIFF chunks are word-aligned: an odd-sized data chunk (24-bit mono
    # with an odd frame count) carries a pad byte not counted in data_size
    pad = b"\x00" if data_size % 2 else b""
    riff_size = 4 + (8 + len(fmt)) + (8 + data_size + len(pad))
    with open(path, "wb") as handle:
        handle.write(b"RIFF" + struct.pack("<I", riff_size) + b"WAVE")
        handle.write(b"fmt " + struct.pack("<I", len(fmt)) + fmt)
        handle.write(b"data" + struct.pack("<I", data_size) + payload + pad)


def synth_episode(
    duration: float,
    event_times: Sequence[Tuple[float, float]],
    framerate: int = 48000,
    seed: int = 0,
    amplitude: int = 9000,
    bed_amplitude: int = 400,
) -> np.ndarray:
    """Mono int16 "episode": noise bursts at event intervals over a faint bed.

    Each event interval gets loud band-ish noise (dialogue stand-in); the bed
    is faint noise so template matching has a unique optimum.
    """
    rng = np.random.RandomState(seed)
    n = int(round(duration * framerate))
    audio = rng.randint(-bed_amplitude, bed_amplitude, size=n).astype(np.float64)
    for start, end in event_times:
        a = max(0, int(start * framerate))
        b = min(n, int(end * framerate))
        if b <= a:
            continue
        t = np.arange(b - a)
        burst = rng.randn(b - a) * amplitude * 0.3
        burst += amplitude * 0.5 * np.sin(2 * np.pi * t * (120 + (a % 700)) / framerate)
        audio[a:b] += burst
    return np.clip(audio, -32767, 32767).astype(np.int16)


def shift_audio(samples: np.ndarray, shift_seconds: float, framerate: int = 48000) -> np.ndarray:
    """Shift an episode later by ``shift_seconds`` (prepend bed-level silence)."""
    pad = int(round(shift_seconds * framerate))
    if pad >= 0:
        return np.concatenate([np.zeros(pad, samples.dtype), samples])
    return samples[-pad:]


def write_srt(path: str, events: Sequence[Tuple[float, float, str]]) -> None:
    from sushi_tpu.text.timefmt import format_srt_time

    blocks = [
        "{0}\n{1} --> {2}\n{3}".format(i + 1, format_srt_time(s), format_srt_time(e), text)
        for i, (s, e, text) in enumerate(events)
    ]
    with open(path, "w", encoding="utf-8") as handle:
        handle.write("\n\n".join(blocks))


def write_ass(path: str, events: Sequence[Tuple[float, float, str]], comments: Optional[List[int]] = None) -> None:
    from sushi_tpu.text.timefmt import format_ass_time

    comments = set(comments or [])
    lines = [
        "[Script Info]",
        "Title: fixture",
        "ScriptType: v4.00+",
        "",
        "[Events]",
        "Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text",
    ]
    for i, (s, e, text) in enumerate(events):
        kind = "Comment" if i in comments else "Dialogue"
        lines.append(
            "{0}: 0,{1},{2},Default,,0,0,0,,{3}".format(kind, format_ass_time(s), format_ass_time(e), text)
        )
    with open(path, "w", encoding="utf-8") as handle:
        handle.write("\n".join(lines))
