"""Sharded template search over a TPU mesh.

The reference has no multi-device execution at all (single-process Python,
SURVEY §2.3); scale-out is therefore designed TPU-first rather than ported:

* **row sharding** — a padded request batch is just rows; sharding the row
  axis over the mesh makes XLA run every row's FFT/rescore locally with no
  communication until the tiny (B,)-shaped result gather.  The same
  mechanism serves both parallel modes:

  - *event/episode data parallelism* ("dp"): independent search requests
    (or whole episodes' requests) spread across devices;
  - *lag sharding* ("sp", the sequence-parallel analog): ONE wide search
    window (e.g. ±30 s PAL/NTSC recovery) is cut into overlapping lag
    chunks, each chunk becoming a row on a different device; the global
    argmin reduces over per-chunk minima with cv2's first-lag tie-break.

* collectives ride the mesh implicitly via GSPMD (jit + NamedSharding) —
  no hand-written NCCL/MPI analog exists or is needed.
"""

from __future__ import annotations

import functools
from typing import List, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sushi_tpu.ops import sqdiff


def make_mesh(axis_sizes: Sequence[int], axis_names: Sequence[str]) -> Mesh:
    """Build a mesh over the available devices."""
    devices = np.array(jax.devices()[: int(np.prod(axis_sizes))]).reshape(tuple(axis_sizes))
    return Mesh(devices, tuple(axis_names))


def chunk_wide_window(
    window_length: int, pattern_length: int, num_chunks: int
) -> List[Tuple[int, int]]:
    """Cut one window's lag range into ``num_chunks`` (offset, length) spans.

    Chunk ``i`` owns lags ``[offset, offset + lag_count)`` and needs window
    samples ``[offset, offset + length)`` where ``length`` includes the
    pattern-length overlap, so chunks can be matched independently.
    """
    total_lags = window_length - pattern_length + 1
    base = -(-total_lags // num_chunks)  # ceil
    spans = []
    for i in range(num_chunks):
        lag_offset = min(i * base, total_lags)
        lag_count = min(base, total_lags - lag_offset)
        if lag_count <= 0:
            spans.append((window_length, 0))  # empty tail chunk
        else:
            spans.append((lag_offset, lag_count + pattern_length - 1))
    return spans


@jax.jit
def _combine_chunks(scores, lags, offsets):
    global_lags = lags + offsets
    best = jnp.min(scores)
    tie = jnp.where(scores == best, global_lags, jnp.iinfo(jnp.int32).max)
    return best, jnp.min(tie)


def sharded_match_rows(
    patterns: np.ndarray,
    pat_lens: np.ndarray,
    windows: np.ndarray,
    win_lens: np.ndarray,
    fft_size: int,
    mesh: Mesh,
    row_axes: Tuple[str, ...],
    rescore_k: int = 16,
):
    """Batched match with the row axis sharded over the given mesh axes.

    Rows must be a multiple of the sharded axis sizes (pad with dummy rows).
    Returns per-row (scores, lags) exactly like ``match_padded_batch``.
    """
    row_spec = P(row_axes, None)
    scalar_spec = P(row_axes)
    matched = jax.jit(
        functools.partial(sqdiff.match_padded_batch, fft_size=fft_size, rescore_k=rescore_k),
        in_shardings=(
            NamedSharding(mesh, row_spec),
            NamedSharding(mesh, scalar_spec),
            NamedSharding(mesh, row_spec),
            NamedSharding(mesh, scalar_spec),
        ),
        out_shardings=(NamedSharding(mesh, scalar_spec), NamedSharding(mesh, scalar_spec)),
    )
    return matched(jnp.asarray(patterns), jnp.asarray(pat_lens), jnp.asarray(windows), jnp.asarray(win_lens))


def wide_window_search(
    pattern: np.ndarray,
    window: np.ndarray,
    mesh: Mesh,
    axis: str = "sp",
    fft_size: int | None = None,
    rescore_k: int = 16,
) -> Tuple[float, int]:
    """Search one wide window with its lag range sharded over ``axis``.

    Equivalent to ``oracle_match(pattern, window)`` but each device scans
    only its lag chunk; the argmin reduces across chunks with first-lag
    tie-breaking.
    """
    if len(window) < len(pattern):
        # all-dummy chunks would otherwise "win" with a garbage lag;
        # oracle_match raises the same way
        raise ValueError("window shorter than pattern")
    num_chunks = mesh.shape[axis]
    spans = chunk_wide_window(len(window), len(pattern), num_chunks)
    chunk_len = max(length for _, length in spans)
    needed = 1 << max(12, int(chunk_len - 1).bit_length())
    fft_size = needed if fft_size is None else max(fft_size, needed)

    rows = np.zeros((num_chunks, fft_size), np.float32)
    row_pat = np.zeros((num_chunks, fft_size), np.float32)
    win_lens = np.zeros(num_chunks, np.int32)
    pat_lens = np.full(num_chunks, len(pattern), np.int32)
    offsets = np.zeros(num_chunks, np.int32)
    for i, (offset, length) in enumerate(spans):
        rows[i, :length] = window[offset : offset + length]
        row_pat[i, : len(pattern)] = pattern
        # empty chunks keep win_len == pat_len-1 -> zero valid lags is not
        # representable; give them the pattern itself so they score 1.0-ish
        # and mask via +inf offset instead
        win_lens[i] = max(length, len(pattern))
        offsets[i] = offset if length > 0 else np.iinfo(np.int32).max // 2

    scores, lags = sharded_match_rows(
        row_pat, pat_lens, rows, win_lens, fft_size, mesh, (axis,), rescore_k
    )
    best, lag = _combine_chunks(scores, lags, jnp.asarray(offsets))
    return float(best), int(lag)
