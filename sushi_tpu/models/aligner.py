"""Jittable alignment steps — the framework's "flagship model".

The forward step of this framework is the batched normalized-SSD search
(:func:`sushi_tpu.ops.sqdiff.match_padded_batch`); this module wraps it in
fixed shapes for compile checks and multi-chip dry runs.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from sushi_tpu.ops import sqdiff


def forward_step(fft_size: int = 16384, rescore_k: int = 16):
    """A jittable forward step plus example arguments.

    Returns ``(fn, example_args)`` where ``fn(patterns, pat_lens, windows,
    win_lens) -> (scores, lags)``.
    """
    fn = functools.partial(sqdiff.match_padded_batch, fft_size=fft_size, rescore_k=rescore_k)

    rng = np.random.RandomState(0)
    batch = 8
    pat_len = min(1500, fft_size // 8)
    windows = rng.rand(batch, fft_size).astype(np.float32)
    patterns = np.zeros((batch, fft_size), np.float32)
    pat_lens = np.full(batch, pat_len, np.int32)
    win_lens = np.full(batch, fft_size - 1024, np.int32)
    for i in range(batch):
        start = rng.randint(0, fft_size // 4)
        patterns[i, :pat_len] = windows[i, start : start + pat_len]
        windows[i, win_lens[i] :] = 0.0

    example_args = (
        jnp.asarray(patterns),
        jnp.asarray(pat_lens),
        jnp.asarray(windows),
        jnp.asarray(win_lens),
    )
    return fn, example_args


def sharded_alignment_step(mesh, fft_size: int = 4096, rescore_k: int = 8):
    """One full sharded alignment step over a ('dp', 'sp') mesh.

    The heavy step of this framework is a full batched search round (an
    inference-style search, not training): every event's request is a row
    block, data-parallel over 'dp'; each request's wide window is
    lag-chunked over 'sp'.  Executing it jitted over the mesh exercises
    the real shardings end to end (gather, FFT, rescore, argmin-combine
    collectives).
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    dp = mesh.shape["dp"]
    sp = mesh.shape["sp"]
    rows = dp * sp  # one lag chunk per 'sp' member for each 'dp' request

    rng = np.random.RandomState(1)
    pat_len = 512
    chunk_lags = fft_size - pat_len - 256
    patterns = np.zeros((rows, fft_size), np.float32)
    windows = np.zeros((rows, fft_size), np.float32)
    pat_lens = np.full(rows, pat_len, np.int32)
    win_lens = np.full(rows, chunk_lags + pat_len - 1, np.int32)
    offsets = np.zeros(rows, np.int32)

    for request in range(dp):
        pattern = rng.rand(pat_len).astype(np.float32)
        wide = rng.rand(sp * chunk_lags + pat_len - 1).astype(np.float32)
        hide = rng.randint(0, len(wide) - pat_len)
        wide[hide : hide + pat_len] = pattern
        for chunk in range(sp):
            row = request * sp + chunk
            offset = chunk * chunk_lags
            span = wide[offset : offset + chunk_lags + pat_len - 1]
            windows[row, : len(span)] = span
            win_lens[row] = len(span)
            patterns[row, :pat_len] = pattern
            offsets[row] = offset

    row_sharding = NamedSharding(mesh, P(("dp", "sp"), None))
    scalar_sharding = NamedSharding(mesh, P(("dp", "sp")))

    @functools.partial(
        jax.jit,
        in_shardings=(row_sharding, scalar_sharding, row_sharding, scalar_sharding, scalar_sharding),
        out_shardings=(NamedSharding(mesh, P()), NamedSharding(mesh, P())),
    )
    def step(pats, plens, wins, wlens, lag_offsets):
        scores, lags = sqdiff.match_padded_batch(pats, plens, wins, wlens, fft_size, rescore_k)
        # reduce each request's chunks to a global (score, lag): reshape to
        # [dp, sp], min over the chunk axis with first-lag tie-break
        scores2 = scores.reshape(dp, sp)
        lags2 = (lags + lag_offsets).reshape(dp, sp)
        best = jnp.min(scores2, axis=1, keepdims=True)
        tie = jnp.where(scores2 == best, lags2, jnp.iinfo(jnp.int32).max)
        return best[:, 0], jnp.min(tie, axis=1)

    args = (
        jnp.asarray(patterns),
        jnp.asarray(pat_lens),
        jnp.asarray(windows),
        jnp.asarray(win_lens),
        jnp.asarray(offsets),
    )
    return step, args
