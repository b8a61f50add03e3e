"""Probe: gather-stage formulations for the match kernel's input pipeline.

The flagship kernel spends ~1 ms gathering two [B, fft] f32 rows from the
uint8 device streams (vmapped dynamic_slice + convert + mask) against an
HBM floor of ~0.1 ms.  Measures variants: pattern rows sliced at pat_cap
instead of fft_size (the pattern never exceeds pat_cap — the FFT pads the
rest), uint8-to-the-end (convert after both gathers), and gather feeding
the packed complex build directly (what the correlation actually
consumes, so XLA can fuse convert+mask+complex into the slice loop).

Usage: python tools/gather_probe.py [fft_size] [batch] [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from sushi_tpu.ops import sqdiff
from sushi_tpu.utils import compile_cache

PAT_CAP = 32768


def time_fn(fn, args, iters=12, repeats=3):
    np.asarray(jax.block_until_ready(fn(*args)))
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        elapsed = time.time() - t0
        t0 = time.time()
        jax.block_until_ready(fn(*args))
        single = time.time() - t0
        best = min(best, max((elapsed - single) / (iters - 1), 1e-9))
    return best


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    compile_cache.enable()

    rng = np.random.RandomState(0)
    stream = jnp.asarray(rng.randint(0, 256, 1 << 25).astype(np.uint8))
    starts = jnp.asarray(rng.randint(0, 1 << 24, batch).astype(np.int32))
    pat_lens = jnp.asarray(np.full(batch, 30000, np.int32))
    win_lens = jnp.asarray(np.full(batch, n - 4096, np.int32))

    def slice_rows(slice_len):
        def one(start):
            return jax.lax.dynamic_slice(stream, (start,), (slice_len,))
        return jax.vmap(one)

    def current(starts, pat_lens, win_lens):
        def gather(start, slice_len):
            rows = slice_rows(slice_len)(start)
            return rows.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        pats = sqdiff._masked_rows(gather(starts, n), pat_lens)
        wins = sqdiff._masked_rows(gather(starts, n), win_lens)
        return jnp.sum(pats) + jnp.sum(wins)

    def patcap(starts, pat_lens, win_lens):
        pats = sqdiff._masked_rows(
            slice_rows(PAT_CAP)(starts).astype(jnp.float32) * (1.0 / 255.0), pat_lens)
        wins = sqdiff._masked_rows(
            slice_rows(n)(starts).astype(jnp.float32) * (1.0 / 255.0), win_lens)
        return jnp.sum(pats) + jnp.sum(wins)

    def complex_build(starts, pat_lens, win_lens):
        """Emit exactly what the packed FFT consumes: wins + 1j*pats."""
        pats = sqdiff._masked_rows(
            slice_rows(PAT_CAP)(starts).astype(jnp.float32) * (1.0 / 255.0), pat_lens)
        wins = sqdiff._masked_rows(
            slice_rows(n)(starts).astype(jnp.float32) * (1.0 / 255.0), win_lens)
        z = wins + 1j * jnp.pad(pats, ((0, 0), (0, n - PAT_CAP)))
        return jnp.sum(z.real) + jnp.sum(z.imag)

    def uint8_rows(starts, pat_lens, win_lens):
        """Raw uint8 slices only — the pure DMA cost."""
        pats = slice_rows(PAT_CAP)(starts)
        wins = slice_rows(n)(starts)
        return jnp.sum(pats, dtype=jnp.int32) + jnp.sum(wins, dtype=jnp.int32)

    for name, fn in (("current (2x fft-len f32)", current),
                     ("pat@pat_cap", patcap),
                     ("pat@pat_cap -> complex", complex_build),
                     ("uint8 slices only", uint8_rows)):
        t = time_fn(jax.jit(fn), (starts, pat_lens, win_lens), iters)
        print("%-28s %8.2f ms" % (name, t * 1e3))


if __name__ == "__main__":
    main()
