"""Stage-by-stage device timing of the match kernel, on the real chip.

Times ablated variants of :func:`sushi_tpu.ops.sqdiff.match_from_streams`
(gather only, +FFT correlation, +sliding energy, +scores, +candidate
selection, full kernel) so kernel-optimization work targets the stage
that actually costs time.  Each variant reduces to a tiny output, and
timing amortizes N queue-serialized dispatches over ONE final fetch —
the only honest way to time device work through a relay-fronted backend
(a per-iteration fetch would measure wire latency, not the kernel).

Usage: python tools/kernel_ablation.py [fft_size] [batch] [iterations]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from sushi_tpu.ops import sqdiff
from sushi_tpu.utils import compile_cache

PAT_LEN = 30000


def _gather(stream, starts, slice_len, lens):
    def one(start):
        piece = jax.lax.dynamic_slice(stream, (start,), (slice_len,))
        return piece.astype(jnp.float32) * jnp.float32(1.0 / 255.0)

    return sqdiff._masked_rows(jax.vmap(one)(starts), lens)


def make_variants(fft_size, pat_cap):
    """Each returns a jitted fn(stream, starts, pat_lens, win_lens) -> tiny."""

    def stage_gather(stream, starts, pat_lens, win_lens):
        pats = _gather(stream, starts, fft_size, pat_lens)
        wins = _gather(stream, starts, fft_size, win_lens)
        return jnp.sum(pats) + jnp.sum(wins)

    def stage_fft(stream, starts, pat_lens, win_lens):
        pats = _gather(stream, starts, fft_size, pat_lens)
        wins = _gather(stream, starts, fft_size, win_lens)
        corr = jnp.fft.irfft(
            jnp.fft.rfft(wins, n=fft_size) * jnp.conj(jnp.fft.rfft(pats, n=fft_size)),
            n=fft_size,
        )
        return jnp.sum(corr)

    def stage_energy(stream, starts, pat_lens, win_lens):
        wins = _gather(stream, starts, fft_size, win_lens)
        return jnp.sum(sqdiff.sliding_energy(wins, pat_lens))

    def stage_coarse(stream, starts, pat_lens, win_lens):
        pats = _gather(stream, starts, fft_size, pat_lens)
        wins = _gather(stream, starts, fft_size, win_lens)
        return jnp.sum(sqdiff.coarse_scores(pats, pat_lens, wins, win_lens, fft_size))

    def stage_candidates(stream, starts, pat_lens, win_lens):
        pats = _gather(stream, starts, fft_size, pat_lens)
        wins = _gather(stream, starts, fft_size, win_lens)
        coarse = sqdiff.coarse_scores(pats, pat_lens, wins, win_lens, fft_size)
        return jnp.sum(sqdiff._blockwise_candidates(coarse, 16))

    def stage_fused_candidates(stream, starts, pat_lens, win_lens):
        pats = _gather(stream, starts, fft_size, pat_lens)
        wins = _gather(stream, starts, fft_size, win_lens)
        return jnp.sum(
            sqdiff._coarse_candidates_auto(
                pats, pat_lens, wins, win_lens, fft_size, 16, pat_cap
            )
        )

    def stage_full(stream, starts, pat_lens, win_lens):
        bounds = jnp.stack([starts, pat_lens, starts, win_lens])
        return jnp.sum(
            sqdiff.match_from_streams_bounds(
                stream, stream, bounds,
                fft_size=fft_size, slice_len=fft_size, pat_cap=pat_cap,
            )
        )

    return [
        ("gather", stage_gather),
        ("gather+fft", stage_fft),
        ("gather+energy", stage_energy),
        ("gather+coarse(fft+energy+score)", stage_coarse),
        ("gather+coarse+candidates", stage_candidates),
        ("gather+fused-candidates", stage_fused_candidates),
        ("full(+rescore+select)", stage_full),
    ]


def time_variant(fn, args, iterations, repeats=3):
    """Min over repeats: relay contention and queue jitter only ever ADD
    time, so the min is the honest device-capability number."""
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = None
        for _ in range(iterations):
            out = fn(*args)
        np.asarray(out)
        elapsed = time.time() - t0
        t0 = time.time()
        np.asarray(fn(*args))
        single = time.time() - t0
        best = min(best, max((elapsed - single) / (iterations - 1), 1e-9))
    return best


def main():
    fft_size = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iterations = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    pat_cap = 32768
    compile_cache.enable()

    rng = np.random.RandomState(0)
    stream = jnp.asarray(rng.randint(0, 256, 1 << 25).astype(np.uint8))
    starts = jnp.asarray(rng.randint(0, 1 << 24, batch).astype(np.int32))
    pat_lens = jnp.asarray(np.full(batch, PAT_LEN, np.int32))
    win_lens = jnp.asarray(np.full(batch, fft_size - 4096, np.int32))
    args = (stream, starts, pat_lens, win_lens)

    print("backend=%s fft=%d batch=%d iters=%d" % (
        jax.default_backend(), fft_size, batch, iterations))
    results = []
    for name, fn in make_variants(fft_size, pat_cap):
        execute = time_variant(jax.jit(fn), args, iterations)
        results.append((name, execute))
        print("%-34s %8.2f ms" % (name, execute * 1e3))
    t = dict(results)
    print("deltas (stage cost = line minus its prefix line):")
    print("  fft-only        %8.2f ms" % ((t["gather+fft"] - t["gather"]) * 1e3))
    print("  energy-only     %8.2f ms" % ((t["gather+energy"] - t["gather"]) * 1e3))
    print("  fused-post-fft  %8.2f ms" % ((t["gather+fused-candidates"] - t["gather+fft"]) * 1e3))
    print("  rescore+select  %8.2f ms" % ((t["full(+rescore+select)"] - t["gather+fused-candidates"]) * 1e3))


if __name__ == "__main__":
    main()
