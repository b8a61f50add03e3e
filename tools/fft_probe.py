"""Microbench of FFT formulations for the coarse correlation on chip.

The coarse pass owes three length-n transforms per chunk: rfft(patterns),
rfft(windows), irfft(product).  This probe isolates rfft vs irfft vs the
pointwise product at the production bucket shapes, so the batcher's
bucket policy is driven by measured numbers, not folklore.

Timing discipline (relay-fronted device): each dispatch chains REPEAT
dependent transforms (beats timer noise), N queue-serialized dispatches,
ONE tiny fetch; min over repeats (contention only adds).  Measured
findings this probe produced (v5e, 2026-08-17):
  - batched [2B, n] rfft of patterns||windows is SLOWER than two
    separate rffts (concat HBM traffic) — rejected.
  - irfft costs ~2x rfft at the same size (hermitian reconstruct).
  - 3-smooth 98304 is ~1.7x the per-point cost of pow2 65536, but the
    per-point cost GROWS with n even at pow2 (131072: rfft 0.149,
    irfft 0.197 ns/pt vs 65536's 0.122/0.099): three transforms cost
    3.32 ms at 98304 vs 4.15 ms padded to 131072 — the 3-smooth bucket
    policy stands (B=64, v5e, 2026-08-17).
  - half-rate coarse (fold the product spectrum, irfft at n/2 = exact
    even-lag scores) is structurally unsound here, not just slow: the
    analysis streams are NN-downsampled (no lowpass), correlation
    minima are delta-like, so an odd-lag true minimum leaves NO trace
    at even lags for the nomination to find.  Same failure family as
    the measured-rejected mean-pooled coarse (SUSHI_COARSE_POOL).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

REPEAT = 8  # dependent transforms per dispatch


def time_fn(fn, args, iterations=10, repeats=3):
    np.asarray(fn(*args))
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
    return best / REPEAT


def main():
    rng = np.random.RandomState(0)
    for batch, n in [(64, 65536), (64, 98304), (64, 131072)]:
        x = jnp.asarray(rng.rand(batch, n).astype(np.float32))
        xf = jnp.fft.rfft(x, n=n)

        def fwd(v):
            s = jnp.float32(0.0)
            for _ in range(REPEAT):
                f = jnp.fft.rfft(v, n=n)
                s = s + jnp.sum(jnp.abs(f[:, :1]))
                v = v + 1e-12 * s  # serialize the chain
            return s

        def inv(f):
            s = jnp.float32(0.0)
            for _ in range(REPEAT):
                y = jnp.fft.irfft(f, n=n)
                s = s + jnp.sum(y[:, :1])
                f = f + 1e-12 * s
            return s

        def prod(f):
            s = jnp.float32(0.0)
            for _ in range(REPEAT):
                y = f * jnp.conj(f)
                s = s + jnp.sum(jnp.real(y[:, :1]))
                f = f + 1e-12 * s
            return s

        t_f = time_fn(jax.jit(fwd), (x,))
        t_i = time_fn(jax.jit(inv), (xf,))
        t_p = time_fn(jax.jit(prod), (xf,))
        print(
            "B=%3d n=%6d  rfft %6.2f ms (%.3f ns/pt)  irfft %6.2f ms (%.3f ns/pt)"
            "  cmul %5.2f ms" % (
                batch, n, t_f * 1e3, t_f / (batch * n) * 1e9,
                t_i * 1e3, t_i / (batch * n) * 1e9, t_p * 1e3,
            )
        )


if __name__ == "__main__":
    main()
