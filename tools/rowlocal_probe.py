"""Probe: row-LOCAL correlation inverses vs the paired-row formulations.

Round-5 soak finding (SOAK_r05.json first record, 98/100): the packed and
MXU correlation paths pair TWO DIFFERENT ROWS into one inverse c2c (row i
rides the real plane, row B/2+i the imag plane), so a row's rounding
depends on its batch PARTNER — and the partner differs between the
speculative-replay batch and a sequential drive of the same kernel.  On
garbage plateaus (soak's 'corrupt' episodes) the ~1e-6 partner-dependent
noise moves which lags reach the exact rescore, and committed decisions
diverge (batched != sequential, the soak's hard contract 1).  The classic
path that soaked 100/100 in r04 is row-local; batch-invariance is the
property to restore, not an accident to paper over.

Row-local candidates (per-row cost in full-length-c2c equivalents):

* classic      — 2 r2c + 1 c2r                           (~3.0 on TPU: XLA
                 lowers r2c/c2r near full c2c)
* paired       — packed fwd + cross-row paired inverse    (1.5, NOT local)
* irfft        — packed fwd + c2r of the half spectrum    (2.0-ish, local)
* ifft.real    — packed fwd + full c2c inverse            (2.0, local)
* half-c2r     — packed fwd + even/odd half-size inverse  (1.5 + O(n)
                 elementwise, local): for conj-symmetric P with IDFT x,
                 E=(P[:n/2]+P[n/2:])/2, O=(P[:n/2]-P[n/2:])/2*W_n^{+k},
                 z=IDFT_{n/2}(E+iO) gives x[2m]=Re z, x[2m+1]=Im z.
* mxu paired   — four-step hybrid, paired inverse         (NOT local)
* mxu local    — four-step hybrid, full-batch inverse, real part (local)

Each local variant is also CHECKED for row-locality: row 0's output must
be bit-identical when the rest of the batch is replaced.

Usage: python tools/rowlocal_probe.py [iters]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from sushi_tpu.ops import mxu_dft
from sushi_tpu.utils import compile_cache

SHAPES = [
    (98304, 64),
    (131072, 128),
    (393216, 128),
    (524288, 128),
]


def _packed_spectra(patterns, windows, n):
    z = jnp.fft.fft(windows + 1j * patterns, n=n)
    z_rev = jnp.roll(z[:, ::-1], 1, axis=1)
    win_f = 0.5 * (z + jnp.conj(z_rev))
    pat_f = -0.5j * (z - jnp.conj(z_rev))
    return win_f * jnp.conj(pat_f)  # conjugate-symmetric per row


def corr_classic(patterns, windows, n):
    pat_f = jnp.fft.rfft(patterns, n=n)
    win_f = jnp.fft.rfft(windows, n=n)
    return jnp.fft.irfft(win_f * jnp.conj(pat_f), n=n)


def corr_paired(patterns, windows, n):
    prod = _packed_spectra(patterns, windows, n)
    half = patterns.shape[0] // 2
    pair = jnp.fft.ifft(prod[:half] + 1j * prod[half:], n=n)
    return jnp.concatenate([pair.real, pair.imag], axis=0)


def corr_irfft(patterns, windows, n):
    prod = _packed_spectra(patterns, windows, n)
    return jnp.fft.irfft(prod[:, : n // 2 + 1], n=n)


def corr_ifft_real(patterns, windows, n):
    prod = _packed_spectra(patterns, windows, n)
    return jnp.fft.ifft(prod, n=n).real


def corr_half_c2r(patterns, windows, n):
    prod = _packed_spectra(patterns, windows, n)
    half = n // 2
    x1, x2 = prod[:, :half], prod[:, half:]
    even = 0.5 * (x1 + x2)
    k = jnp.arange(half)
    tw = jnp.exp(2j * np.pi * k / n).astype(jnp.complex64)
    odd = 0.5 * (x1 - x2) * tw[None]
    z = jnp.fft.ifft(even + 1j * odd, n=half)
    return jnp.stack([z.real, z.imag], axis=-1).reshape(patterns.shape[0], n)


def corr_mxu(patterns, windows, n, local):
    plan = mxu_dft.plan_for(n, patterns.shape[0]) or mxu_dft.Plan(
        128, n // 128, jax.lax.Precision.HIGH
    )
    if not local:
        return mxu_dft.correlate_packed(patterns, windows, n, plan)
    zr, zi = mxu_dft._forward(windows, patterns, plan)
    rr, ri = mxu_dft._rev_index(zr, zi, plan.n1, plan.n2)
    wr = 0.5 * (zr + rr)
    wi = 0.5 * (zi - ri)
    pr = 0.5 * (zi + ri)
    pi = -0.5 * (zr - rr)
    prod_r = wr * pr + wi * pi
    prod_i = wi * pr - wr * pi
    out_r, _ = mxu_dft._inverse(prod_r, prod_i, plan)
    return out_r


def time_fn(fn, args, iters=8, repeats=3):
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
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    compile_cache.enable()
    rng = np.random.RandomState(0)

    for n, batch in SHAPES:
        pats = jnp.asarray(rng.rand(batch, n).astype(np.float32))
        wins = jnp.asarray(rng.rand(batch, n).astype(np.float32))
        ref = None
        variants = [
            ("classic   ", corr_classic, False),
            ("paired    ", corr_paired, False),
            ("irfft     ", corr_irfft, True),
            ("ifft.real ", corr_ifft_real, True),
            ("half-c2r  ", corr_half_c2r, True),
        ]
        if n % 3 == 0:
            variants += [
                ("mxu-paired", functools.partial(corr_mxu, local=False), False),
                ("mxu-local ", functools.partial(corr_mxu, local=True), True),
            ]
        for name, fn, check_local in variants:
            jitted = jax.jit(functools.partial(fn, n=n))
            try:
                got = np.asarray(jitted(pats, wins))
                if ref is None:
                    ref = got
                    scale = float(np.max(np.abs(ref)))
                err = float(np.max(np.abs(got - ref))) / scale
                t = time_fn(jitted, (pats, wins), iters)
                note = ""
                if check_local:
                    # row 0 must be bit-identical under a different batch tail
                    alt = jnp.concatenate([pats[:1], pats[:1] * 0.5 + 0.1], axis=0)
                    alt_w = jnp.concatenate([wins[:1], wins[:1] * 0.25 + 0.2], axis=0)
                    small = jax.jit(functools.partial(fn, n=n))
                    a = np.asarray(small(alt, alt_w))[0]
                    alt2 = jnp.concatenate([pats[:1], pats[1:2]], axis=0)
                    alt2_w = jnp.concatenate([wins[:1], wins[1:2]], axis=0)
                    b = np.asarray(small(alt2, alt2_w))[0]
                    note = "  row-local" if np.array_equal(a, b) else "  NOT-LOCAL"
                print("%7d x%-4d %s %8.2f ms   relerr %.2e%s"
                      % (n, batch, name, t * 1e3, err, note), flush=True)
            except Exception as e:  # noqa: BLE001 - probe reports and moves on
                print("%7d x%-4d %s FAILED: %s" % (n, batch, name, str(e)[:90]),
                      flush=True)


if __name__ == "__main__":
    main()
