"""Probe: MXU (matmul) four-step DFT vs XLA's FFT for the correlation.

The correlation stage is ~2/3 of the flagship kernel's execute time and
XLA's TPU FFT runs it at a few hundred GFLOP/s — the MXU sits idle.  A
Cooley-Tukey *four-step* DFT (n = n1*n2: DFT-n1 along axis 0 as a matmul,
twiddle, DFT-n2 along axis 1 as a matmul) turns the transform into MXU
work.  Forward output lands in digit-permuted order (k = k1 + n1*k2 at
[k1, k2]); the inverse is built to CONSUME that order and emit natural
order, so the correlation's elementwise spectral product never needs a
transpose — the same trick as decimation-in-frequency conv pipelines.

Measures, per bucket shape: the current packed-FFT correlation, the
four-step correlation at candidate factorizations/precisions, and a
hybrid (matmul stage + batched jnp.fft stage) for wide buckets.  Reports
times and max relative error vs the classic rfft formulation.

Usage: python tools/mxu_fft_probe.py [fft_size] [batch] [iters]
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


# the production four-step pieces — imported, not re-derived, so the
# probe always measures the SAME math production runs (mxu_dft's cached
# factories return np planes; wrap to jnp at use sites like production)
from sushi_tpu.ops.mxu_dft import _rev_index  # noqa: E402


def _dft_mats(m: int, sign: float):
    from sushi_tpu.ops import mxu_dft

    fr, fi = mxu_dft._dft_mats(m, sign)
    return jnp.asarray(fr), jnp.asarray(fi)


def _twiddle(n1: int, n2: int, sign: float):
    from sushi_tpu.ops import mxu_dft

    tr, ti = mxu_dft._twiddle(n1, n2, sign)
    return jnp.asarray(tr), jnp.asarray(ti)


def _cmatmul_axis0(fr, fi, xr, xi, precision):
    """(F @ X) along axis 0 of [B, n1, n2] complex (as separate planes)."""
    mm = functools.partial(jnp.einsum, "ij,bjk->bik", precision=precision)
    return mm(fr, xr) - mm(fi, xi), mm(fr, xi) + mm(fi, xr)


def _cmatmul_axis1(xr, xi, gr, gi, precision):
    mm = functools.partial(jnp.einsum, "bij,jk->bik", precision=precision)
    return mm(xr, gr) - mm(xi, gi), mm(xr, gi) + mm(xi, gr)


def four_step_forward(xr, xi, n1, n2, precision):
    """DFT of length n1*n2 rows; output [B, n1, n2] with k = k1 + n1*k2."""
    b = xr.shape[0]
    xr = xr.reshape(b, n1, n2)
    xi = xi.reshape(b, n1, n2)
    fr, fi = _dft_mats(n1, -1.0)
    ar, ai = _cmatmul_axis0(fr, fi, xr, xi, precision)  # DFT_n1 over i1
    tr, ti = _twiddle(n1, n2, -1.0)  # W_n^{-k1*i2}
    br = ar * tr[None] - ai * ti[None]
    bi = ar * ti[None] + ai * tr[None]
    gr, gi = _dft_mats(n2, -1.0)
    return _cmatmul_axis1(br, bi, gr, gi, precision)  # DFT_n2 over i2


def four_step_inverse(zr, zi, n1, n2, precision):
    """Inverse accepting k = k1 + n1*k2 layout; natural-order rows out."""
    b = zr.shape[0]
    gr, gi = _dft_mats(n2, +1.0)
    br, bi = _cmatmul_axis1(zr, zi, gr, gi, precision)  # IDFT_n2 over k2
    tr, ti = _twiddle(n1, n2, +1.0)  # W_n^{+k1*i2}
    cr = br * tr[None] - bi * ti[None]
    ci = br * ti[None] + bi * tr[None]
    fr, fi = _dft_mats(n1, +1.0)
    dr, di = _cmatmul_axis0(fr, fi, cr, ci, precision)  # IDFT_n1 over k1
    scale = 1.0 / (n1 * n2)
    return (dr * scale).reshape(b, n1 * n2), (di * scale).reshape(b, n1 * n2)


def hybrid_forward(xr, xi, n1, n2, precision):
    """Matmul DFT_n1 + twiddle, then batched jnp.fft over the n2 axis."""
    b = xr.shape[0]
    xr = xr.reshape(b, n1, n2)
    xi = xi.reshape(b, n1, n2)
    fr, fi = _dft_mats(n1, -1.0)
    ar, ai = _cmatmul_axis0(fr, fi, xr, xi, precision)
    tr, ti = _twiddle(n1, n2, -1.0)
    br = ar * tr[None] - ai * ti[None]
    bi = ar * ti[None] + ai * tr[None]
    z = jnp.fft.fft(br + 1j * bi, axis=2)
    return z.real, z.imag


def hybrid_inverse(zr, zi, n1, n2, precision):
    b = zr.shape[0]
    z = jnp.fft.ifft(zr + 1j * zi, axis=2)  # IDFT_n2 over k2 (scaled 1/n2)
    br, bi = z.real, z.imag
    tr, ti = _twiddle(n1, n2, +1.0)
    cr = br * tr[None] - bi * ti[None]
    ci = br * ti[None] + bi * tr[None]
    fr, fi = _dft_mats(n1, +1.0)
    dr, di = _cmatmul_axis0(fr, fi, cr, ci, precision)
    scale = 1.0 / n1
    return (dr * scale).reshape(b, n1 * n2), (di * scale).reshape(b, n1 * n2)


def correlate_mxu(patterns, windows, n1, n2, precision, forward, inverse):
    """Packed-pair correlation entirely in the four-step layout."""
    batch = patterns.shape[0]
    zr, zi = forward(windows, patterns, n1, n2, precision)  # fft(w + i*p)
    rr, ri = _rev_index(zr, zi, n1, n2)
    # W = (Z + conj(Z~))/2 ; P = -i/2 (Z - conj(Z~))
    wr = 0.5 * (zr + rr)
    wi = 0.5 * (zi - ri)
    pr = 0.5 * (zi + ri)
    pi = -0.5 * (zr - rr)
    # prod = W * conj(P), conj-symmetric per row
    prod_r = wr * pr + wi * pi
    prod_i = wi * pr - wr * pi
    half = batch // 2
    out_r, out_i = inverse(
        prod_r[:half] - prod_i[half:], prod_i[:half] + prod_r[half:], n1, n2, precision
    )
    return jnp.concatenate([out_r, out_i], axis=0)


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
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 98304
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    compile_cache.enable()

    rng = np.random.RandomState(0)
    pats = jnp.asarray(rng.rand(batch, n).astype(np.float32))
    wins = jnp.asarray(rng.rand(batch, n).astype(np.float32))

    classic = jax.jit(lambda p, w: jnp.fft.irfft(
        jnp.fft.rfft(w, n=n) * jnp.conj(jnp.fft.rfft(p, n=n)), n=n))
    ref = np.asarray(classic(pats, wins))
    scale = float(np.max(np.abs(ref)))

    t = time_fn(classic, (pats, wins))
    print("classic rfft                %8.2f ms" % (t * 1e3))
    packed = jax.jit(lambda p, w: sqdiff._correlate_rows(p, w, n))
    got = np.asarray(packed(pats, wins))
    t = time_fn(packed, (pats, wins))
    print("packed fft                  %8.2f ms   relerr %.2e"
          % (t * 1e3, float(np.max(np.abs(got - ref))) / scale))

    # candidate factorizations: n1 along sublanes (matmul side), n2 lanes
    facts = []
    for n1 in (128, 192, 256, 384, 512, 768, 1024):
        if n % n1 == 0 and n // n1 <= 8192:
            facts.append((n1, n // n1))
    for prec_name, prec in (("HIGH", jax.lax.Precision.HIGH),
                            ("HIGHEST", jax.lax.Precision.HIGHEST)):
        for n1, n2 in facts:
            if max(n1, n2) <= 1024:
                fn = jax.jit(functools.partial(
                    correlate_mxu, n1=n1, n2=n2, precision=prec,
                    forward=four_step_forward, inverse=four_step_inverse))
                try:
                    got = np.asarray(fn(pats, wins))
                    t = time_fn(fn, (pats, wins), iters)
                    print("4step  %4dx%-5d %-8s %8.2f ms   relerr %.2e"
                          % (n1, n2, prec_name, t * 1e3,
                             float(np.max(np.abs(got - ref))) / scale))
                except Exception as e:  # noqa: BLE001 - probe reports and moves on
                    print("4step  %4dx%-5d %-8s FAILED: %s" % (n1, n2, prec_name, str(e)[:90]))
            fn = jax.jit(functools.partial(
                correlate_mxu, n1=n1, n2=n2, precision=prec,
                forward=hybrid_forward, inverse=hybrid_inverse))
            try:
                got = np.asarray(fn(pats, wins))
                t = time_fn(fn, (pats, wins), iters)
                print("hybrid %4dx%-5d %-8s %8.2f ms   relerr %.2e"
                      % (n1, n2, prec_name, t * 1e3,
                         float(np.max(np.abs(got - ref))) / scale))
            except Exception as e:  # noqa: BLE001
                print("hybrid %4dx%-5d %-8s FAILED: %s" % (n1, n2, prec_name, str(e)[:90]))


if __name__ == "__main__":
    main()
