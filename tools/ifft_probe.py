"""Measure XLA:TPU's c2r irfft against a pair-packed c2c ifft, on chip.

The coarse kernel's dominant transform is the full-length inverse of the
product spectrum (reference semantics: /root/reference/wav.py:177-188 —
cv2.matchTemplate's correlation via FFT).  A c2r transform of length n is
worth half a c2c in theory; if XLA:TPU lowers ``irfft`` as a full c2c on a
reconstructed symmetric spectrum instead, two real inverses can ride ONE
c2c by packing rows into the real/imag planes:

    Z = full(S_even) + 1j * full(S_odd)     # [B/2, n] complex
    z = ifft(Z)                             # one c2c instead of two c2r
    corr_even, corr_odd = real(z), imag(z)  # exact in exact arithmetic

(where ``full`` reconstructs the conjugate-symmetric length-n spectrum
from the rfft half-spectrum).  This is mathematically exact — unlike
pooling or spectrum folding — so the only questions are the measured
ratio and the float32 cross-talk noise.

The forward side has the same trick in reverse: one c2c of ``w + 1j*p``
carries BOTH real rows' spectra (split by conjugate symmetry), so the
whole correlation stage — reference semantics 2 rfft + 1 irfft per row —
can ride 1 c2c forward per row + 1 c2c inverse per PAIR of rows
(1.5 c2c vs 3 r2c).

Timing amortizes N queue-serialized dispatches over ONE final fetch
(per-iteration fetches would measure relay wire latency, not the kernel),
and each iteration is CHAINED on the previous result (input perturbed by
a data-dependent scalar) so a caching relay cannot elide repeats.

Usage: python tools/ifft_probe.py [iterations]
"""

from __future__ import annotations

import functools
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from sushi_tpu.utils import compile_cache

SHAPES = [(64, 98304), (128, 131072), (128, 524288)]


def _full_spectrum(half: jnp.ndarray, n: int) -> jnp.ndarray:
    """[B, n//2+1] rfft half-spectrum -> [B, n] conjugate-symmetric."""
    tail = jnp.conj(half[:, 1 : n // 2])[:, ::-1]
    return jnp.concatenate([half, tail], axis=1)


def _spectra_from_packed(z_fft: jnp.ndarray) -> "tuple[jnp.ndarray, jnp.ndarray]":
    """FFT of (w + 1j*p) -> full c2c spectra (W, P) of the real rows w, p."""
    z_rev = jnp.roll(z_fft[:, ::-1], 1, axis=1)  # Z[(n-k) mod n]
    w_spec = 0.5 * (z_fft + jnp.conj(z_rev))
    p_spec = -0.5j * (z_fft - jnp.conj(z_rev))
    return w_spec, p_spec


def _corr_baseline(wins, pats, n):
    return jnp.fft.irfft(
        jnp.fft.rfft(wins, n=n) * jnp.conj(jnp.fft.rfft(pats, n=n)), n=n
    )


def _corr_packed(wins, pats, n):
    """Correlation via 1 c2c forward per row + 1 c2c inverse per row pair."""
    z = jnp.fft.fft(wins + 1j * pats, n=n)
    w_spec, p_spec = _spectra_from_packed(z)
    prod = w_spec * jnp.conj(p_spec)  # full conjugate-symmetric spectrum
    half = prod.shape[0] // 2
    pair = jnp.fft.ifft(prod[:half] + 1j * prod[half:], n=n)
    return jnp.concatenate([pair.real, pair.imag], axis=0).astype(jnp.float32)


def make_variants(n: int):
    @jax.jit
    def v_rfft(rows):
        return jnp.sum(jnp.abs(jnp.fft.rfft(rows, n=n)))

    @jax.jit
    def v_cfft(rows):
        return jnp.sum(jnp.abs(jnp.fft.fft(rows.astype(jnp.complex64), n=n)))

    @jax.jit
    def v_irfft(spec):
        return jnp.sum(jnp.fft.irfft(spec, n=n))

    # contiguous half-splits, not strided interleave: row i rides the real
    # plane of packed row i, row B/2+i the imag plane — no sublane gather
    @jax.jit
    def v_ifft_packed(spec):
        half = spec.shape[0] // 2
        lo, hi = spec[:half], spec[half:]
        z = jnp.fft.ifft(_full_spectrum(lo, n) + 1j * _full_spectrum(hi, n), n=n)
        return jnp.sum(z.real) + jnp.sum(z.imag)

    @jax.jit
    def v_corr_base(wins, pats):
        return jnp.sum(_corr_baseline(wins, pats, n))

    @jax.jit
    def v_corr_packed(wins, pats):
        return jnp.sum(_corr_packed(wins, pats, n))

    return v_rfft, v_cfft, v_irfft, v_ifft_packed, v_corr_base, v_corr_packed


def time_device(fn, args, iters: int, repeats: int = 3) -> float:
    """tools/kernel_ablation.py's methodology — the one the bench artifacts
    are built on: amortize N queue-serialized same-arg dispatches over ONE
    final fetch, subtract a single dispatch (wire + sync), min over repeats
    (relay contention only ever ADDS time)."""
    np.asarray(fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        np.asarray(out)
        elapsed = time.perf_counter() - t0
        t0 = time.perf_counter()
        np.asarray(fn(*args))
        single = time.perf_counter() - t0
        best = min(best, max((elapsed - single) / (iters - 1), 1e-9))
    return best * 1e3


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    compile_cache.enable()
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} iters={iters}")
    for batch, n in SHAPES:
        v_rfft, v_cfft, v_irfft, v_ifft_packed, v_corr_base, v_corr_packed = (
            make_variants(n)
        )
        rows = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
        pats = jnp.asarray(rng.standard_normal((batch, n)), jnp.float32)
        spec = jnp.fft.rfft(rows, n=n)
        spec.block_until_ready()

        ms_r = time_device(v_rfft, (rows,), iters)
        ms_c = time_device(v_cfft, (rows,), iters)
        ms_ir = time_device(v_irfft, (spec,), iters)
        ms_pk = time_device(v_ifft_packed, (spec,), iters)
        ms_cb = time_device(v_corr_base, (rows, pats), iters)
        ms_cp = time_device(v_corr_packed, (rows, pats), iters)

        ref = np.asarray(jax.jit(lambda w, p: _corr_baseline(w, p, n))(rows, pats))
        got = np.asarray(jax.jit(lambda w, p: _corr_packed(w, p, n))(rows, pats))
        err = float(np.max(np.abs(got - ref)))
        scale = float(np.max(np.abs(ref))) or 1.0
        print(
            f"[{batch}x{n}] rfft {ms_r:.2f} | c2c-fwd {ms_c:.2f} | "
            f"irfft {ms_ir:.2f} | packed-inv {ms_pk:.2f} ({ms_ir / ms_pk:.2f}x) | "
            f"corr base {ms_cb:.2f} -> packed {ms_cp:.2f} ({ms_cb / ms_cp:.2f}x) | "
            f"corr rel-err {err / scale:.2e}"
        )


if __name__ == "__main__":
    main()
