"""MXU four-step DFT correlation — matmul stage + batched FFT stage.

The coarse pass's correlation (reference semantics:
/root/reference/wav.py:177-188 — cv2.matchTemplate's crossCorr stage) is
~2/3 of the flagship kernel's execute time, and XLA:TPU's native FFT runs
it at a few hundred GFLOP/s with the MXU idle.  A Cooley-Tukey *four-step*
decomposition (n = n1*n2) turns most of the transform into systolic-array
work:

* reshape rows [B, n] -> [B, n1, n2] (row-major: x[i1, i2] = row[i1*n2+i2]),
* DFT_n1 along the n1 axis as a complex matmul (the MXU stage),
* twiddle by W_n^{-k1*i2},
* DFT_n2 along the n2 axis via XLA's batched FFT (the "hybrid" stage —
  a full matmul DFT_n2 would need an [n2, n2] operand; measured slower).

Forward output lands digit-permuted (spectral index k = k1 + n1*k2 lives
at [k1, k2]).  The correlation only ever does ELEMENTWISE spectral work
(conjugate-split of the packed pair, product), so nothing needs natural
order mid-stream; the inverse is built to consume the permuted layout and
emit natural-order rows — the same trick as decimation-in-frequency
convolution pipelines, zero transposes end to end.

The packed framing matches :func:`sqdiff._correlate_rows`: one transform
of ``w + 1j*p`` carries both real rows' spectra of the SAME row (split by
conjugate symmetry), and the real correlation comes back as the row-local
inverse's real plane — so the MXU path is a drop-in replacement for the
packed-FFT formulation, same [B, n] float32 out.  Everything stays
row-LOCAL (no cross-row packing): see the batch-invariance note in
``correlate_packed``.

Measured on the v5e (tools/mxu_fft_probe.py, 64x98304): packed FFT
2.92 ms, hybrid n1=128 HIGH 1.58 ms (rel-err ~1.2e-5 vs the classic rfft
formulation — an order above the FFT's own ~1.4e-6 noise, still inside
the plateau tie bands' coverage; decisions come from the exact rescore
either way, gated by the on-chip soak like every kernel change).
Precision is a plan knob: HIGH (bf16x3 passes) for speed, HIGHEST
(bf16x6, rel-err ~1.9e-6 — the packed path's own noise floor) as the
fallback if a soak ever implicates coarse noise.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

# MXU stage width: one 128x128 systolic tile per operand pass, and every
# production fft_size (4096..2^22, all 2^k or 3*2^k) divides by it.
_N1 = 128

# Gate, read ONCE at import (the same process-start-only semantics as
# sqdiff._PACKED_FFT: these select among numerically equivalent
# formulations inside jitted entries, so a mid-process env toggle could
# never reach already-compiled shapes; tests monkeypatch the constant).
_MXU_FFT = os.environ.get("SUSHI_MXU_FFT", "1") != "0"

# Smallest fft_size the MXU path takes by default: below this the matmul
# stage's extra elementwise traffic doesn't pay vs the plain packed FFT
# (chip-measured; see tools/mxu_fft_probe.py runs recorded in
# docs/DESIGN.md).  Tests monkeypatch this to force the path at toy sizes.
_MIN_FFT = 32768

# The MXU path only beats the packed c2c at the 3-smooth buckets
# (tools/mxu_bucket_probe.py, full production kernel on the v5e:
# 49152x64 0.73x, 98304x64 0.73x, 196608x128 0.99x — vs pow2 LOSSES
# 32768x64 1.67x, 131072x128 1.19x): XLA:TPU's power-of-two FFT is
# already near its floor, while its 3*2^k path is the weak spot the
# matmul stage exploits.
_REQUIRE_3SMOOTH = True


class Plan(NamedTuple):
    n1: int
    n2: int
    precision: jax.lax.Precision


def plan_for(fft_size: int, batch: int) -> Optional[Plan]:
    """MXU plan for this bucket, or None when the packed FFT should run.

    Requirements: TPU backend (the win is the systolic array; on CPU the
    einsum stages are strictly slower than the packed FFT and tests pin
    CPU numerics to it — unit tests call :func:`correlate_packed` with an
    explicit Plan instead), fft_size a multiple of n1=128 with n2 >= 16
    sublane-friendly columns, and the bucket large enough that the matmul
    stage pays (``_MIN_FFT``).  (The formulation is row-local — each row
    packs its OWN w + 1j*p — so any batch >= 1 qualifies; production
    batches are bucket-padded to 64/128 regardless.)
    """
    if not _MXU_FFT or batch < 1:
        return None
    if jax.default_backend() != "tpu":
        return None
    if fft_size % _N1 or fft_size // _N1 < 16 or fft_size < _MIN_FFT:
        return None
    if _REQUIRE_3SMOOTH and fft_size % 3:
        return None
    precision = (
        jax.lax.Precision.HIGHEST
        if os.environ.get("SUSHI_MXU_HIGHEST", "0") == "1"
        else jax.lax.Precision.HIGH
    )
    return Plan(_N1, fft_size // _N1, precision)


@functools.lru_cache(maxsize=None)
def _dft_mats(m: int, sign: float):
    """[m, m] DFT matrix, separate float32 real/imag planes (np, cached;
    jnp.asarray at trace time bakes them into the executable once)."""
    k = np.arange(m)
    w = np.exp(sign * 2j * np.pi * np.outer(k, k) / m)
    return w.real.astype(np.float32), w.imag.astype(np.float32)


@functools.lru_cache(maxsize=None)
def _twiddle(n1: int, n2: int, sign: float):
    """W_n^{sign*k1*i2} planes, shape [n1, n2]."""
    w = np.exp(sign * 2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / (n1 * n2))
    return w.real.astype(np.float32), w.imag.astype(np.float32)


def _cmatmul_n1(fr, fi, xr, xi, precision):
    """Complex (F @ X) over the n1 axis of [B, n1, n2] planes."""
    mm = functools.partial(jnp.einsum, "ij,bjk->bik", precision=precision)
    return mm(fr, xr) - mm(fi, xi), mm(fr, xi) + mm(fi, xr)


def _forward(xr, xi, plan: Plan):
    """Packed forward DFT: [B, n] planes -> [B, n1, n2] planes in the
    digit-permuted layout (k = k1 + n1*k2 at [k1, k2])."""
    n1, n2, precision = plan
    b = xr.shape[0]
    xr = xr.reshape(b, n1, n2)
    xi = xi.reshape(b, n1, n2)
    fr, fi = _dft_mats(n1, -1.0)
    ar, ai = _cmatmul_n1(jnp.asarray(fr), jnp.asarray(fi), xr, xi, precision)
    tr, ti = _twiddle(n1, n2, -1.0)
    br = ar * tr[None] - ai * ti[None]
    bi = ar * ti[None] + ai * tr[None]
    z = jnp.fft.fft(br + 1j * bi, axis=2)
    return z.real, z.imag


def _inverse(zr, zi, plan: Plan):
    """Inverse consuming the permuted layout; natural-order [B, n] planes."""
    n1, n2, precision = plan
    b = zr.shape[0]
    z = jnp.fft.ifft(zr + 1j * zi, axis=2)  # IDFT_n2 over k2 (1/n2 scaled)
    br, bi = z.real, z.imag
    tr, ti = _twiddle(n1, n2, +1.0)
    cr = br * tr[None] - bi * ti[None]
    ci = br * ti[None] + bi * tr[None]
    fr, fi = _dft_mats(n1, +1.0)
    dr, di = _cmatmul_n1(jnp.asarray(fr), jnp.asarray(fi), cr, ci, precision)
    scale = 1.0 / n1
    return (dr * scale).reshape(b, n1 * n2), (di * scale).reshape(b, n1 * n2)


def _rev_index(zr, zi, n1: int, n2: int):
    """Z[(n-k) mod n] in the [k1, k2] layout.

    For k = k1 + n1*k2: (n-k) mod n maps k1 -> (n1-k1) % n1 and
    k2 -> n2-1-k2 when k1 > 0, but k2 -> (n2-k2) % n2 when k1 == 0
    (the borrow only skips when the low digit is zero).
    """
    a_r = jnp.roll(jnp.flip(zr, axis=1), 1, axis=1)  # k1 -> (n1-k1) % n1
    a_i = jnp.roll(jnp.flip(zi, axis=1), 1, axis=1)
    b_r = jnp.flip(a_r, axis=2)  # k2 -> n2-1-k2
    b_i = jnp.flip(a_i, axis=2)
    # the (n2-k2) % n2 variant applies ONLY at k1 == 0; roll just that
    # [B, 1, n2] row instead of the whole tensor (this stage is
    # bandwidth-bound elementwise data movement on [B, n] planes)
    row0_r = jnp.roll(b_r[:, :1], 1, axis=2)  # k2 -> (n2-k2) % n2
    row0_i = jnp.roll(b_i[:, :1], 1, axis=2)
    return (
        jnp.concatenate([row0_r, b_r[:, 1:]], axis=1),
        jnp.concatenate([row0_i, b_i[:, 1:]], axis=1),
    )


def correlate_packed(
    patterns: jnp.ndarray, windows: jnp.ndarray, fft_size: int, plan: Plan
) -> jnp.ndarray:
    """Per-row circular cross-correlation on the MXU — drop-in for
    :func:`sqdiff._correlate_rows`'s packed branch (same packed-pair
    algebra, the transforms swapped for the four-step hybrid).

    Rows narrower than ``fft_size`` are zero-extended (the FFT paths pad
    implicitly via ``n=``; the matmul stage needs explicit width).
    """
    n1, n2, _ = plan
    assert n1 * n2 == fft_size

    def widen(rows):
        if rows.shape[1] == fft_size:
            return rows
        return jnp.pad(rows, ((0, 0), (0, fft_size - rows.shape[1])))

    # packed pair: z = fft(w + 1j*p) carries both rows' spectra
    zr, zi = _forward(widen(windows), widen(patterns), plan)
    rr, ri = _rev_index(zr, zi, n1, n2)
    # W = (Z + conj(Z~))/2 ;  P = -i/2 * (Z - conj(Z~))
    wr = 0.5 * (zr + rr)
    wi = 0.5 * (zi - ri)
    pr = 0.5 * (zi + ri)
    pi = -0.5 * (zr - rr)
    # product spectrum W * conj(P) — conjugate-symmetric per row, so the
    # inverse is real; run it row-LOCAL (full batch, real plane out).
    # An earlier variant packed two rows' inverses into one transform's
    # real/imag planes; the partner-dependent rounding broke
    # batch-invariance and flipped plateau decisions between the batched
    # and sequential drives (round-5 soak 98/100, SOAK_r05.json first
    # record).  The row-local inverse costs +0.23 ms at 64x98304
    # (tools/rowlocal_probe.py: paired 1.41 -> local 1.64 ms) and keeps
    # every row's scores a function of that row alone.
    prod_r = wr * pr + wi * pi
    prod_i = wi * pr - wr * pi
    out_r, _ = _inverse(prod_r, prod_i, plan)
    return out_r
