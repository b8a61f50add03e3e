"""Pallas TPU kernel: exact SSD re-scoring at candidate lags.

The coarse FFT scores carry ~1e-6 relative noise, so the matcher re-scores
the top-K candidate lags exactly (see sushi_tpu/ops/sqdiff.py).  The plain
XLA formulation materializes a candidate-length slice of the window for
every (row, candidate) — fine numerically, but it streams from HBM.  This
kernel keeps each row's pattern and window resident in VMEM and visits the
K candidates in-register.

Layout is the whole trick.  A naive ``(1, n)`` row uses one of the VPU's 8
sublanes (8x waste) and rolls all ``n`` lanes per candidate.  Instead rows
live as ``(n/128, 128)`` — sublane-major, full vector-register
utilization — and a candidate lag decomposes as ``lag = 128*a + r``:

* a **dynamic sublane-start load** of ``pat_rows + 1`` rows at row ``a``
  (cheap on TPU: sublane indexing is the fast axis for dynamic slices),
* one **lane roll** by ``r`` of that small block,
* a lane-position select to stitch the two wrapped halves:
  ``window[lag + 128q + l]`` is row ``a+q`` lane ``l+r`` when ``l+r < 128``
  and row ``a+q+1`` lane ``l+r-128`` otherwise.

Per candidate the kernel touches ``pat_cap + 128`` elements instead of
``n`` (callers pass ``pat_cap`` = a bucketed bound on ``pat_len``), so the
work is proportional to the pattern, not the window.

Semantics are identical to ``sqdiff._rescore_candidates``:
    num[b, k]    = sum_{i < pat_len[b]} (pattern[b, i] - window[b, lag+i])^2
    energy[b, k] = sum_{i < pat_len[b]} window[b, lag+i]^2
with lag = candidate_lags[b, k].  Candidate lags must be in ``[0, n)``;
out-of-range *score* candidates (lag + pat_len > win_len, e.g. the
padded/invalid block candidates that ``match_padded_batch`` passes when
fewer valid lags exist than rescore_k) read the zero padding beyond the
window and produce values callers must mask or invalidate afterwards, as
``match_padded_batch`` does.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128

# the window block is (n + pat_cap + 128) floats and the pattern block
# pat_cap floats, double-buffered: worst case (pat_cap = n) that is
# ~(3n+128)*4*2 bytes of blocks plus per-candidate temps — ~12.6 MB of
# blocks at n=2^19, which compiles and runs on real v5e hardware
# (verified by tools/chip_kernel_check.py's pat_cap=None cases and
# bench.py's n=524288 kernel-throughput measurement).  Larger rows use
# the XLA rescore.
MAX_PALLAS_ROW = 1 << 19


def _rescore_kernel(k_count, pat_rows, lags_ref, pat_lens_ref, pat_ref, win_ref, num_ref, energy_ref):
    row = pl.program_id(0)
    pat = pat_ref[0]  # (pat_rows, 128)
    positions = (
        jax.lax.broadcasted_iota(jnp.int32, (pat_rows, _LANES), 0) * _LANES
        + jax.lax.broadcasted_iota(jnp.int32, (pat_rows, _LANES), 1)
    )
    mask = positions < pat_lens_ref[row]
    pat_m = jnp.where(mask, pat, 0.0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (pat_rows, _LANES), 1)

    # a fori_loop (not an unrolled Python loop) so the temps are reused
    # across candidates; results land via one-hot select (dynamic scatter
    # into a VMEM ref is unsupported)
    slots = jax.lax.broadcasted_iota(jnp.int32, (1, k_count), 1)

    def body(k, carry):
        nums, energies = carry
        lag = lags_ref[row, k]
        a = lag // _LANES
        r = lag - a * _LANES
        block = win_ref[0, pl.ds(a, pat_rows + 1), :]
        rolled = pltpu.roll(block, -r, axis=1)
        seg = jnp.where(lane < _LANES - r, rolled[:pat_rows], rolled[1:])
        seg = jnp.where(mask, seg, 0.0)
        diff = pat_m - seg
        hit = slots == k
        return (
            jnp.where(hit, jnp.sum(diff * diff), nums),
            jnp.where(hit, jnp.sum(seg * seg), energies),
        )

    init = (jnp.zeros((1, k_count), jnp.float32), jnp.zeros((1, k_count), jnp.float32))
    nums, energies = jax.lax.fori_loop(0, k_count, body, init)
    num_ref[0, :, :] = nums
    energy_ref[0, :, :] = energies


def rescore_candidates_pallas(
    patterns: jnp.ndarray,
    pat_lens: jnp.ndarray,
    windows: jnp.ndarray,
    candidate_lags: jnp.ndarray,
    pat_cap: Optional[int] = None,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (num, energy) at K candidate lags per row — Pallas version.

    ``pat_cap`` bounds every row's ``pat_len`` (callers bucket it; defaults
    to ``n``); the kernel's per-candidate work is O(pat_cap), not O(n).
    """
    batch, n = patterns.shape
    k_count = candidate_lags.shape[1]
    if pat_cap is None:
        pat_cap = n
    pat_cap = min(-(-pat_cap // _LANES) * _LANES, n)
    pat_rows = pat_cap // _LANES

    # window rows extended so a load at row a = (n-1)//128 of pat_rows + 1
    # rows stays in bounds; the tail is zeros, past every valid window
    ext_rows = n // _LANES + pat_rows + 1
    win_ext = jnp.pad(windows, ((0, 0), (0, ext_rows * _LANES - n))).reshape(
        batch, ext_rows, _LANES
    )
    pat_2d = patterns.reshape(batch, n // _LANES, _LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # candidate_lags, pat_lens
        grid=(batch,),
        in_specs=[
            pl.BlockSpec(
                (1, pat_rows, _LANES), lambda b, lags, lens: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, ext_rows, _LANES), lambda b, lags, lens: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, k_count), lambda b, lags, lens: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_count), lambda b, lags, lens: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    num, energy = pl.pallas_call(
        functools.partial(_rescore_kernel, k_count, pat_rows),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((batch, 1, k_count), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, k_count), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * k_count * pat_cap,
            bytes_accessed=batch * (n + pat_cap) * 4,
            transcendentals=0,
        ),
    )(
        candidate_lags.astype(jnp.int32),
        pat_lens.astype(jnp.int32),
        pat_2d,
        win_ext,
    )
    return num[:, 0, :], energy[:, 0, :]


def pallas_rescore_supported(n: int) -> bool:
    return n <= MAX_PALLAS_ROW and n % _LANES == 0
