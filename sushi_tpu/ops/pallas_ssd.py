"""Pallas TPU kernel: exact SSD re-scoring at candidate lags.

The coarse FFT scores carry ~1e-6 relative noise, so the matcher re-scores
the top-K candidate lags exactly (see sushi_tpu/ops/sqdiff.py).  The plain
XLA formulation materializes a rolled copy of the whole padded window for
every (row, candidate) — O(B*K*n) HBM traffic for O(B*K*pat_len) useful
work.  This kernel keeps each row's pattern and window resident in VMEM
and visits the K candidates in-register: one VMEM roll + masked
multiply-accumulate per candidate, O(B*n) HBM traffic total.

Semantics are identical to ``sqdiff._rescore_candidates``:
    num[b, k]    = sum_{i < pat_len[b]} (pattern[b, i] - window[b, lag+i])^2
    energy[b, k] = sum_{i < pat_len[b]} window[b, lag+i]^2
with lag = candidate_lags[b, k].  Out-of-range candidate lags (lag +
pat_len > win_len, e.g. the padded/invalid block candidates that
``match_padded_batch`` passes when fewer valid lags exist than rescore_k)
make the roll wrap into the masked region and produce *unspecified*
num/energy values — callers must mask or invalidate such candidates
afterwards, as ``match_padded_batch`` does.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# pattern + window rows, their double-buffered copies, and the roll/diff
# temps must fit the ~16MB VMEM scoped budget: measured ~23.7MB at n=2^18,
# so rows are capped at 2^17 (the small-window buckets); larger buckets
# use the XLA rescore
MAX_PALLAS_ROW = 1 << 17


def _rescore_kernel(k_count, lags_ref, pat_lens_ref, pat_ref, win_ref, num_ref, energy_ref):
    row = pl.program_id(0)
    pat = pat_ref[0, :, :]  # (1, n): TPU blocks need the last two dims intact
    win = win_ref[0, :, :]
    positions = jax.lax.broadcasted_iota(jnp.int32, pat.shape, 1)
    mask = positions < pat_lens_ref[row]

    # a fori_loop (not an unrolled Python loop) so the roll/diff temps are
    # reused across candidates — unrolling keeps K copies live and blows
    # the VMEM scoped-allocation budget at large n
    slots = jax.lax.broadcasted_iota(jnp.int32, (1, k_count), 1)

    def body(k, carry):
        nums, energies = carry
        shifted = pltpu.roll(win, -lags_ref[row, k], axis=1)
        diff = jnp.where(mask, pat - shifted, 0.0)
        segment = jnp.where(mask, shifted, 0.0)
        hit = slots == k  # one-hot store (dynamic scatter is unsupported)
        return (
            jnp.where(hit, jnp.sum(diff * diff), nums),
            jnp.where(hit, jnp.sum(segment * segment), energies),
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
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (num, energy) at K candidate lags per row — Pallas version."""
    batch, n = patterns.shape
    k_count = candidate_lags.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # candidate_lags, pat_lens
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda b, lags, lens: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda b, lags, lens: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, k_count), lambda b, lags, lens: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, k_count), lambda b, lags, lens: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
    )
    num, energy = pl.pallas_call(
        functools.partial(_rescore_kernel, k_count),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((batch, 1, k_count), jnp.float32),
            jax.ShapeDtypeStruct((batch, 1, k_count), jnp.float32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=4 * batch * k_count * n, bytes_accessed=2 * batch * n * 4, transcendentals=0
        ),
    )(
        candidate_lags.astype(jnp.int32),
        pat_lens.astype(jnp.int32),
        patterns[:, None, :],
        windows[:, None, :],
    )
    return num[:, 0, :], energy[:, 0, :]


def pallas_rescore_supported(n: int) -> bool:
    return n <= MAX_PALLAS_ROW
