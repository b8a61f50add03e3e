"""Pallas TPU kernel: fused coarse-pass post-processing.

After the FFT cross-correlation, the coarse pass still owes: the sliding
pattern-length window energy E(u), the normalized-SSD score at every lag,
the valid-lag mask, per-128-lane-block first minima (candidate selection),
and the two plateau tie seeds.  As separate XLA ops those are ~10 full
[B, n] materializations (measured ~4 ms of the 7.8 ms kernel at the
64x98304 production bucket — an order of magnitude over the HBM-traffic
floor).  This kernel fuses all of it: one read of ``corr`` and
``windows`` per row, tiny outputs, and the scores never touch HBM.

Per grid step (one batch row, whole row resident in VMEM):

1. **Two-float prefix** P(u) = sum sq[0:u] as (hi, lo) pairs: a
   compensated log-doubling prefix along lanes (7 shifted two-sum adds
   inside each 128-lane row) + a compensated log-doubling scan over the
   per-row totals along sublanes.  Same error class as
   ``sqdiff._two_float_scan`` — the pairwise difference below is accurate
   relative to the window, not the stream.
2. **Sliding energy** E(u) = P(u + pat_len) - P(u): P is stored in a
   VMEM scratch extended by ``pat_cap//128 + 1`` edge rows holding P(n)
   (the truncated-sum clamp), and the dynamic shift decomposes as
   ``pat_len = 128*a + r`` — a dynamic sublane-start slice at row ``a``
   plus one lane roll by ``r`` with a lane-position stitch, exactly the
   access pattern of the rescore kernel (pallas_ssd.py).
3. **Scores** num/den with cv2's conventions (den==0 -> 2.0) and the
   valid-lag mask (lags >= win_len - pat_len + 1 -> 2.0) — identical
   formulas to ``sqdiff.coarse_scores``.
4. **Selection outputs**: per-block (128 lanes) first minimum and its
   first lane, the row's global minimum, and the first lag inside the
   tight/loose plateau tie bands around it (same 8e-6 / 1e-4 scaled
   bands as ``sqdiff._blockwise_candidates``).

Semantics are pinned by tests/test_pallas_coarse.py (interpret mode vs
the XLA formulation) and tools/chip_kernel_check.py (compiled on real
hardware, where Mosaic lowering bugs live).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128

# whole-row VMEM residency: corr + window + P scratch (hi, lo, extended)
# + the shifted slice temps is ~6 MB at n = 131072; larger rows use the
# TILED kernel below (rows streamed through VMEM in _TILE_ROWS sublane
# tiles with a carried two-float prefix), which extends fusion to the
# wide-window escalation buckets (2^19+) that previously fell back to
# ~10 [B, n] XLA materializations
MAX_FUSED_ROW = 1 << 17

# tiled kernel: samples per row tile (512 sublanes x 128 lanes)
_TILE_ROWS = 512
_TILE_SAMPLES = _TILE_ROWS * _LANES

# VMEM budget for the tiled kernel's P scratch (hi + lo, extended by the
# pat_cap edge rows); input/output tiles and temps add ~4 MB on top, and
# the whole thing must fit a v5e core's ~16 MB VMEM with headroom for
# Mosaic's own buffers.  n = 2^20 at pat_cap <= 2^16 compiles and passes
# parity on real hardware under this bound (tools/chip_kernel_check.py).
_P_BUDGET_BYTES = 9 << 20


def _tiled_p_bytes(n: int, pat_cap: int) -> int:
    rows = n // _LANES
    cap_rows = min(-(-int(pat_cap) // _LANES), rows)
    return 2 * (rows + cap_rows + 1) * _LANES * 4


def _two_sum(a_hi, a_lo, b_hi, b_lo):
    hi = a_hi + b_hi
    v = hi - a_hi
    err = (a_hi - (hi - v)) + (b_hi - v)
    return hi, err + a_lo + b_lo


def _lane_shift_right(rows, shift, fill=0.0):
    """Shift each 128-lane row right by a static ``shift``, zero-filling."""
    lane = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    rolled = pltpu.roll(rows, shift, axis=1)
    return jnp.where(lane >= shift, rolled, fill)


def _sublane_shift_down(rows, shift, fill=0.0):
    """Shift sublane rows down by a static ``shift``, zero-filling."""
    sub = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 0)
    rolled = pltpu.roll(rows, shift, axis=0)
    return jnp.where(sub >= shift, rolled, fill)


def _kernel(
    rows, cap_rows,
    pat_lens_ref, lag_counts_ref,
    corr_ref, win_ref, pat_energy_ref,
    bmin_ref, barg_ref, tight_ref, loose_ref,
    p_hi_ref, p_lo_ref,
):
    b = pl.program_id(0)
    window = win_ref[0]  # (rows, 128)
    sq = window * window

    # The prefix runs over ``cap_rows + 1`` extra rows of zeros, so every
    # tail position x >= n naturally carries the EXACT two-float P(n) —
    # the edge-clamp of the XLA formulation with no scalar broadcast
    # (Mosaic cannot broadcast a (1, 1) into both sublanes and lanes).
    rows_ext = rows + cap_rows + 1
    sq_ext = jnp.concatenate(
        [sq, jnp.zeros((cap_rows + 1, _LANES), jnp.float32)], axis=0
    )

    # --- inclusive PLAIN-f32 prefix along lanes (within each row) ---
    # Row-local: its error is bounded by the 128-sample row sums (~7 eps
    # relative to one row), NOT the stream, so compensating it buys ~1e-9
    # of the energy while costing ~5x the VPU ops (two_sum is ~10 ops per
    # shifted add; this prefix over the whole (rows, 128) array dominated
    # the kernel's compute).  The cross-row carry below STAYS two-float —
    # it spans the whole window, where plain f32 would lose eps*P(n)
    # against E(u), the error class compensation exists for.
    hi = sq_ext
    shift = 1
    while shift < _LANES:
        hi = hi + _lane_shift_right(hi, shift)
        shift *= 2

    # --- exclusive carry across sublane rows (log-doubling two-float) ---
    tot_hi = hi[:, _LANES - 1 :]  # (rows_ext, 1), kept 2-D for Mosaic
    tot_lo = jnp.zeros_like(tot_hi)
    # exclusive: shift row totals down one, then inclusive-scan
    carry_hi = _sublane_shift_down(tot_hi, 1)
    carry_lo = _sublane_shift_down(tot_lo, 1)
    shift = 1
    while shift < rows_ext:
        carry_hi, carry_lo = _two_sum(
            carry_hi, carry_lo,
            _sublane_shift_down(carry_hi, shift), _sublane_shift_down(carry_lo, shift),
        )
        shift *= 2

    # exclusive lane prefix = inclusive shifted right one lane
    excl_hi = _lane_shift_right(hi, 1)
    # P(u) at (row r, lane l): carry(r) + lane_excl(r, l), as (hi, lo)
    p_hi_ext, p_lo_ext = _two_sum(carry_hi, carry_lo, excl_hi, jnp.zeros_like(excl_hi))
    p_hi = p_hi_ext[:rows]
    p_lo = p_lo_ext[:rows]

    p_hi_ref[0:rows_ext, :] = p_hi_ext
    p_lo_ref[0:rows_ext, :] = p_lo_ext

    # --- shifted read: P(u + pat_len) via sublane slice + lane roll ---
    pat_len = pat_lens_ref[b]
    a = pat_len // _LANES
    r = pat_len - a * _LANES
    blk_hi = p_hi_ref[pl.ds(a, rows + 1), :]
    blk_lo = p_lo_ref[pl.ds(a, rows + 1), :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 1)
    roll_hi = pltpu.roll(blk_hi, -r, axis=1)
    roll_lo = pltpu.roll(blk_lo, -r, axis=1)
    hi2 = jnp.where(lane < _LANES - r, roll_hi[:rows], roll_hi[1:])
    lo2 = jnp.where(lane < _LANES - r, roll_lo[:rows], roll_lo[1:])

    energy = jnp.maximum((hi2 - p_hi) + (lo2 - p_lo), 0.0)

    # --- scores, exactly sqdiff.coarse_scores' formulas ---
    pat_energy = pat_energy_ref[0, 0, 0]
    corr = corr_ref[0]
    num = jnp.maximum(pat_energy - 2.0 * corr + energy, 0.0)
    den = jnp.sqrt(pat_energy * energy)
    scores = jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 2.0)
    positions = (
        jax.lax.broadcasted_iota(jnp.int32, (rows, _LANES), 0) * _LANES + lane
    )
    scores = jnp.where(positions < lag_counts_ref[b], scores, 2.0)

    # --- per-block first minima ---
    bmin = jnp.min(scores, axis=1, keepdims=True)  # (rows, 1)
    first_lane = jnp.min(jnp.where(scores == bmin, lane, _LANES), axis=1, keepdims=True)
    bmin_ref[0] = bmin
    barg_ref[0] = first_lane

    # --- plateau tie seeds (same bands as _blockwise_candidates) ---
    gmin = jnp.min(bmin)
    scale = 1.0 + jnp.abs(gmin)
    big = jnp.int32(jnp.iinfo(jnp.int32).max)
    tight_ref[0] = jnp.min(
        jnp.where(scores <= gmin + 8e-6 * scale, positions, big), axis=(0, 1), keepdims=True
    )
    loose_ref[0] = jnp.min(
        jnp.where(scores <= gmin + 1e-4 * scale, positions, big), axis=(0, 1), keepdims=True
    )


def _kernel_tiled(
    tile_rows, rows, cap_rows, num_tiles,
    pat_lens_ref, lag_counts_ref,
    corr_ref, win_ref, pat_energy_ref,
    bmin_ref, barg_ref, tight_ref, loose_ref,
    p_hi_ref, p_lo_ref, acc_ref, pos_ref,
):
    """Row-tiled variant: same outputs as ``_kernel`` for rows too large to
    hold resident in VMEM.  Grid is (batch, 3 phases, tiles); TPU grids run
    sequentially, so scratch carries state across steps:

    * **phase 0** builds the two-float prefix P tile by tile into a
      full-row VMEM scratch — within-tile lane/sublane log-doubling
      (identical math to ``_kernel``), plus a carried global (hi, lo)
      pair in SMEM (one extra compensated add per tile, same error class);
      the last tile fills the ``cap_rows + 1`` edge rows with P(n).
    * **phase 1** scores each tile from the resident P (corr tile streamed
      in), writes per-tile block-min/block-arg output blocks, and
      accumulates the row's global minimum in SMEM.
    * **phase 2** recomputes each tile's scores (corr streamed a second
      time — cheaper than holding an n-length f32 score scratch, and the
      tie bands need the FINAL global min) and accumulates the first
      position inside the tight/loose bands.

    HBM traffic: window once + corr twice = 3 row-reads vs the resident
    kernel's 2 and the XLA formulation's ~10.
    """
    b = pl.program_id(0)
    phase = pl.program_id(1)
    t = pl.program_id(2)
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, _LANES), 1)

    def tile_scores():
        pat_len = pat_lens_ref[b]
        a = pat_len // _LANES
        r = pat_len - a * _LANES
        base = t * tile_rows
        p_hi = p_hi_ref[pl.ds(base, tile_rows), :]
        p_lo = p_lo_ref[pl.ds(base, tile_rows), :]
        blk_hi = p_hi_ref[pl.ds(base + a, tile_rows + 1), :]
        blk_lo = p_lo_ref[pl.ds(base + a, tile_rows + 1), :]
        roll_hi = pltpu.roll(blk_hi, -r, axis=1)
        roll_lo = pltpu.roll(blk_lo, -r, axis=1)
        hi2 = jnp.where(lane < _LANES - r, roll_hi[:tile_rows], roll_hi[1:])
        lo2 = jnp.where(lane < _LANES - r, roll_lo[:tile_rows], roll_lo[1:])
        energy = jnp.maximum((hi2 - p_hi) + (lo2 - p_lo), 0.0)

        pat_energy = pat_energy_ref[0, 0, 0]
        corr = corr_ref[0]
        num = jnp.maximum(pat_energy - 2.0 * corr + energy, 0.0)
        den = jnp.sqrt(pat_energy * energy)
        scores = jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 2.0)
        positions = (
            base + jax.lax.broadcasted_iota(jnp.int32, (tile_rows, _LANES), 0)
        ) * _LANES + lane
        return jnp.where(positions < lag_counts_ref[b], scores, 2.0), positions

    @pl.when(phase == 0)
    def _prefix():
        window = win_ref[0]
        sq = window * window
        # inclusive PLAIN-f32 prefix along lanes (identical to _kernel:
        # row-local error, so compensation is spent on the carry only)
        hi = sq
        shift = 1
        while shift < _LANES:
            hi = hi + _lane_shift_right(hi, shift)
            shift *= 2
        lo = jnp.zeros_like(hi)
        tot_hi = hi[:, _LANES - 1 :]
        tot_lo = lo[:, _LANES - 1 :]
        carry_hi = _sublane_shift_down(tot_hi, 1)
        carry_lo = _sublane_shift_down(tot_lo, 1)
        shift = 1
        while shift < tile_rows:
            carry_hi, carry_lo = _two_sum(
                carry_hi, carry_lo,
                _sublane_shift_down(carry_hi, shift), _sublane_shift_down(carry_lo, shift),
            )
            shift *= 2
        excl_hi = _lane_shift_right(hi, 1)
        excl_lo = _lane_shift_right(lo, 1)
        ph, plo = _two_sum(carry_hi, carry_lo, excl_hi, excl_lo)

        # add the carried prefix of every earlier tile (scalar broadcast)
        g_hi = jnp.where(t == 0, 0.0, acc_ref[0])
        g_lo = jnp.where(t == 0, 0.0, acc_ref[1])
        ph, plo = _two_sum(ph, plo, g_hi, g_lo)
        p_hi_ref[pl.ds(t * tile_rows, tile_rows), :] = ph
        p_lo_ref[pl.ds(t * tile_rows, tile_rows), :] = plo

        # carry += this tile's total (last row's inclusive sum).  The last
        # row is extracted by mask-sum — Mosaic lowers full reductions
        # reliably where single-element vector extracts may not.
        sub = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)
        last = sub == tile_rows - 1
        tt_hi, tt_lo = _two_sum(
            jnp.sum(jnp.where(last, carry_hi, 0.0)), jnp.sum(jnp.where(last, carry_lo, 0.0)),
            jnp.sum(jnp.where(last, tot_hi, 0.0)), jnp.sum(jnp.where(last, tot_lo, 0.0)),
        )
        ng_hi, ng_lo = _two_sum(g_hi, g_lo, tt_hi, tt_lo)
        acc_ref[0] = ng_hi
        acc_ref[1] = ng_lo

        @pl.when(t == num_tiles - 1)
        def _tail():
            # positions >= n carry the EXACT P(n): the truncated-sum clamp
            p_hi_ref[pl.ds(rows, cap_rows + 1), :] = jnp.full(
                (cap_rows + 1, _LANES), ng_hi, jnp.float32
            )
            p_lo_ref[pl.ds(rows, cap_rows + 1), :] = jnp.full(
                (cap_rows + 1, _LANES), ng_lo, jnp.float32
            )

    @pl.when(phase == 1)
    def _select():
        scores, _ = tile_scores()
        bmin = jnp.min(scores, axis=1, keepdims=True)
        first_lane = jnp.min(jnp.where(scores == bmin, lane, _LANES), axis=1, keepdims=True)
        bmin_ref[0] = bmin
        barg_ref[0] = first_lane
        prev = jnp.where(t == 0, jnp.float32(3.0), acc_ref[2])  # scores <= 2
        acc_ref[2] = jnp.minimum(prev, jnp.min(bmin))

    @pl.when(phase == 2)
    def _ties():
        scores, positions = tile_scores()
        gmin = acc_ref[2]
        scale = 1.0 + jnp.abs(gmin)
        big = jnp.int32(jnp.iinfo(jnp.int32).max)
        tight_t = jnp.min(jnp.where(scores <= gmin + 8e-6 * scale, positions, big))
        loose_t = jnp.min(jnp.where(scores <= gmin + 1e-4 * scale, positions, big))
        pos_ref[0] = jnp.minimum(jnp.where(t == 0, big, pos_ref[0]), tight_t)
        pos_ref[1] = jnp.minimum(jnp.where(t == 0, big, pos_ref[1]), loose_t)

        @pl.when(t == num_tiles - 1)
        def _out():
            # Mosaic cannot store a bare scalar to VMEM — write (1, 1) arrays
            tight_ref[0] = jnp.full((1, 1), pos_ref[0], jnp.int32)
            loose_ref[0] = jnp.full((1, 1), pos_ref[1], jnp.int32)


def _coarse_post_tiled(
    corr, windows, pat_lens, lag_counts, pat_energy, pat_cap,
    tile_rows: int, interpret: bool,
):
    batch, n = windows.shape
    rows = n // _LANES
    cap_rows = min(-(-int(pat_cap) // _LANES), rows)
    num_tiles = rows // tile_rows
    if rows % tile_rows:
        raise ValueError(f"tiled coarse-post needs rows % {tile_rows} == 0, got n={n}")

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pat_lens, lag_counts
        grid=(batch, 3, num_tiles),
        in_specs=[
            # corr: swept in phases 1 and 2; frozen at tile 0 during phase
            # 0 (an unchanged block index is not re-fetched)
            pl.BlockSpec(
                (1, tile_rows, _LANES),
                lambda b, p, t, pl_, lc: (b, jnp.where(p == 0, 0, t), 0),
                memory_space=pltpu.VMEM,
            ),
            # window: swept in phase 0, frozen afterwards
            pl.BlockSpec(
                (1, tile_rows, _LANES),
                lambda b, p, t, pl_, lc, nt=num_tiles: (b, jnp.where(p == 0, t, nt - 1), 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, 1), lambda b, p, t, pl_, lc: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            # per-tile block-min/arg: written (fully) by phase 1 only.
            # Phase 0 parks the index at tile 0, which phase 1 writes first
            # before any flush; phase 2 parks at the last-written tile, so
            # every flush carries phase-1 data.
            pl.BlockSpec(
                (1, tile_rows, 1),
                lambda b, p, t, pl_, lc, nt=num_tiles: (
                    b, jnp.where(p == 1, t, jnp.where(p == 0, 0, nt - 1)), 0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, tile_rows, 1),
                lambda b, p, t, pl_, lc, nt=num_tiles: (
                    b, jnp.where(p == 1, t, jnp.where(p == 0, 0, nt - 1)), 0,
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 1, 1), lambda b, p, t, pl_, lc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, p, t, pl_, lc: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + cap_rows + 1, _LANES), jnp.float32),
            pltpu.VMEM((rows + cap_rows + 1, _LANES), jnp.float32),
            pltpu.SMEM((3,), jnp.float32),  # carry hi, carry lo, global min
            pltpu.SMEM((2,), jnp.int32),  # running tight/loose first positions
        ],
    )
    bmin, barg, tight, loose = pl.pallas_call(
        functools.partial(_kernel_tiled, tile_rows, rows, cap_rows, num_tiles),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((batch, rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((batch, rows, 1), jnp.int32),
            jax.ShapeDtypeStruct((batch, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((batch, 1, 1), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=50 * batch * n,
            bytes_accessed=batch * n * 3 * 4,
            transcendentals=batch * n * 2,  # the sqrt, twice
        ),
    )(
        pat_lens.astype(jnp.int32),
        lag_counts.astype(jnp.int32),
        corr.reshape(batch, rows, _LANES),
        windows.reshape(batch, rows, _LANES),
        pat_energy.reshape(batch, 1, 1),
    )
    return bmin[:, :, 0], barg[:, :, 0], tight[:, 0, 0], loose[:, 0, 0]


def coarse_post_supported(n: int, pat_cap: int = 0) -> bool:
    if n % _LANES:
        return False
    if n <= MAX_FUSED_ROW:
        return True
    return n % _TILE_SAMPLES == 0 and _tiled_p_bytes(n, pat_cap or n) <= _P_BUDGET_BYTES


def coarse_post_pallas(
    corr: jnp.ndarray,
    windows: jnp.ndarray,
    pat_lens: jnp.ndarray,
    lag_counts: jnp.ndarray,
    pat_energy: jnp.ndarray,
    pat_cap: int,
    interpret: bool = False,
    tile_rows: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fused energy + score + selection over a padded batch.

    corr/windows: [B, n] f32; pat_lens/lag_counts: [B] i32;
    pat_energy: [B] f32; ``pat_cap`` a static bound on every pat_len.
    Returns (block_min [B, n/128] f32, block_arg [B, n/128] i32 — first
    in-block lane of the block minimum, first_tight [B] i32,
    first_loose [B] i32 — first lag inside the tie bands).

    Rows up to :data:`MAX_FUSED_ROW` run fully VMEM-resident; larger rows
    take the tiled kernel (``_kernel_tiled``).  ``tile_rows`` forces the
    tiled kernel at a given tile height (tests exercise the tiling logic
    at small interpret-mode-friendly shapes with it).
    """
    batch, n = windows.shape
    if tile_rows or n > MAX_FUSED_ROW:
        return _coarse_post_tiled(
            corr, windows, pat_lens, lag_counts, pat_energy, pat_cap,
            tile_rows or _TILE_ROWS, interpret,
        )
    rows = n // _LANES
    cap_rows = min(-(-int(pat_cap) // _LANES), rows)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,  # pat_lens, lag_counts
        grid=(batch,),
        in_specs=[
            pl.BlockSpec((1, rows, _LANES), lambda b, pl_, lc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, _LANES), lambda b, pl_, lc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, pl_, lc: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, rows, 1), lambda b, pl_, lc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, rows, 1), lambda b, pl_, lc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, pl_, lc: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda b, pl_, lc: (b, 0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((rows + cap_rows + 1, _LANES), jnp.float32),
            pltpu.VMEM((rows + cap_rows + 1, _LANES), jnp.float32),
        ],
    )
    bmin, barg, tight, loose = pl.pallas_call(
        functools.partial(_kernel, rows, cap_rows),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((batch, rows, 1), jnp.float32),
            jax.ShapeDtypeStruct((batch, rows, 1), jnp.int32),
            jax.ShapeDtypeStruct((batch, 1, 1), jnp.int32),
            jax.ShapeDtypeStruct((batch, 1, 1), jnp.int32),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=40 * batch * n,
            bytes_accessed=batch * n * 2 * 4,
            transcendentals=batch * n,  # the sqrt
        ),
    )(
        pat_lens.astype(jnp.int32),
        lag_counts.astype(jnp.int32),
        corr.reshape(batch, rows, _LANES),
        windows.reshape(batch, rows, _LANES),
        pat_energy.reshape(batch, 1, 1),
    )
    return bmin[:, :, 0], barg[:, :, 0], tight[:, 0, 0], loose[:, 0, 0]
