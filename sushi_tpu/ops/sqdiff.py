"""Batched 1-D TM_SQDIFF_NORMED template matching on TPU.

This replaces the reference's entire native matching engine — sequential
``cv2.matchTemplate(window, pattern, cv2.TM_SQDIFF_NORMED)`` + ``argmin``
calls (/root/reference/wav.py:177-188) — with one fixed-shape batched
XLA computation:

* **coarse pass**: normalized SSD for every lag of every request via FFT
  cross-correlation.  With pattern T, window S, lag u::

      ssd(u)   = ||T||^2 - 2*(S ⋆ T)(u) + E(u),   E(u) = sum_{i<|T|} S[u+i]^2
      score(u) = ssd(u) / sqrt(||T||^2 * E(u))

  The correlation is 1 c2c transform per row + 1 c2c per row pair (see
  :func:`_correlate_rows` — real rows share complex planes, 2x fewer
  transform FLOPs than the textbook 2 rfft + 1 irfft); the sliding window
  energy is O(n) elementwise via two-level compensated cumulative sums
  (:func:`sliding_energy` — no extra transforms, no float64 needed).

* **exact pass**: the coarse scores carry ~1e-6-relative FFT noise, which
  can flip near-tie argmins.  We take the top-K coarse candidates and
  re-score them directly as sum((T - S_u)^2) — an all-non-negative sum
  with no cancellation — then pick the minimum with cv2's first-lag
  tie-breaking.

OpenCV semantics reproduced (verified empirically against cv2):

* scores are clamped to 1.0 whenever numerator >= denominator (including
  zero-energy windows/patterns, where cv2 emits exactly 1.0);
* ``argmin`` takes the first minimal lag;
* uint8 input behaves identically to float input scaled by 1/255 (the
  score is scale-invariant), so streams live on device as float32/255.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

_LANES = 128  # TPU vector lane count; batch/shape padding granularity

# Kernel-path gates, read ONCE at import: these select among numerically
# equivalent formulations inside jitted entries, so a mid-process env
# toggle could never reach shapes already compiled into the jit cache —
# a module constant makes the process-start-only semantics explicit
# (tests monkeypatch the constant, not the environment).
_PACKED_FFT = os.environ.get("SUSHI_PACKED_FFT", "1") != "0"
_FUSED_COARSE = os.environ.get("SUSHI_FUSED_COARSE", "1") != "0"


# ---------------------------------------------------------------------------
# Reference oracle (host, float64) — the ground truth for parity tests.


def oracle_sqdiff_normed(pattern: np.ndarray, window: np.ndarray) -> np.ndarray:
    """Normalized SSD in float64, cv2 conventions: direct correlation for
    small inputs, a float64 np.fft cross-correlation beyond (dependency-free
    — most realistic sizes take the FFT branch)."""
    pattern = np.asarray(pattern, np.float64)
    window = np.asarray(window, np.float64)
    lp, lw = len(pattern), len(window)
    if lw - lp + 1 <= 0:
        raise ValueError("window shorter than pattern")
    pat_energy = float(np.dot(pattern, pattern))
    if lp * (lw - lp + 1) <= 1 << 22:
        corr = np.correlate(window, pattern, mode="valid")
    else:
        n = 1 << int(lw + lp - 2).bit_length()
        spectrum = np.fft.rfft(window, n) * np.conj(np.fft.rfft(pattern, n))
        corr = np.fft.irfft(spectrum, n)[: lw - lp + 1]
    cumsq = np.concatenate([[0.0], np.cumsum(window * window)])
    energy = cumsq[lp:] - cumsq[: lw - lp + 1]
    num = pat_energy - 2.0 * corr + energy
    den = np.sqrt(pat_energy * energy)
    return np.where(num < den, num / np.where(den > 0, den, 1.0), 1.0)


def oracle_match(pattern: np.ndarray, window: np.ndarray) -> Tuple[float, int]:
    scores = oracle_sqdiff_normed(pattern, window)
    idx = int(scores.argmin())
    return float(scores[idx]), idx


# ---------------------------------------------------------------------------
# Device kernel.


# 64-sample blocks: the within-block f32 prefix's absolute rounding error
# is bounded by eps * block_total (~1e-6 for [0,1] audio), which sets the
# energy's absolute accuracy floor
_ENERGY_BLOCK = 64


def _two_float_scan(values: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Inclusive prefix sum along the last axis as (hi, lo) two-float pairs.

    A plain f32 prefix difference carries the absolute rounding error of
    the FULL prefix (~eps * total), which for short windows swamps the
    windowed sum itself.  Knuth two-sum compensation inside an
    associative scan keeps the pair accurate to ~eps^2, so a later
    pairwise difference is accurate relative to the WINDOW, not the
    stream.  TPUs have no float64 — this is the float64-free equivalent.
    """

    def combine(a, b):
        a_hi, a_lo = a
        b_hi, b_lo = b
        hi = a_hi + b_hi
        v = hi - a_hi
        err = (a_hi - (hi - v)) + (b_hi - v)
        return hi, err + a_lo + b_lo

    return jax.lax.associative_scan(
        combine, (values, jnp.zeros_like(values)), axis=values.ndim - 1
    )


def sliding_energy(
    windows: jnp.ndarray, pat_lens: jnp.ndarray, pat_cap: Optional[int] = None
) -> jnp.ndarray:
    """Exact sliding pattern-length energy E(u) = sum_{i<pat_len} S[u+i]^2
    for every lag u, via a two-level compensated cumulative sum.

    Replaces the analytic-boxcar FFT formulation (2 of the coarse pass's 5
    length-n transforms, measured ~40% of coarse time on a v5e) with O(n)
    elementwise work: within-block f32 prefixes (so the f32 error is
    relative to one block) + a two-float compensated scan over block
    totals (so the block-prefix difference is accurate relative to the
    window, not the stream).  ``windows`` must be zero-padded past
    ``win_len``, which makes E(u) for spans past the buffer equal the
    truncated sum, exactly like the boxcar version.

    Lowering note: E(u) = P(u + pat_len) - P(u) looks like a gather, and
    an earlier take_along_axis formulation measured 20x SLOWER than the
    boxcar FFTs it replaced — per-element gathers are pathological on
    TPU.  But the indices are structured: P at every position is a
    block-repeat plus a one-sample shift (pure elementwise), and
    "+ pat_len" is one dynamic_slice per row from an edge-extended
    buffer.  No gathers anywhere.
    """
    batch, n = windows.shape
    block = _ENERGY_BLOCK
    sq = windows * windows
    # in-block inclusive prefix as a lower-triangular matmul: the MXU does
    # the O(block^2) flops for free, where a cumsum over a size-64 minor
    # axis lowers to a windowed reduction (measured ~10x the HBM-traffic
    # floor for the whole energy stage).  HIGHEST keeps f32 semantics.
    tri = jnp.triu(jnp.ones((block, block), jnp.float32))
    inblock = jax.lax.dot_general(
        sq.reshape(batch, n // block, block), tri,
        (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
    )
    prefix_hi, prefix_lo = _two_float_scan(inblock[:, :, -1])  # inclusive, per block
    zeros = jnp.zeros((batch, 1), jnp.float32)
    excl_hi = jnp.concatenate([zeros, prefix_hi[:, :-1]], axis=1)  # blocks strictly before
    excl_lo = jnp.concatenate([zeros, prefix_lo[:, :-1]], axis=1)

    # P(x) for x in [0, n] as (hi, lo) arrays of length n+1:
    #   P(x) = excl_prefix[block(x)] + inblock[x-1], zero at block starts
    base_hi = jnp.repeat(excl_hi, block, axis=1)
    base_lo = jnp.repeat(excl_lo, block, axis=1)
    inblock_flat = inblock.reshape(batch, n)
    shifted = jnp.concatenate([zeros, inblock_flat[:, :-1]], axis=1)
    frac = jnp.where((jnp.arange(n, dtype=jnp.int32) % block == 0)[None, :], 0.0, shifted)
    p_hi = jnp.concatenate([base_hi, prefix_hi[:, -1:]], axis=1)
    p_lo = jnp.concatenate([base_lo + frac, prefix_lo[:, -1:]], axis=1)

    # edge-extend so a per-row shift by pat_len stays in range; values
    # past x = n stay P(n), which IS the min(u + pat_len, n) clamp.
    # ``pat_cap`` (a static bound on every pat_len) trims the extension —
    # without it the pad doubles the (hi, lo) materialization to 2n
    pad = min(pat_cap, n) if pat_cap else n - 1
    p_hi = jnp.pad(p_hi, ((0, 0), (0, pad)), mode="edge")
    p_lo = jnp.pad(p_lo, ((0, 0), (0, pad)), mode="edge")

    def at_shift(hi, lo, start):
        return (
            jax.lax.dynamic_slice(hi, (start,), (n,)),
            jax.lax.dynamic_slice(lo, (start,), (n,)),
        )

    hi2, lo2 = jax.vmap(at_shift)(p_hi, p_lo, pat_lens)
    hi1, lo1 = p_hi[:, :n], p_lo[:, :n]
    return jnp.maximum((hi2 - hi1) + (lo2 - lo1), 0.0)


def _masked_rows(rows: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    positions = jax.lax.broadcasted_iota(jnp.int32, rows.shape, 1)
    return jnp.where(positions < lengths[:, None], rows, 0.0)


def _correlate_rows(
    patterns: jnp.ndarray, windows: jnp.ndarray, fft_size: int
) -> jnp.ndarray:
    """Per-row circular cross-correlation ``irfft(rfft(w) * conj(rfft(p)))``.

    Two formulations, picked by ``SUSHI_PACKED_FFT`` (default on):

    * **classic**: 2 r2c forward + 1 c2r inverse per row — the textbook
      real-input form (reference semantics: /root/reference/wav.py:177-188,
      cv2.matchTemplate's correlation stage).
    * **packed**: XLA:TPU lowers r2c/c2r near full-c2c cost, so real
      transforms can share complex planes.  One c2c of ``w + 1j*p``
      carries BOTH rows' spectra (split by conjugate symmetry:
      ``W = (Z + conj(Z~))/2``, ``P = -i(Z - conj(Z~))/2`` where
      ``Z~[k] = Z[(n-k) mod n]``), and because each row's product
      spectrum is conjugate-symmetric (the correlation is real), the
      inverse rides ONE half-length c2c per row via the even/odd split:
      for conj-symmetric ``P`` with real inverse ``x``,
      ``E=(P[:n/2]+P[n/2:])/2``, ``O=(P[:n/2]-P[n/2:])/2 * W_n^{+k}``,
      ``z=IDFT_{n/2}(E+iO)`` gives ``x[2m]=Re z[m], x[2m+1]=Im z[m]``.
      Net: 1 c2c forward + 0.5 c2c inverse per row (+O(n) elementwise)
      vs 3 r2c.  Measured on a v5e (tools/rowlocal_probe.py): classic
      3.84 -> 2.58 ms at [64, 98304], 12.05 -> 8.48 at [128, 131072];
      rel-err ~2.4e-6 vs classic — the plateau tie bands' design
      tolerance (see :func:`_blockwise_candidates`), and decisions come
      from the exact rescore either way.

    Every formulation here is row-LOCAL: a row's scores are a function
    of that row's data only, never of its batch neighbors.  An earlier
    packed variant paired two DIFFERENT rows into one inverse c2c
    (row i in the real plane, row B/2+i imag); the partner-dependent
    rounding broke batch-invariance — the speculative-replay batch and a
    sequential drive of the same kernel committed different decisions on
    garbage plateaus (round-5 soak, 98/100, SOAK_r05.json first record).
    Batch-invariance is a hard contract of the search; do not reintroduce
    cross-row packing.
    """
    batch = patterns.shape[0]
    # the packed form is row-local (each row packs its OWN w + 1j*p), so
    # any batch qualifies; only an odd fft_size (no production bucket is)
    # blocks the even/odd half-length inverse
    if fft_size % 2 or not _PACKED_FFT:
        pat_f = jnp.fft.rfft(patterns, n=fft_size)
        win_f = jnp.fft.rfft(windows, n=fft_size)
        return jnp.fft.irfft(win_f * jnp.conj(pat_f), n=fft_size)
    # MXU four-step hybrid: same packed-pair algebra, the transforms
    # recast as matmul + batched-FFT stages so the systolic array carries
    # the FLOPs (chip-measured 2.92 -> 1.58 ms at 64x98304; ops/mxu_dft.py)
    from sushi_tpu.ops import mxu_dft

    plan = mxu_dft.plan_for(fft_size, batch)
    if plan is not None:
        return mxu_dft.correlate_packed(patterns, windows, fft_size, plan)
    # the packed sum needs equal row widths (the classic path pads each
    # via rfft(n=fft_size) independently); pad the narrower side up front
    if patterns.shape[1] != windows.shape[1]:
        width = max(patterns.shape[1], windows.shape[1])
        patterns = jnp.pad(patterns, ((0, 0), (0, width - patterns.shape[1])))
        windows = jnp.pad(windows, ((0, 0), (0, width - windows.shape[1])))
    z = jnp.fft.fft(windows + 1j * patterns, n=fft_size)
    z_rev = jnp.roll(z[:, ::-1], 1, axis=1)  # Z[(n-k) mod n]
    win_f = 0.5 * (z + jnp.conj(z_rev))
    pat_f = -0.5j * (z - jnp.conj(z_rev))
    prod = win_f * jnp.conj(pat_f)  # conjugate-symmetric per row
    # row-local half-length inverse (even/odd split, see docstring)
    half = fft_size // 2
    even = 0.5 * (prod[:, :half] + prod[:, half:])
    k = jnp.arange(half)
    twiddle = jnp.exp(2j * np.pi * k / fft_size).astype(jnp.complex64)
    odd = 0.5 * (prod[:, :half] - prod[:, half:]) * twiddle[None]
    pair = jnp.fft.ifft(even + 1j * odd, n=half)
    return jnp.stack([pair.real, pair.imag], axis=-1).reshape(batch, fft_size)


def coarse_scores(
    patterns: jnp.ndarray,
    pat_lens: jnp.ndarray,
    windows: jnp.ndarray,
    win_lens: jnp.ndarray,
    fft_size: int,
    pat_cap: Optional[int] = None,
) -> jnp.ndarray:
    """Unclamped normalized-SSD scores for all lags of a padded batch.

    patterns/windows: [B, n] float32, zero-padded beyond their lengths.
    Returns [B, n] scores; lags past ``win_len - pat_len`` hold +2.0
    (worse than any valid score can be after clamping).  ``pat_cap``
    (static bound on every ``pat_len``) trims the energy stage's
    edge-extension; correctness requires ``pat_lens <= pat_cap``.
    """
    corr = _correlate_rows(patterns, windows, fft_size)

    # callers may pass rows narrower than fft_size (the FFT pads
    # implicitly, but the cumsum energy is shape-bound — without this the
    # [B, fft_size] corr and [B, n] energy fail to broadcast)
    if windows.shape[1] != fft_size:
        windows = jnp.pad(windows, ((0, 0), (0, fft_size - windows.shape[1])))

    # the sliding window energy by compensated cumulative sums: O(n)
    # elementwise instead of 2 more length-n transforms (and MORE accurate
    # than the FFT boxcar — no spectral round-trip)
    energy = sliding_energy(windows, pat_lens, pat_cap)

    pat_energy = jnp.sum(patterns * patterns, axis=1, keepdims=True)
    num = jnp.maximum(pat_energy - 2.0 * corr + energy, 0.0)
    den = jnp.sqrt(pat_energy * energy)
    scores = jnp.where(den > 0.0, num / jnp.where(den > 0.0, den, 1.0), 2.0)

    lag_count = (win_lens - pat_lens + 1)[:, None]
    positions = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    return jnp.where(positions < lag_count, scores, 2.0)


def _rescore_candidates(
    patterns: jnp.ndarray,
    pat_lens: jnp.ndarray,
    windows: jnp.ndarray,
    candidate_lags: jnp.ndarray,
    pat_cap: Optional[int] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact (num, energy) at K candidate lags per row (XLA formulation).

    Computed as direct masked sums — no large-term cancellation, so float32
    is accurate to ~1e-6 relative regardless of window length.  ``pat_cap``
    (a static bound on every row's ``pat_len``, defaulting to ``n``) trims
    the per-candidate slice so work scales with the pattern, not the
    window: each candidate reads ``window[lag : lag + pat_cap]`` from a
    zero-extended copy (candidate lags may legally approach ``n``).
    """
    n = patterns.shape[1]
    if pat_cap is None or pat_cap >= n:
        def one_candidate(pattern, pat_len, window, lag):
            shifted = jnp.roll(window, -lag)  # window[i + lag] for masked i
            positions = jax.lax.broadcasted_iota(jnp.int32, pattern.shape, 0)
            mask = positions < pat_len
            diff = jnp.where(mask, pattern - shifted, 0.0)
            seg = jnp.where(mask, shifted, 0.0)
            return jnp.sum(diff * diff), jnp.sum(seg * seg)

        def one_row(pattern, pat_len, window, lags):
            return jax.vmap(lambda lag: one_candidate(pattern, pat_len, window, lag))(lags)

        return jax.vmap(one_row)(patterns, pat_lens, windows, candidate_lags)

    windows_ext = jnp.pad(windows, ((0, 0), (0, pat_cap)))
    patterns_cut = patterns[:, :pat_cap]

    def one_candidate(pattern, pat_len, window_ext, lag):
        seg = jax.lax.dynamic_slice(window_ext, (lag,), (pat_cap,))
        positions = jax.lax.broadcasted_iota(jnp.int32, pattern.shape, 0)
        mask = positions < pat_len
        diff = jnp.where(mask, pattern - seg, 0.0)
        seg = jnp.where(mask, seg, 0.0)
        return jnp.sum(diff * diff), jnp.sum(seg * seg)

    def one_row(pattern, pat_len, window_ext, lags):
        return jax.vmap(lambda lag: one_candidate(pattern, pat_len, window_ext, lag))(lags)

    return jax.vmap(one_row)(patterns_cut, pat_lens, windows_ext, candidate_lags)


def _rescore_auto(patterns, pat_lens, windows, candidates, pat_cap=None):
    """Pick the rescore implementation: the Pallas kernel on TPU (VMEM
    permitting; interpreted elsewhere for testability), XLA fallback."""
    from sushi_tpu.ops import pallas_ssd

    n = patterns.shape[1]
    if not pallas_ssd.pallas_rescore_supported(n):
        return _rescore_candidates(patterns, pat_lens, windows, candidates, pat_cap)
    on_tpu = jax.default_backend() == "tpu"
    if not on_tpu and candidates.shape[1] > 64:
        # interpret-mode pallas at pooled candidate counts (hundreds of
        # fori_loop steps) is minutes-slow on CPU; the XLA formulation is
        # numerically identical there, and the compiled Pallas kernel is
        # still parity-checked on real hardware (tools/chip_kernel_check)
        return _rescore_candidates(patterns, pat_lens, windows, candidates, pat_cap)
    return pallas_ssd.rescore_candidates_pallas(
        patterns, pat_lens, windows, candidates, pat_cap, interpret=not on_tpu
    )


def _blockwise_candidates(coarse: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k candidate lags from a coarse score matrix, plus plateau seeds.

    Hierarchical selection: a full top_k over n lags lowers to a sort
    (hundreds of ms at n=2^19); instead take each 128-lane block's first
    minimum, then top_k over the n/128 block minima.  The true argmin is
    always some block's winner; intra-block near-ties only matter for
    first-lag tie-breaking, which the plateau candidates preserve: score
    plateaus (constant audio regions) can be wider than k*128 lags, hiding
    the EARLIEST minimal lag that cv2's first-min rule would return, so
    nominate the first lag inside a tie band around the coarse minimum.
    The band must scale with the score (normalized SSD is O(1), but
    clamped regions sit at 2.0): a tight band of ~8x the coarse pass's
    observed FFT noise (~1e-6 relative) nominates only genuine near-ties,
    and a second loose band catches rows whose plateau noise runs hotter.
    False nominees cost nothing — the exact rescore outvotes them.

    Returns ``[B, k+2]`` int32 lags (in the coarse matrix's lag units).
    """
    blocks = coarse.reshape(coarse.shape[0], -1, _LANES)
    block_min = jnp.min(blocks, axis=2)
    block_arg = jnp.argmin(blocks, axis=2).astype(jnp.int32)  # first-in-block
    effective_k = min(k, block_min.shape[1])
    _, block_ids = jax.lax.top_k(-block_min, effective_k)  # ties -> lower block
    block_ids = block_ids.astype(jnp.int32)
    candidates = block_ids * _LANES + jnp.take_along_axis(block_arg, block_ids, axis=1)
    coarse_min = jnp.min(coarse, axis=1, keepdims=True)
    scale = 1.0 + jnp.abs(coarse_min)
    first_tight = jnp.argmax(coarse <= coarse_min + 8e-6 * scale, axis=1).astype(jnp.int32)
    first_loose = jnp.argmax(coarse <= coarse_min + 1e-4 * scale, axis=1).astype(jnp.int32)
    return jnp.concatenate([first_tight[:, None], first_loose[:, None], candidates], axis=1)


def _exact_select(
    patterns: jnp.ndarray,
    pat_lens: jnp.ndarray,
    windows: jnp.ndarray,
    win_lens: jnp.ndarray,
    candidates: jnp.ndarray,
    pat_cap: Optional[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact-rescore the candidate lags and pick cv2's (score, lag)."""
    num, energy = _rescore_auto(patterns, pat_lens, windows, candidates, pat_cap)
    pat_energy = jnp.sum(patterns * patterns, axis=1, keepdims=True)
    den = jnp.sqrt(pat_energy * energy)
    exact = jnp.where((den > 0.0) & (num < den), num / jnp.where(den > 0.0, den, 1.0), 1.0)

    # invalidate candidates that point past the valid lag range (possible
    # when fewer than K valid lags exist)
    lag_count = win_lens - pat_lens + 1
    valid = candidates < lag_count[:, None]
    exact = jnp.where(valid, exact, 2.0)

    best = jnp.min(exact, axis=1, keepdims=True)
    # first-lag tie-break among exact minima
    tie_lags = jnp.where(exact == best, candidates, jnp.iinfo(jnp.int32).max)
    best_lag = jnp.min(tie_lags, axis=1)
    best_score = best[:, 0]

    # cv2: if every valid lag clamps to 1.0, argmin returns lag 0
    all_clamped = best_score >= 1.0
    return (
        jnp.where(all_clamped, 1.0, best_score),
        jnp.where(all_clamped, 0, best_lag).astype(jnp.int32),
    )


def match_padded_batch(
    patterns: jnp.ndarray,
    pat_lens: jnp.ndarray,
    windows: jnp.ndarray,
    win_lens: jnp.ndarray,
    fft_size: int,
    rescore_k: int = 16,
    pat_cap: Optional[int] = None,
    coarse_pool: Optional[int] = None,
    pool_regions: int = 8,
    pool_slack: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Best (score, lag) per row of a padded batch, cv2-convention.

    Returns ``scores [B] float32`` (clamped to 1.0 like cv2) and
    ``lags [B] int32`` (first minimal lag; lag 0 when nothing scores
    below 1.0, matching cv2's argmin over an all-ones row).
    ``pat_cap`` is a static bound on every row's ``pat_len`` that trims
    the exact-rescore work (see :func:`_rescore_candidates`).

    ``coarse_pool=P`` runs the coarse pass at P-fold mean-pooled
    resolution (FFT length n/P — the per-request coarse-to-fine mode):
    ``pool_regions`` pooled candidates plus the two plateau seeds each
    expand to a full-rate lag neighborhood of ``pool_slack`` pooled
    blocks on each side for the exact rescore, so decisions still come
    from exact full-rate scores.  Callers gate P on pattern length
    (envelope matching needs >= ~64 pooled pattern samples; see
    batcher._coarse_pool_for).
    """
    if coarse_pool and coarse_pool > 1:
        return _match_pooled(
            patterns, pat_lens, windows, win_lens, fft_size,
            coarse_pool, pool_regions, pool_slack, pat_cap,
        )
    candidates = _coarse_candidates_auto(
        patterns, pat_lens, windows, win_lens, fft_size, rescore_k, pat_cap
    )
    return _exact_select(patterns, pat_lens, windows, win_lens, candidates, pat_cap)


def _coarse_candidates_auto(
    patterns, pat_lens, windows, win_lens, fft_size, rescore_k, pat_cap,
    force_fused: Optional[bool] = None,
):
    """Candidate lags for the exact rescore: the fused Pallas coarse-post
    kernel on TPU (energy + scores + block minima + plateau seeds in one
    VMEM-resident pass — the XLA formulation costs ~10 [B, n]
    materializations), the XLA ops elsewhere.  ``force_fused`` pins the
    path for parity tests (True uses interpret mode off-TPU)."""
    from sushi_tpu.ops import pallas_coarse

    use_fused = (
        pallas_coarse.coarse_post_supported(fft_size, pat_cap or fft_size)
        and _FUSED_COARSE
        if force_fused is None
        else force_fused
    )
    if not use_fused:
        coarse = coarse_scores(patterns, pat_lens, windows, win_lens, fft_size, pat_cap)
        return _blockwise_candidates(coarse, rescore_k)
    on_tpu = jax.default_backend() == "tpu"
    if force_fused is None and not on_tpu:
        coarse = coarse_scores(patterns, pat_lens, windows, win_lens, fft_size, pat_cap)
        return _blockwise_candidates(coarse, rescore_k)

    corr = _correlate_rows(patterns, windows, fft_size)
    if windows.shape[1] != fft_size:  # callers may pass narrower rows
        windows = jnp.pad(windows, ((0, 0), (0, fft_size - windows.shape[1])))
    pat_energy = jnp.sum(patterns * patterns, axis=1)
    lag_counts = win_lens - pat_lens + 1
    block_min, block_arg, first_tight, first_loose = pallas_coarse.coarse_post_pallas(
        corr, windows, pat_lens, lag_counts, pat_energy,
        pat_cap or fft_size, interpret=not on_tpu,
    )
    effective_k = min(rescore_k, block_min.shape[1])
    _, block_ids = jax.lax.top_k(-block_min, effective_k)  # ties -> lower block
    block_ids = block_ids.astype(jnp.int32)
    candidates = block_ids * _LANES + jnp.take_along_axis(block_arg, block_ids, axis=1)
    return jnp.concatenate(
        [first_tight[:, None], first_loose[:, None], candidates], axis=1
    )


def _match_pooled(
    patterns: jnp.ndarray,
    pat_lens: jnp.ndarray,
    windows: jnp.ndarray,
    win_lens: jnp.ndarray,
    fft_size: int,
    pool: int,
    regions: int,
    slack: int,
    pat_cap: Optional[int],
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pooled coarse pass + full-rate exact refinement.

    The coarse SQDIFF runs on P-fold mean-pooled rows (FFT length n/P):
    a match's envelope survives mean pooling when the pattern spans many
    pooled samples.  Mean pooling low-passes the SSD landscape, so the
    pooled minimum can sit several pooled lags from the full-rate minimum
    when the dip's basin is flat (smooth, low-frequency audio) — the
    refinement neighborhood therefore extends ``slack`` pooled blocks on
    EACH side of a candidate, not just one.  Each of the top ``regions``
    pooled candidates (and the two plateau seeds) expands to
    ``[p*P - slack*P, (p + slack + 1)*P)``; the exact rescore then
    decides among all neighborhoods at full rate, preserving cv2's
    first-lag tie-break.  Exactness is soak-verified (tools/soak.py) like
    every kernel change.
    """
    batch, n = patterns.shape
    pooled_n = n // pool
    pat_p = patterns.reshape(batch, pooled_n, pool).mean(axis=2)
    win_p = windows.reshape(batch, pooled_n, pool).mean(axis=2)
    # floor'd pooled lengths keep pooled lag counts >= the covering count
    # floor((win_len - pat_len)/P) + 1, so every valid full-rate lag falls
    # inside some pooled candidate's neighborhood
    pat_lens_p = jnp.maximum(pat_lens // pool, 1)
    win_lens_p = jnp.maximum(win_lens // pool, pat_lens_p)
    # pooled pat_lens are floor'd, so ceil'd pooled cap stays a bound
    cap_p = min(-(-pat_cap // pool), pooled_n) if pat_cap else None
    # the pooled coarse pass rides the same fused Pallas post-FFT kernel as
    # the full-rate path (falls back to coarse_scores + _blockwise_candidates
    # off-TPU / unsupported shapes) — at wide buckets the XLA formulation's
    # ~10 pooled-length materializations are a measurable chunk of the win
    pooled_cands = _coarse_candidates_auto(
        pat_p, pat_lens_p, win_p, win_lens_p, pooled_n, regions, cap_p
    )  # [B, regions+2]
    base = pooled_cands * pool - slack * pool
    offsets = jnp.arange((2 * slack + 1) * pool, dtype=jnp.int32)[None, None, :]
    candidates = (base[:, :, None] + offsets).reshape(batch, -1)
    candidates = jnp.clip(candidates, 0, n - 1)
    return _exact_select(patterns, pat_lens, windows, win_lens, candidates, pat_cap)


# jitted entry for pre-padded batches (tests, host-assembled requests)
match_padded = jax.jit(
    match_padded_batch,
    static_argnames=(
        "fft_size", "rescore_k", "pat_cap", "coarse_pool", "pool_regions", "pool_slack"
    ),
)


@functools.partial(jax.jit, static_argnames=("pool",))
def pooled_alignment_peak(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    src_len: jnp.ndarray,
    dst_len: jnp.ndarray,
    *,
    pool: int = 64,
) -> jnp.ndarray:
    """Whole-stream alignment peak at pooled resolution, on device.

    The coarse stage of the coarse-to-fine seed: mean-pool both resident
    streams ``pool``-fold, remove DC, and take the argmax of their circular
    FFT cross-correlation.  Returns the estimated sample offset of src
    content inside dst (``dst[i + delta] ~= src[i]``) quantized to the pool
    width; an exact device search around it pins the sample (see
    ``DeviceMatcher.global_alignment_estimate``).  ``src_len``/``dst_len``
    are the *real* buffer lengths — both arrays are padded with zeros to a
    shape quantum, and pooled blocks past the real data are masked so the
    padding cannot bias the correlation.
    """

    def prep(stream: jnp.ndarray, n_valid: jnp.ndarray) -> jnp.ndarray:
        rows = stream.reshape(-1, pool)
        if rows.dtype == jnp.uint8:
            rows = rows.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        else:
            rows = rows.astype(jnp.float32)
        pooled = rows.mean(axis=1)
        count = n_valid // pool  # whole blocks of real data, like the host seed
        valid = jnp.arange(pooled.shape[0], dtype=jnp.int32) < count
        mean = jnp.sum(jnp.where(valid, pooled, 0.0)) / jnp.maximum(count, 1).astype(jnp.float32)
        return jnp.where(valid, pooled - mean, 0.0)

    src_p = prep(src, src_len)
    dst_p = prep(dst, dst_len)
    fft_size = 1 << (max(src_p.shape[0], dst_p.shape[0]) * 2 - 1).bit_length()
    corr = jnp.fft.irfft(
        jnp.fft.rfft(dst_p, n=fft_size) * jnp.conj(jnp.fft.rfft(src_p, n=fft_size)), n=fft_size
    )
    peak = jnp.argmax(corr).astype(jnp.int32)
    # upper-half lags of a circular correlation are negative offsets
    return jnp.where(peak > fft_size // 2, peak - fft_size, peak) * pool


@functools.partial(
    jax.jit,
    static_argnames=(
        "fft_size", "slice_len", "rescore_k", "pat_cap", "coarse_pool",
        "pool_regions", "pool_slack",
    ),
)
def match_from_streams(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    pat_starts: jnp.ndarray,
    pat_lens: jnp.ndarray,
    win_starts: jnp.ndarray,
    win_lens: jnp.ndarray,
    *,
    fft_size: int,
    slice_len: int,
    rescore_k: int = 16,
    pat_cap: Optional[int] = None,
    coarse_pool: Optional[int] = None,
    pool_regions: int = 8,
    pool_slack: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Gather (pattern, window) slices from device-resident streams and match.

    ``src``/``dst`` are float32 or uint8 streams (uint8 is converted to
    float32/255 after the gather — the score is scale-invariant, and uint8
    residency quarters HBM footprint and host->device transfer).  Streams
    must be padded at the end by at least ``slice_len`` so the fixed-size
    gathers never clamp.  All start/length arrays are [B] int32; lengths
    beyond a slice are masked to zero.
    """

    def gather(stream, start):
        piece = jax.lax.dynamic_slice(stream, (start,), (slice_len,))
        if piece.dtype == jnp.uint8:
            piece = piece.astype(jnp.float32) * jnp.float32(1.0 / 255.0)
        return piece

    patterns = _masked_rows(jax.vmap(lambda s: gather(src, s))(pat_starts), pat_lens)
    windows = _masked_rows(jax.vmap(lambda s: gather(dst, s))(win_starts), win_lens)
    return match_padded_batch(
        patterns, pat_lens, windows, win_lens, fft_size, rescore_k, pat_cap,
        coarse_pool, pool_regions, pool_slack,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "fft_size", "slice_len", "rescore_k", "pat_cap", "coarse_pool",
        "pool_regions", "pool_slack",
    ),
)
def match_from_streams_bounds(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    bounds: jnp.ndarray,
    *,
    fft_size: int,
    slice_len: int,
    rescore_k: int = 16,
    pat_cap: Optional[int] = None,
    coarse_pool: Optional[int] = None,
    pool_regions: int = 8,
    pool_slack: int = 4,
) -> jnp.ndarray:
    """:func:`match_from_streams` with results packed as one ``[2, B]``
    float32 (row 0 scores, row 1 lags — exact in float32 since lags
    < 2^22) and the four [B] operand arrays packed as ONE ``[4, B]``
    int32 (rows: pat_start, pat_len, win_start, win_len).

    Both packings serve the same relay-latency discipline: remote
    backends pay a round-trip per eager op, per device->host sync, AND
    per host->device upload, so a round is pure jit dispatches with one
    operand upload each, ONE concat, ONE fetch — the pack/unpack is free
    inside the compiled kernel."""
    scores, lags = match_from_streams(
        src, dst, bounds[0], bounds[1], bounds[2], bounds[3],
        fft_size=fft_size, slice_len=slice_len, rescore_k=rescore_k, pat_cap=pat_cap,
        coarse_pool=coarse_pool, pool_regions=pool_regions, pool_slack=pool_slack,
    )
    return jnp.stack([scores, lags.astype(jnp.float32)])


@jax.jit
def join_packed(*packed: jnp.ndarray) -> jnp.ndarray:
    """Concatenate per-chunk ``[2, B_i]`` results along the batch axis.

    Jitted on purpose: an *eager* concatenate is dispatched synchronously
    and costs a full relay round-trip (plus a first-use compile measured in
    seconds) on tunneled backends, while a jit call is enqueued async like
    the match kernels — so the whole round stays at exactly one blocking
    device->host fetch.  Recompiles per distinct chunk-count/shape tuple;
    the batcher's bucket scheme keeps that set tiny.
    """
    return jnp.concatenate(packed, axis=1)
