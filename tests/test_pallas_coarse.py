"""Parity of the fused Pallas coarse-post kernel vs the XLA formulation.

Interpret mode on CPU pins the kernel's semantics; the compiled kernel is
additionally checked on real hardware by tools/chip_kernel_check.py
(Mosaic lowering bugs are invisible to interpret mode).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from sushi_tpu.ops import pallas_coarse, sqdiff


def _batch(rng, batch, n, full_rows=False):
    pats = np.zeros((batch, n), np.float32)
    wins = np.zeros((batch, n), np.float32)
    pat_lens = np.zeros(batch, np.int32)
    win_lens = np.zeros(batch, np.int32)
    for b in range(batch):
        wl = n if full_rows else rng.randint(n // 2, n + 1)
        pl_ = rng.randint(100, max(wl // 3, 101))
        wins[b, :wl] = rng.rand(wl).astype(np.float32)
        pats[b, :pl_] = rng.rand(pl_).astype(np.float32)
        pat_lens[b], win_lens[b] = pl_, wl
    return (
        jnp.asarray(pats), jnp.asarray(pat_lens),
        jnp.asarray(wins), jnp.asarray(win_lens),
    )


@pytest.mark.parametrize("n", [2048, 6144])
def test_fused_candidates_match_xla(n):
    """Same candidate set (modulo f32 op-order noise in the coarse
    nomination) and — decisively — the same final (score, lag) as the
    XLA coarse path, across random batches including short windows."""
    rng = np.random.RandomState(42 + n)
    pats, pat_lens, wins, win_lens = _batch(rng, 6, n)
    pat_cap = n // 2

    xla_cands = sqdiff._coarse_candidates_auto(
        pats, pat_lens, wins, win_lens, n, 16, pat_cap, force_fused=False
    )
    fused_cands = sqdiff._coarse_candidates_auto(
        pats, pat_lens, wins, win_lens, n, 16, pat_cap, force_fused=True
    )
    assert xla_cands.shape == fused_cands.shape

    # decisions: exact-select over each candidate set must agree
    s_x, l_x = sqdiff._exact_select(pats, pat_lens, wins, win_lens, xla_cands, pat_cap)
    s_f, l_f = sqdiff._exact_select(pats, pat_lens, wins, win_lens, fused_cands, pat_cap)
    np.testing.assert_array_equal(np.asarray(l_x), np.asarray(l_f))
    np.testing.assert_allclose(np.asarray(s_x), np.asarray(s_f), rtol=0, atol=1e-6)


def test_fused_block_minima_track_scores():
    """block_min/block_arg must equal the XLA coarse matrix's per-block
    first minima to f32 noise; plateau seeds must land in the tie band."""
    rng = np.random.RandomState(7)
    n = 2048
    pats, pat_lens, wins, win_lens = _batch(rng, 4, n)
    pat_cap = n // 2

    coarse = np.asarray(
        sqdiff.coarse_scores(pats, pat_lens, wins, win_lens, n, pat_cap)
    )
    pat_energy = jnp.sum(pats * pats, axis=1)
    lag_counts = win_lens - pat_lens + 1
    bmin, barg, tight, loose = pallas_coarse.coarse_post_pallas(
        jnp.asarray(
            np.asarray(
                jnp.fft.irfft(
                    jnp.fft.rfft(wins, n=n) * jnp.conj(jnp.fft.rfft(pats, n=n)), n=n
                )
            )
        ),
        wins, pat_lens, lag_counts, pat_energy, pat_cap, interpret=True,
    )
    bmin, barg = np.asarray(bmin), np.asarray(barg)
    blocks = coarse.reshape(coarse.shape[0], -1, 128)
    np.testing.assert_allclose(bmin, blocks.min(axis=2), rtol=0, atol=2e-5)
    for b in range(coarse.shape[0]):
        gmin = coarse[b].min()
        band = 1e-4 * (1.0 + abs(gmin))
        for seed in (int(np.asarray(tight)[b]), int(np.asarray(loose)[b])):
            assert 0 <= seed < n
            assert coarse[b, seed] <= gmin + 2 * band


@pytest.mark.parametrize("n,tile_rows", [(2048, 4), (6144, 8)])
def test_tiled_kernel_matches_resident(n, tile_rows):
    """The row-tiled kernel (used for n > MAX_FUSED_ROW on hardware) must
    produce the resident kernel's outputs exactly at any tile height —
    same per-block minima/args and tie seeds.  Small shapes + forced
    tiling keep interpret mode fast; compiled parity at real 2^19+ shapes
    runs on chip (tools/chip_kernel_check.py)."""
    rng = np.random.RandomState(17 + n)
    pats, pat_lens, wins, win_lens = _batch(rng, 3, n)
    pat_cap = n // 2
    corr = jnp.fft.irfft(
        jnp.fft.rfft(wins, n=n) * jnp.conj(jnp.fft.rfft(pats, n=n)), n=n
    )
    pat_energy = jnp.sum(pats * pats, axis=1)
    lag_counts = win_lens - pat_lens + 1
    resident = pallas_coarse.coarse_post_pallas(
        corr, wins, pat_lens, lag_counts, pat_energy, pat_cap, interpret=True
    )
    tiled = pallas_coarse.coarse_post_pallas(
        corr, wins, pat_lens, lag_counts, pat_energy, pat_cap,
        interpret=True, tile_rows=tile_rows,
    )
    # block minima agree to two-float op-order noise; args and seeds are
    # integers derived from those minima and must line up wherever the
    # minima are distinguishable (random data: no exact plateaus)
    np.testing.assert_allclose(
        np.asarray(resident[0]), np.asarray(tiled[0]), rtol=0, atol=2e-6
    )
    np.testing.assert_array_equal(np.asarray(resident[1]), np.asarray(tiled[1]))
    np.testing.assert_array_equal(np.asarray(resident[2]), np.asarray(tiled[2]))
    np.testing.assert_array_equal(np.asarray(resident[3]), np.asarray(tiled[3]))


def test_tiled_kernel_edge_clamp():
    """Lags whose pattern span runs past the buffer read the truncated-sum
    clamp P(n) — the tiled kernel's tail fill must equal the resident
    kernel's edge extension (full-length windows maximize tail reads)."""
    rng = np.random.RandomState(23)
    n = 2048
    pats, pat_lens, wins, win_lens = _batch(rng, 2, n, full_rows=True)
    corr = jnp.fft.irfft(
        jnp.fft.rfft(wins, n=n) * jnp.conj(jnp.fft.rfft(pats, n=n)), n=n
    )
    pat_energy = jnp.sum(pats * pats, axis=1)
    lag_counts = win_lens - pat_lens + 1
    resident = pallas_coarse.coarse_post_pallas(
        corr, wins, pat_lens, lag_counts, pat_energy, n, interpret=True
    )
    tiled = pallas_coarse.coarse_post_pallas(
        corr, wins, pat_lens, lag_counts, pat_energy, n,
        interpret=True, tile_rows=4,
    )
    np.testing.assert_allclose(
        np.asarray(resident[0]), np.asarray(tiled[0]), rtol=0, atol=2e-6
    )
    np.testing.assert_array_equal(np.asarray(resident[1]), np.asarray(tiled[1]))


def test_supported_gate():
    """The support gate: resident sizes, tiled sizes under the VMEM
    budget, and refusals (non-tile-multiple, oversized pat_cap)."""
    assert pallas_coarse.coarse_post_supported(98304, 32768)
    assert pallas_coarse.coarse_post_supported(131072, 131072)
    # the wide-window escalation buckets now fuse (the round-3 gap)
    assert pallas_coarse.coarse_post_supported(524288, 65536)
    assert pallas_coarse.coarse_post_supported(786432, 32768)
    # pat_cap as large as the row doubles the P scratch past the budget
    assert not pallas_coarse.coarse_post_supported(1 << 20, 1 << 20)
    # not a multiple of the tile quantum
    assert not pallas_coarse.coarse_post_supported((1 << 17) + _128(), 4096)


def _128():
    return 128


def test_fused_full_row_no_mask():
    """Full-length windows (no masked tail) — the all-valid-lags edge."""
    rng = np.random.RandomState(3)
    n = 1024
    pats, pat_lens, wins, win_lens = _batch(rng, 2, n, full_rows=True)
    cands_x = sqdiff._coarse_candidates_auto(
        pats, pat_lens, wins, win_lens, n, 8, None, force_fused=False
    )
    cands_f = sqdiff._coarse_candidates_auto(
        pats, pat_lens, wins, win_lens, n, 8, None, force_fused=True
    )
    s_x, l_x = sqdiff._exact_select(pats, pat_lens, wins, win_lens, cands_x, None)
    s_f, l_f = sqdiff._exact_select(pats, pat_lens, wins, win_lens, cands_f, None)
    np.testing.assert_array_equal(np.asarray(l_x), np.asarray(l_f))


def test_fused_masked_blocks_are_two():
    """Blocks wholly past the valid lag range must report block_min 2.0
    (the clamp _exact_select relies on) and the kernel's lag_count mask
    must cut at exactly win_len - pat_len + 1."""
    rng = np.random.RandomState(11)
    n = 1024
    wins = np.zeros((1, n), np.float32)
    wl, pl_ = 600, 200
    wins[0, :wl] = rng.rand(wl).astype(np.float32)
    pats = np.zeros((1, n), np.float32)
    pats[0, :pl_] = rng.rand(pl_).astype(np.float32)
    pat_lens = jnp.asarray(np.array([pl_], np.int32))
    win_lens = jnp.asarray(np.array([wl], np.int32))
    wins_j, pats_j = jnp.asarray(wins), jnp.asarray(pats)
    corr = jnp.fft.irfft(
        jnp.fft.rfft(wins_j, n=n) * jnp.conj(jnp.fft.rfft(pats_j, n=n)), n=n
    )
    bmin, _, _, _ = pallas_coarse.coarse_post_pallas(
        corr, wins_j, pat_lens, win_lens - pat_lens + 1, jnp.sum(pats_j * pats_j, axis=1),
        n, interpret=True,
    )
    bmin = np.asarray(bmin)[0]
    lag_count = wl - pl_ + 1  # 401 -> blocks 0..3 hold valid lags
    first_masked_block = -(-lag_count // 128)
    assert (bmin[first_masked_block:] == 2.0).all()
    assert (bmin[:first_masked_block] < 2.0).any()
