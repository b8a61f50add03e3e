"""Pallas rescore kernel parity vs the XLA formulation (interpret mode on
CPU; the TPU runs the compiled kernel through the same code path)."""

import numpy as np
import pytest
import jax.numpy as jnp

from sushi_tpu.ops.pallas_ssd import pallas_rescore_supported, rescore_candidates_pallas
from sushi_tpu.ops.sqdiff import _rescore_candidates


@pytest.mark.parametrize("n,lp", [(4096, 500), (16384, 3000)])
def test_pallas_rescore_matches_xla(n, lp):
    rng = np.random.RandomState(8)
    batch, k = 4, 8
    patterns = np.zeros((batch, n), np.float32)
    windows = np.zeros((batch, n), np.float32)
    pat_lens = np.full(batch, lp, np.int32)
    lags = np.zeros((batch, k), np.int32)
    for b in range(batch):
        win_len = n - 256
        windows[b, :win_len] = rng.rand(win_len)
        patterns[b, :lp] = rng.rand(lp)
        lags[b] = rng.randint(0, win_len - lp, k)

    args = (jnp.asarray(patterns), jnp.asarray(pat_lens), jnp.asarray(windows), jnp.asarray(lags))
    ref_num, ref_energy = _rescore_candidates(*args)
    pal_num, pal_energy = rescore_candidates_pallas(*args, interpret=True)

    np.testing.assert_allclose(np.asarray(pal_num), np.asarray(ref_num), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pal_energy), np.asarray(ref_energy), rtol=1e-6)


def test_supported_cap():
    assert pallas_rescore_supported(1 << 17)
    assert pallas_rescore_supported(1 << 19)
    assert not pallas_rescore_supported(1 << 20)
    assert not pallas_rescore_supported((1 << 14) + 64)  # not lane-aligned


@pytest.mark.parametrize("pat_cap", [512, 3072, None])
def test_pallas_rescore_pat_cap(pat_cap):
    # pat_cap trims work but must not change results while >= every pat_len
    rng = np.random.RandomState(11)
    n, batch, k, lp = 8192, 3, 6, 500
    patterns = np.zeros((batch, n), np.float32)
    windows = np.zeros((batch, n), np.float32)
    pat_lens = np.full(batch, lp, np.int32)
    lags = np.zeros((batch, k), np.int32)
    for b in range(batch):
        win_len = n - 128
        windows[b, :win_len] = rng.rand(win_len)
        patterns[b, :lp] = rng.rand(lp)
        # include lags near the very end of the window (slice would overrun
        # n without the zero extension)
        lags[b] = np.concatenate([
            rng.randint(0, win_len - lp, k - 1), [win_len - lp]
        ])

    args = (jnp.asarray(patterns), jnp.asarray(pat_lens), jnp.asarray(windows), jnp.asarray(lags))
    ref_num, ref_energy = _rescore_candidates(*args)
    pal_num, pal_energy = rescore_candidates_pallas(*args, pat_cap, interpret=True)
    xla_num, xla_energy = _rescore_candidates(*args, pat_cap)

    np.testing.assert_allclose(np.asarray(pal_num), np.asarray(ref_num), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(pal_energy), np.asarray(ref_energy), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xla_num), np.asarray(ref_num), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(xla_energy), np.asarray(ref_energy), rtol=1e-6)


def test_match_padded_uses_auto_path():
    # end-to-end through match_padded: same result whichever rescore runs
    from sushi_tpu.ops.sqdiff import match_padded, oracle_match

    rng = np.random.RandomState(9)
    n = 8192
    window = rng.rand(n - 512).astype(np.float32)
    pattern = window[3000:3700].copy()
    pat = np.zeros((1, n), np.float32)
    win = np.zeros((1, n), np.float32)
    pat[0, : len(pattern)] = pattern
    win[0, : len(window)] = window
    score, lag = match_padded(
        jnp.asarray(pat),
        jnp.asarray(np.array([len(pattern)], np.int32)),
        jnp.asarray(win),
        jnp.asarray(np.array([len(window)], np.int32)),
        fft_size=n,
    )
    o_score, o_lag = oracle_match(pattern, window)
    assert int(lag[0]) == o_lag
    assert float(score[0]) == pytest.approx(o_score, abs=1e-4)
