"""Kernel parity: batched FFT SQDIFF_NORMED vs cv2.matchTemplate and a
float64 direct oracle.  Tolerance contract: argmin within ±1 sample, and
where argmins differ by 1, the oracle scores at the two lags must be
near-ties.
"""

import cv2
import numpy as np
import pytest
import jax.numpy as jnp

from sushi_tpu.ops.sqdiff import (
    match_padded,
    coarse_scores,
    match_from_streams,
    match_padded_batch,
    oracle_match,
    oracle_sqdiff_normed,
)


def cv2_match(pattern: np.ndarray, window: np.ndarray):
    scores = cv2.matchTemplate(window.reshape(1, -1), pattern.reshape(1, -1), cv2.TM_SQDIFF_NORMED)[0]
    return float(scores.min()), int(scores.argmin())


def _pad_batch(patterns, windows, n):
    b = len(patterns)
    pat = np.zeros((b, n), np.float32)
    win = np.zeros((b, n), np.float32)
    pat_lens = np.array([len(p) for p in patterns], np.int32)
    win_lens = np.array([len(w) for w in windows], np.int32)
    for i, (p, w) in enumerate(zip(patterns, windows)):
        pat[i, : len(p)] = p
        win[i, : len(w)] = w
    return jnp.asarray(pat), jnp.asarray(pat_lens), jnp.asarray(win), jnp.asarray(win_lens)


def assert_matches_oracle(pattern, window, fft_size, atol_score=5e-4):
    pat, pat_lens, win, win_lens = _pad_batch([pattern], [window], fft_size)
    score, lag = match_padded(pat, pat_lens, win, win_lens, fft_size=fft_size)
    score, lag = float(score[0]), int(lag[0])

    oracle_scores = oracle_sqdiff_normed(pattern, window)
    o_score, o_lag = float(oracle_scores.min()), int(oracle_scores.argmin())

    if lag != o_lag:
        assert abs(lag - o_lag) <= 1, f"lag {lag} vs oracle {o_lag}"
        # must be a near-tie for the flip to be acceptable
        assert abs(oracle_scores[lag] - o_score) < 1e-3
    assert score == pytest.approx(o_score, abs=atol_score)


def test_oracle_agrees_with_cv2():
    rng = np.random.RandomState(0)
    for trial in range(10):
        window = rng.rand(3000).astype(np.float32)
        start = rng.randint(0, 2500)
        length = rng.randint(32, 400)
        pattern = window[start : start + length] + rng.randn(length).astype(np.float32) * 0.01
        o_scores = oracle_sqdiff_normed(pattern, window)
        c_scores = cv2.matchTemplate(window.reshape(1, -1), pattern.reshape(1, -1), cv2.TM_SQDIFF_NORMED)[0]
        assert o_scores.shape == c_scores.shape
        assert int(o_scores.argmin()) == int(c_scores.argmin())
        np.testing.assert_allclose(o_scores, c_scores, atol=2e-5)


def test_exact_embedded_pattern_found():
    rng = np.random.RandomState(1)
    window = rng.rand(8192).astype(np.float32)
    pattern = window[5000:5600].copy()
    assert_matches_oracle(pattern, window, fft_size=8192)


def test_noisy_embedded_pattern():
    rng = np.random.RandomState(2)
    window = rng.rand(16000).astype(np.float32)
    pattern = np.clip(window[3210:4000] + rng.randn(790).astype(np.float32) * 0.05, 0, 1)
    assert_matches_oracle(pattern, window, fft_size=16384)


def test_uint8_quantized_audio_like():
    # realistic path: uint8 analysis buffers scaled to [0,1]
    rng = np.random.RandomState(3)
    base = (rng.randint(0, 256, 30000).astype(np.float32)) / 255.0
    window = base
    pattern = base[12000:13500].copy()
    assert_matches_oracle(pattern, window, fft_size=32768)


def test_batch_of_mixed_lengths_matches_oracle():
    rng = np.random.RandomState(4)
    patterns, windows = [], []
    for i in range(7):
        w = rng.rand(rng.randint(2000, 12000)).astype(np.float32)
        start = rng.randint(0, len(w) - 600)
        length = rng.randint(64, 512)
        p = np.clip(w[start : start + length] + rng.randn(length).astype(np.float32) * 0.02, 0, 1)
        patterns.append(p)
        windows.append(w)
    n = 16384
    pat, pat_lens, win, win_lens = _pad_batch(patterns, windows, n)
    scores, lags = match_padded(pat, pat_lens, win, win_lens, fft_size=n)
    for i in range(7):
        o_scores = oracle_sqdiff_normed(patterns[i], windows[i])
        o_lag = int(o_scores.argmin())
        lag = int(lags[i])
        if lag != o_lag:
            assert abs(lag - o_lag) <= 1
            assert abs(o_scores[lag] - o_scores.min()) < 1e-3
        assert float(scores[i]) == pytest.approx(float(o_scores.min()), abs=5e-4)


def test_all_mismatch_clamps_to_one_lag_zero():
    # zero-energy window: cv2 emits 1.0 everywhere; argmin -> lag 0
    pattern = np.ones(64, np.float32)
    window = np.zeros(512, np.float32)
    pat, pat_lens, win, win_lens = _pad_batch([pattern], [window], 1024)
    score, lag = match_padded(pat, pat_lens, win, win_lens, fft_size=1024)
    assert float(score[0]) == 1.0
    assert int(lag[0]) == 0
    c_scores = cv2.matchTemplate(window.reshape(1, -1), pattern.reshape(1, -1), cv2.TM_SQDIFF_NORMED)[0]
    assert c_scores.min() == 1.0 and int(c_scores.argmin()) == 0


def test_first_min_tie_break():
    # two identical exact matches; cv2 argmin picks the first
    pattern = np.array([0.2, 0.9, 0.4, 0.7] * 8, np.float32)
    window = np.zeros(512, np.float32) + 0.5
    window[100 : 100 + len(pattern)] = pattern
    window[300 : 300 + len(pattern)] = pattern
    _, c_lag = cv2_match(pattern, window)
    pat, pat_lens, win, win_lens = _pad_batch([pattern], [window], 1024)
    _, lag = match_padded(pat, pat_lens, win, win_lens, fft_size=1024)
    assert int(lag[0]) == c_lag == 100


def test_coarse_scores_masks_invalid_lags():
    rng = np.random.RandomState(5)
    pattern = rng.rand(100).astype(np.float32)
    window = rng.rand(300).astype(np.float32)
    pat, pat_lens, win, win_lens = _pad_batch([pattern], [window], 512)
    scores = np.asarray(coarse_scores(pat, pat_lens, win, win_lens, 512))
    assert np.all(scores[0, 201:] == 2.0)
    assert np.all(scores[0, :201] < 2.0)


def test_match_from_streams_gather_path():
    rng = np.random.RandomState(6)
    n = 4096
    src = rng.rand(20000).astype(np.float32)
    dst = np.concatenate([rng.rand(1500).astype(np.float32), src + 0]).astype(np.float32)
    # pad streams so fixed-size gathers cannot clamp
    src_dev = jnp.asarray(np.pad(src, (0, n)))
    dst_dev = jnp.asarray(np.pad(dst, (0, n)))
    # two requests: patterns at src[3000:3500] and src[9000:9800],
    # searched in dst windows that contain their shifted location (+1500)
    pat_starts = jnp.asarray(np.array([3000, 9000], np.int32))
    pat_lens = jnp.asarray(np.array([500, 800], np.int32))
    win_starts = jnp.asarray(np.array([3300, 9500], np.int32))
    win_lens = jnp.asarray(np.array([3000, 3000], np.int32))
    scores, lags = match_from_streams(
        src_dev, dst_dev, pat_starts, pat_lens, win_starts, win_lens, fft_size=n, slice_len=n
    )
    # expected lag: pattern located at dst[pat_start+1500] => lag = pat_start+1500-win_start
    assert int(lags[0]) == 3000 + 1500 - 3300
    assert int(lags[1]) == 9000 + 1500 - 9500
    assert float(scores[0]) < 1e-4 and float(scores[1]) < 1e-4


def test_realistic_audio_episode_slice():
    # synthetic "episode" slices through the real ingest path
    from tests.fixtures import synth_episode, write_wav_int16
    import tempfile, os

    from sushi_tpu.media.stream import AudioStream

    with tempfile.TemporaryDirectory() as tmp:
        src_path = os.path.join(tmp, "src.wav")
        audio = synth_episode(20.0, [(2.0, 4.0), (8.0, 9.5), (14.0, 16.0)], seed=11)
        write_wav_int16(src_path, audio, framerate=48000)
        stream = AudioStream(src_path, sample_rate=12000, sample_type="uint8")

    data = stream.data.astype(np.float32) / 255.0
    pattern = data[stream.sample_for_time(8.0) : stream.sample_for_time(9.5)]
    lo = stream.sample_for_time(5.0)
    window = data[lo : stream.sample_for_time(12.0)]
    c_score, c_lag = cv2_match(pattern, window)

    n = 131072
    pat, pat_lens, win, win_lens = _pad_batch([pattern], [window], n)
    score, lag = match_padded(pat, pat_lens, win, win_lens, fft_size=n)
    assert abs(int(lag[0]) - c_lag) <= 1
    assert float(score[0]) == pytest.approx(c_score, abs=1e-3)
    # and the found lag equals the true location of the pattern
    assert int(lag[0]) + lo == stream.sample_for_time(8.0)


class TestPlateauTieBreak:
    """cv2's argmin takes the FIRST minimum; plateaus wider than the
    blockwise top-K must still tie-break to the earliest lag via the
    near-min plateau candidates (adversarial widths per wav.py:187-188
    first-minimum semantics)."""

    def _match(self, pattern, window, fft_size, rescore_k=8):
        pat, pat_lens, win, win_lens = _pad_batch([pattern], [window], fft_size)
        score, lag = match_padded(
            pat, pat_lens, win, win_lens, fft_size=fft_size, rescore_k=rescore_k
        )
        return float(score[0]), int(lag[0])

    def test_exact_tie_plateau_wider_than_topk(self):
        # constant run: every lag inside it scores exactly equal; the run
        # spans far more than rescore_k * 128 lags, so the blockwise
        # candidates alone cannot see its first block reliably
        rng = np.random.RandomState(3)
        pat_len, n = 512, 8192
        plateau_start = 1733  # deliberately not lane-aligned
        window = rng.rand(n - 1024).astype(np.float32) + 1.0
        window[plateau_start : plateau_start + 4096] = 0.5
        pattern = np.full(pat_len, 0.5, np.float32)

        c_score, c_lag = cv2_match(pattern, window)
        score, lag = self._match(pattern, window, n, rescore_k=4)
        assert lag == c_lag == plateau_start
        assert score == pytest.approx(c_score, abs=1e-5)

    def test_periodic_repeats_equal_quality(self):
        # the pattern recurs identically every `period` samples: the true
        # minima tie exactly, and cv2's own pick among them is float-noise
        # arbitrary (this fixture makes cv2 return 3500, not 0!), so the
        # contract is the soak's: an equal-quality pick — our lag must be
        # one of the true minima, scored within noise of cv2's minimum
        rng = np.random.RandomState(4)
        pat_len, period, repeats = 300, 700, 9
        motif = (rng.rand(period) * 0.8 + 0.1).astype(np.float32)
        window = np.tile(motif, repeats).astype(np.float32)
        pattern = motif[:pat_len].copy()
        n = 8192
        c_score, _ = cv2_match(pattern, window)
        score, lag = self._match(pattern, window, n, rescore_k=4)
        assert lag % period == 0  # a true repeat position
        oracle_scores = oracle_sqdiff_normed(pattern, window)
        assert oracle_scores[lag] <= float(oracle_scores.min()) + 1e-9
        assert score == pytest.approx(c_score, abs=1e-5)

    def test_uint8_quantized_plateau(self):
        # plateau arising from uint8 quantization of near-silence (the
        # pad region case), with a genuine match later in the window:
        # the plateau must not shadow the true minimum, and when the true
        # minimum IS the plateau, the first plateau lag must win
        rng = np.random.RandomState(5)
        pat_len, n = 400, 4096
        quiet = np.full(3000, 128, np.uint8)
        window_u8 = np.concatenate([quiet, rng.randint(0, 256, 600).astype(np.uint8)])
        pattern_u8 = np.full(pat_len, 128, np.uint8)
        window = window_u8.astype(np.float32) / 255.0
        pattern = pattern_u8.astype(np.float32) / 255.0
        c_score, c_lag = cv2_match(pattern, window)
        score, lag = self._match(pattern, window, n)
        assert lag == c_lag == 0
        assert score == pytest.approx(c_score, abs=1e-5)


def test_pooled_coarse_optin_matches_cv2_on_broadband():
    """The opt-in pooled coarse-to-fine mode (SUSHI_COARSE_POOL): pooled
    candidate regions + full-rate exact refinement must still return cv2's
    lag on broadband audio (the regime the mode is gated to; see the
    measured-reject note in batcher._coarse_pool_for)."""
    rng = np.random.RandomState(21)
    n, pat_cap = 16384, 4096
    for trial in range(6):
        pat_len = rng.randint(900, 4000)
        win_len = rng.randint(pat_len + 2000, n)
        base = rng.rand(win_len).astype(np.float32)
        true_lag = rng.randint(0, win_len - pat_len + 1)
        pattern = base[true_lag : true_lag + pat_len] + rng.randn(pat_len).astype(np.float32) * 0.01
        pat = np.zeros((1, n), np.float32)
        pat[0, :pat_len] = pattern
        win = np.zeros((1, n), np.float32)
        win[0, :win_len] = base
        c_score, c_lag = cv2_match(pattern, base)
        score, lag = match_padded(
            jnp.asarray(pat), jnp.asarray(np.array([pat_len], np.int32)),
            jnp.asarray(win), jnp.asarray(np.array([win_len], np.int32)),
            fft_size=n, coarse_pool=8, pat_cap=pat_cap,
        )
        assert int(lag[0]) == c_lag
        assert float(score[0]) == pytest.approx(c_score, abs=1e-5)


def test_sliding_energy_precision_vs_float64():
    """The compensated-cumsum sliding energy (which replaced the boxcar
    FFT's 2 extra transforms) must track the float64 oracle to ~f32
    rounding: abs error <= 8e-6 + 4e-7 * E.  The floor is the in-block
    prefix's f32 rounding, bounded by eps * block_total <= 64 * eps *
    max_sq ~ 7.7e-6 for [0, 1] inputs (the triangular-matmul prefix's
    accumulation-order constant; the relative term is the f32
    representation of E plus the final (hi + lo) combine).  Score impact
    stays ~5e-7 relative — far inside the 8e-6 plateau nomination band,
    and decisions are guarded by the exact rescore + soak regardless."""
    from sushi_tpu.ops.sqdiff import sliding_energy

    rng = np.random.RandomState(3)
    for n in (4096, 6144, 16384):
        win = np.zeros((2, n), np.float32)
        lens = []
        for b in range(2):
            wl = rng.randint(n // 2, n)
            win[b, :wl] = rng.rand(wl)
            lens.append(rng.randint(50, n // 2))
        E = np.asarray(sliding_energy(jnp.asarray(win), jnp.asarray(np.array(lens, np.int32))))
        for b in range(2):
            cumsq = np.concatenate([[0.0], np.cumsum(win[b].astype(np.float64) ** 2)])
            exact = cumsq[np.minimum(np.arange(n) + lens[b], n)] - cumsq[:n]
            err = np.abs(E[b] - exact)
            assert np.all(err <= 8e-6 + 4e-7 * exact), (n, b, err.max())


def test_coarse_scores_accepts_rows_narrower_than_fft_size():
    """Callers may pass rows narrower than fft_size (the FFT pads
    implicitly); the cumsum energy stage must pad the same way instead of
    failing to broadcast against the [B, fft_size] correlation."""
    from sushi_tpu.ops.sqdiff import coarse_scores

    rng = np.random.RandomState(5)
    n, fft_size = 1024, 2048
    pats = np.zeros((2, n), np.float32)
    wins = np.zeros((2, n), np.float32)
    pat_lens = np.array([200, 300], np.int32)
    win_lens = np.array([n, 900], np.int32)
    for b in range(2):
        wins[b, : win_lens[b]] = rng.rand(win_lens[b]).astype(np.float32)
        pats[b, : pat_lens[b]] = rng.rand(pat_lens[b]).astype(np.float32)

    narrow = np.asarray(coarse_scores(
        jnp.asarray(pats), jnp.asarray(pat_lens),
        jnp.asarray(wins), jnp.asarray(win_lens), fft_size,
    ))
    wide = np.asarray(coarse_scores(
        jnp.asarray(np.pad(pats, ((0, 0), (0, fft_size - n)))),
        jnp.asarray(pat_lens),
        jnp.asarray(np.pad(wins, ((0, 0), (0, fft_size - n)))),
        jnp.asarray(win_lens), fft_size,
    ))
    np.testing.assert_allclose(narrow, wide, rtol=0, atol=1e-6)


def test_padded_batch_shapes_bounded_for_any_device_count():
    """Chunk padding must produce at most len(_BATCH_BUCKETS) distinct
    shapes for ANY device count (a per-chunk ceil fallback for counts
    like 3 or 6 would compile a fresh executable per batch size), and on
    one device it must be plain bucket quantization."""
    from sushi_tpu.align.batcher import _BATCH_BUCKETS, _padded_batch

    for devices in (1, 2, 3, 5, 6, 8):
        shapes = {_padded_batch(b, devices) for b in range(1, 129)}
        assert len(shapes) <= len(_BATCH_BUCKETS), (devices, shapes)
        for b in range(1, 129):
            padded = _padded_batch(b, devices)
            assert padded >= b and padded % devices == 0, (devices, b, padded)
    for b, want in ((1, 1), (2, 8), (8, 8), (9, 32), (33, 64), (65, 128), (128, 128)):
        assert _padded_batch(b, 1) == want


def test_packed_correlation_matches_classic():
    """The packed c2c correlation (1 c2c forward + half-length row-local
    inverse) must match the textbook 2-rfft + 1-irfft formulation to FFT
    noise for ANY batch size (the row-local form needs no pairing, so odd
    and single-row batches take it too) — including rows narrower than
    fft_size (implicit zero padding)."""
    from sushi_tpu.ops.sqdiff import _correlate_rows

    rng = np.random.RandomState(11)

    def classic(pats, wins, n):
        return np.asarray(jnp.fft.irfft(
            jnp.fft.rfft(wins, n=n) * jnp.conj(jnp.fft.rfft(pats, n=n)), n=n
        ))

    for batch, rows, n in ((8, 2048, 2048), (6, 1024, 2048), (1, 512, 1024), (5, 512, 512)):
        pats = rng.randn(batch, rows).astype(np.float32)
        wins = rng.randn(batch, rows).astype(np.float32)
        got = np.asarray(_correlate_rows(jnp.asarray(pats), jnp.asarray(wins), n))
        ref = classic(jnp.asarray(pats), jnp.asarray(wins), n)
        assert got.shape == ref.shape == (batch, n)
        scale = max(float(np.max(np.abs(ref))), 1e-9)
        np.testing.assert_allclose(got, ref, rtol=0, atol=5e-5 * scale)


def test_packed_correlation_env_gate(monkeypatch):
    """SUSHI_PACKED_FFT=0 (read once at import into sqdiff._PACKED_FFT —
    the gate is process-start-only by design, so tests patch the constant)
    must pin the classic formulation (bit-exact)."""
    from sushi_tpu.ops import sqdiff as sqdiff_mod
    from sushi_tpu.ops.sqdiff import _correlate_rows

    rng = np.random.RandomState(12)
    pats = jnp.asarray(rng.randn(4, 1024).astype(np.float32))
    wins = jnp.asarray(rng.randn(4, 1024).astype(np.float32))
    monkeypatch.setattr(sqdiff_mod, "_PACKED_FFT", False)
    gated = np.asarray(_correlate_rows(pats, wins, 1024))
    ref = np.asarray(jnp.fft.irfft(
        jnp.fft.rfft(wins, n=1024) * jnp.conj(jnp.fft.rfft(pats, n=1024)), n=1024
    ))
    np.testing.assert_array_equal(gated, ref)


def test_correlation_is_row_local_for_every_path(monkeypatch):
    """A row's correlation must be bit-identical whatever its batch
    NEIGHBORS are — for the packed path and the MXU four-step path.

    This is the batch-invariance contract the round-5 soak enforced the
    hard way (98/100, SOAK_r05.json first record): an earlier packed
    formulation paired two different rows into one inverse transform, so
    a row's rounding depended on its partner — and the speculative-replay
    batch committed different plateau decisions than a sequential drive
    of the same kernel.  Any future formulation that mixes rows will fail
    here before it reaches the chip soak.
    """
    import jax

    from sushi_tpu.ops import mxu_dft
    from sushi_tpu.ops.sqdiff import _correlate_rows

    rng = np.random.RandomState(13)
    n, batch = 1536, 4
    pats = rng.randn(batch, n).astype(np.float32)
    wins = rng.randn(batch, n).astype(np.float32)
    alt_pats = np.concatenate([pats[:1], rng.rand(batch - 1, n).astype(np.float32) * 40.0])
    alt_wins = np.concatenate([wins[:1], rng.rand(batch - 1, n).astype(np.float32) * 40.0])

    # packed path (row-local half-c2r inverse)
    a = np.asarray(_correlate_rows(jnp.asarray(pats), jnp.asarray(wins), n))[0]
    b = np.asarray(_correlate_rows(jnp.asarray(alt_pats), jnp.asarray(alt_wins), n))[0]
    np.testing.assert_array_equal(a, b)

    # MXU four-step path (forced via an explicit plan — plan_for gates it
    # to TPU + large buckets, but the algebra must be row-local everywhere)
    plan = mxu_dft.Plan(128, n // 128, jax.lax.Precision.HIGHEST)
    a = np.asarray(mxu_dft.correlate_packed(jnp.asarray(pats), jnp.asarray(wins), n, plan))[0]
    b = np.asarray(mxu_dft.correlate_packed(jnp.asarray(alt_pats), jnp.asarray(alt_wins), n, plan))[0]
    np.testing.assert_array_equal(a, b)
