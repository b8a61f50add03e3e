"""Shift-search driver tests: the state machine, speculative-replay
batching, and device/oracle parity on synthetic episodes."""

import os
import tempfile

import numpy as np
import pytest

from sushi_tpu.align import machine
from sushi_tpu.align.batcher import DeviceMatcher, OracleMatcher, calculate_shifts, groups_to_spans
from sushi_tpu.media.stream import AudioStream
from sushi_tpu.text.subs import ScriptEvent

from tests.fixtures import synth_episode, shift_audio, write_wav_int16

SAMPLE_ERROR = 1.5 / 12000.0  # ±1 sample at the analysis rate (plus float fuzz)


def make_pair(tmp, duration, events, dst_shift, seed=0, dst_noise=150, corrupt=()):
    """Write a src episode and a dst = src shifted by ``dst_shift`` with
    independent noise; optionally corrupt given (start, end) dst spans."""
    audio = synth_episode(duration, events, seed=seed)
    rng = np.random.RandomState(seed + 100)
    dst_audio = shift_audio(audio, dst_shift)
    dst_audio = (dst_audio.astype(np.int32) + rng.randint(-dst_noise, dst_noise, len(dst_audio))).astype(np.int16)
    for (start, end) in corrupt:
        a = int((start + dst_shift) * 48000)
        b = int((end + dst_shift) * 48000)
        dst_audio[a:b] = rng.randint(-9000, 9000, b - a)
    src_path = os.path.join(tmp, "src.wav")
    dst_path = os.path.join(tmp, "dst.wav")
    write_wav_int16(src_path, audio)
    write_wav_int16(dst_path, dst_audio)
    src = AudioStream(src_path, 12000, "uint8")
    dst = AudioStream(dst_path, 12000, "uint8")
    return src, dst


def make_groups(events):
    return [[ScriptEvent(i + 1, s, e, "line")] for i, (s, e) in enumerate(events)]


def run_sequential_oracle(src, dst, groups_events, **params):
    """Plain sequential state-machine run on the float64 oracle."""
    spans = groups_to_spans(groups_events, src)
    matcher = OracleMatcher(src, dst, spans)
    return machine.run_search(
        spans,
        dst.duration_seconds,
        dst.sample_rate,
        lambda request: matcher.find(request)[:2],
        params.get("normal_window", 10),
        params.get("max_window", 30),
        params.get("rewind_thresh", 5),
    )


EVENTS = [(2.0, 3.8), (5.0, 6.5), (8.2, 9.9), (12.0, 13.5), (15.1, 16.6), (18.0, 19.4)]


class TestConstantShift:
    @pytest.fixture(scope="class")
    def pair(self, tmp_path_factory):
        tmp = str(tmp_path_factory.mktemp("pair"))
        return make_pair(tmp, 22.0, EVENTS, dst_shift=3.417, seed=1)

    def test_batched_oracle_equals_sequential(self, pair):
        src, dst = pair
        groups = make_groups(EVENTS)
        sequential = run_sequential_oracle(src, dst, groups)

        groups2 = make_groups(EVENTS)
        spans = groups_to_spans(groups2, src)
        batched = calculate_shifts(src, dst, groups2, 10, 30, 5, matcher=OracleMatcher(src, dst, spans))

        assert [r.shift for r in batched] == [r.shift for r in sequential]
        assert [r.diff for r in batched] == [r.diff for r in sequential]

    def test_device_matches_sequential_oracle(self, pair):
        src, dst = pair
        sequential = run_sequential_oracle(src, dst, make_groups(EVENTS))
        groups = make_groups(EVENTS)
        device = calculate_shifts(src, dst, groups, 10, 30, 5)
        for dev, seq in zip(device, sequential):
            assert dev.shift == pytest.approx(seq.shift, abs=SAMPLE_ERROR)

    def test_recovers_true_shift_and_sets_events(self, pair):
        src, dst = pair
        groups = make_groups(EVENTS)
        results = calculate_shifts(src, dst, groups, 10, 30, 5)
        for result, group in zip(results, groups):
            assert result.shift == pytest.approx(3.417, abs=2e-3)
            assert group[0].shift == result.shift


def test_shift_change_mid_episode(tmp_path):
    # first half shifted by 2.0s, second half by 3.2s (a chapter jump):
    # splice two shifted copies of the dst audio
    events = [(2.0, 3.6), (5.0, 6.4), (8.0, 9.4), (14.0, 15.4), (17.0, 18.4), (20.0, 21.4)]
    audio = synth_episode(23.0, events, seed=7)
    # same dst timeline: t < 11.5s carries src(t-2.0), later src(t-3.2)
    cut = int(11.5 * 48000)
    shifted_a = shift_audio(audio, 2.0)
    shifted_b = shift_audio(audio, 3.2)
    dst_audio = np.concatenate([shifted_a[:cut], shifted_b[cut : len(shifted_a)]])
    write_wav_int16(str(tmp_path / "src.wav"), audio)
    write_wav_int16(str(tmp_path / "dst.wav"), dst_audio)
    src = AudioStream(str(tmp_path / "src.wav"), 12000, "uint8")
    dst = AudioStream(str(tmp_path / "dst.wav"), 12000, "uint8")

    sequential = run_sequential_oracle(src, dst, make_groups(events))
    groups = make_groups(events)
    device = calculate_shifts(src, dst, groups, 10, 30, 5)

    for dev, seq in zip(device, sequential):
        assert dev.shift == pytest.approx(seq.shift, abs=SAMPLE_ERROR)
    for dev, (start, _) in zip(device, events):
        truth = 2.0 if start < 11.5 else 3.2
        assert dev.shift == pytest.approx(truth, abs=2e-3)


def test_predictor_ignores_garbage_observations(tmp_path):
    """A high-score result is a noise argmin (probe searched at a wrong
    center), not evidence of where the pattern lives — recording it used
    to poison the forward delta propagation and stretch pathological
    episodes to ~1 healed group per device round.  Gated observations
    keep the prediction at the inherited delta until a trusted (low
    score) result arrives; a trusted one updates it exactly."""
    from sushi_tpu.align.batcher import PatternTable, ReplayPredictor
    from sushi_tpu.align.machine import FULL, SearchRequest

    src, dst = make_pair(str(tmp_path), 22.0, EVENTS, dst_shift=2.0, seed=3)
    spans = groups_to_spans(make_groups(EVENTS), src)
    delta0 = int(2.0 * dst.sample_rate)
    predictor = ReplayPredictor(spans, dst, PatternTable(spans), delta0)
    request = SearchRequest(0, FULL, EVENTS[0][0] + 2.0, 10)

    predictor.refresh()
    baseline = predictor.predict(request)

    # garbage: plausible-looking sample, implausible score -> ignored
    predictor.observe(request, spans[0].pat_start + delta0 + 7777, score=0.93)
    predictor.refresh()
    assert predictor.predict(request) == baseline

    # trusted: low score -> the delta updates and shifts the prediction
    predictor.observe(request, spans[0].pat_start + delta0 + 7777, score=0.002)
    predictor.refresh()
    shifted = predictor.predict(request)
    assert shifted != baseline
    assert shifted[2] == baseline[2] + 7777


def test_out_of_range_groups_link_back(tmp_path):
    # dst audio ends at 9s; later groups cannot be searched
    events = [(2.0, 3.6), (5.0, 6.4), (30.0, 31.4), (33.0, 34.4)]
    audio = synth_episode(35.0, events, seed=3)
    write_wav_int16(str(tmp_path / "src.wav"), audio)
    write_wav_int16(str(tmp_path / "dst.wav"), audio[: int(9.0 * 48000)])
    src = AudioStream(str(tmp_path / "src.wav"), 12000, "uint8")
    dst = AudioStream(str(tmp_path / "dst.wav"), 12000, "uint8")

    groups = make_groups(events)
    results = calculate_shifts(src, dst, groups, 10, 30, 5)
    assert results[0].shift is not None
    assert results[2].shift is None and results[3].shift is None
    # events of failed groups link to the last searchable group's event
    assert groups[2][0].linked and groups[3][0].linked
    assert groups[2][0].shift == groups[1][0].shift


def test_corrupted_segment_parity(tmp_path):
    # a span of dst audio destroyed -> split-half verification must reject
    # those groups; parity with the sequential oracle is the contract
    events = [(2.0, 3.6), (5.0, 6.4), (8.0, 9.4), (11.0, 12.4), (14.0, 15.4), (17.0, 18.4)]
    src, dst = make_pair(
        str(tmp_path), 20.0, events, dst_shift=1.25, seed=5, corrupt=[(7.5, 13.0)]
    )
    sequential = run_sequential_oracle(src, dst, make_groups(events))
    groups = make_groups(events)
    device = calculate_shifts(src, dst, groups, 10, 30, 5)
    for dev, seq in zip(device, sequential):
        if seq.shift is None:
            assert dev.shift is None
        else:
            assert dev.shift == pytest.approx(seq.shift, abs=SAMPLE_ERROR)
    # the clean groups still recover the true shift
    assert device[0].shift == pytest.approx(1.25, abs=2e-3)
    assert device[-1].shift == pytest.approx(1.25, abs=2e-3)


def test_oversized_pattern_falls_back_to_host(tmp_path, monkeypatch):
    # a group whose PATTERN exceeds any usable chunk must route through the
    # host oracle fallback (cap shrunk so the fixture stays small)
    import sushi_tpu.align.batcher as batcher_mod

    monkeypatch.setattr(batcher_mod, "_MAX_FFT", 1 << 18)  # ~21s at 12kHz
    events = [(1.0, 25.0), (27.0, 28.5)]
    src, dst = make_pair(str(tmp_path), 30.0, [(2.0, 3.5), (15.0, 16.5), (27.0, 28.5)],
                         dst_shift=0.75, seed=12)
    groups = make_groups(events)
    batcher_mod.TELEMETRY.reset()
    results = calculate_shifts(src, dst, groups, 10, 30, 5)
    assert results[0].shift == pytest.approx(0.75, abs=2e-3)  # 24s pattern via host
    assert results[1].shift == pytest.approx(0.75, abs=2e-3)  # small group via device
    assert sum(r.host_fallbacks for r in batcher_mod.TELEMETRY.rounds) > 0


def test_wide_window_lag_chunked_on_device(tmp_path, monkeypatch):
    # a normal pattern with a window exceeding the FFT cap must be
    # lag-chunked into device sub-searches (NOT the host fallback) and
    # still make the exact decisions of the sequential oracle
    import sushi_tpu.align.batcher as batcher_mod

    monkeypatch.setattr(batcher_mod, "_MAX_FFT", 1 << 16)  # ~5.4s at 12kHz
    events = [(2.0, 3.6), (6.0, 7.4), (10.0, 11.2), (14.0, 15.3)]
    src, dst = make_pair(str(tmp_path), 18.0, events, dst_shift=2.25, seed=8)

    sequential = run_sequential_oracle(src, dst, make_groups(events))
    groups = make_groups(events)
    batcher_mod.TELEMETRY.reset()
    device = calculate_shifts(src, dst, groups, 10, 30, 5)

    assert sum(r.host_fallbacks for r in batcher_mod.TELEMETRY.rounds) == 0
    # the 10s verified-search windows (>2^16 samples) really were chunked
    assert any(
        len(r.buckets) > 0 and r.requests > 0 for r in batcher_mod.TELEMETRY.rounds
    )
    for dev, seq in zip(device, sequential):
        assert dev.shift == pytest.approx(seq.shift, abs=SAMPLE_ERROR)
    for dev in device:
        assert dev.shift == pytest.approx(2.25, abs=2e-3)


def test_plan_wide_chunks_covers_all_lags():
    from sushi_tpu.align.batcher import PlannedSearch, plan_wide_chunks

    item = PlannedSearch(
        key="parent", pat_start=100, pat_len=18000, win_start=5000,
        win_len=300000, start_time=-3.0, sample_rate=12000,
    )
    subs = plan_wide_chunks(item, max_fft=1 << 16)
    assert subs is not None and len(subs) > 1
    total_lags = item.win_len - item.pat_len + 1
    covered = set()
    for sub in subs:
        assert sub.win_len <= 1 << 16
        assert sub.pat_start == item.pat_start and sub.pat_len == item.pat_len
        offset = sub.win_start - item.win_start
        covered.update(range(offset, offset + sub.win_len - sub.pat_len + 1))
    assert covered == set(range(total_lags))

    # pattern too large for any chunk -> caller must fall back
    giant = PlannedSearch(
        key="giant", pat_start=0, pat_len=(1 << 16), win_start=0,
        win_len=1 << 18, start_time=0.0, sample_rate=12000,
    )
    assert plan_wide_chunks(giant, max_fft=1 << 16) is None


def test_window_clamps_to_buffer_at_destination_tail(tmp_path):
    # The reference slices a NumPy array (wav.py:184), which clamps the
    # window end to the real buffer.  With framerate == sample_rate the
    # padding (10*framerate) exactly cancels the +10s end-time clip, so any
    # tail search would otherwise gather pat_len fabricated zeros past the
    # buffer and admit phantom lags the reference never sees.
    from sushi_tpu.align.batcher import window_bounds
    from sushi_tpu.align.machine import FULL, SearchRequest

    events = [(2.0, 3.5), (9.0, 10.5), (16.0, 17.5)]
    audio = synth_episode(19.0, events, seed=21, framerate=12000)
    write_wav_int16(str(tmp_path / "src.wav"), audio, framerate=12000)
    # destination truncated: ends right after the last event
    write_wav_int16(str(tmp_path / "dst.wav"), audio[: int(18.0 * 12000)], framerate=12000)
    src = AudioStream(str(tmp_path / "src.wav"), 12000, "uint8")
    dst = AudioStream(str(tmp_path / "dst.wav"), 12000, "uint8")

    # direct contract: a tail window never extends past the buffer
    request = SearchRequest(group_idx=2, part=FULL, center=18.0, window=10.0)
    pat_len = int(1.5 * 12000)
    win_start, win_len, _ = window_bounds(dst, request, pat_len)
    assert win_start + win_len == len(dst.data)  # clamped, not fabricated

    sequential = run_sequential_oracle(src, dst, make_groups(events))
    groups = make_groups(events)
    device = calculate_shifts(src, dst, groups, 10, 30, 5)
    for dev, seq in zip(device, sequential):
        if seq.shift is None:
            assert dev.shift is None
        else:
            assert dev.shift == pytest.approx(seq.shift, abs=SAMPLE_ERROR)


def test_empty_script_raises(tmp_path):
    from sushi_tpu.errors import SushiError
    from tests.test_pipeline import run_cli
    from tests.fixtures import synth_episode, write_wav_int16

    audio = synth_episode(5.0, [(1.0, 2.0)], seed=1)
    write_wav_int16(str(tmp_path / "a.wav"), audio)
    (tmp_path / "empty.srt").write_text("", encoding="utf-8")
    with pytest.raises(SushiError, match="no events"):
        run_cli(["--src", str(tmp_path / "a.wav"), "--dst", str(tmp_path / "a.wav"),
                 "--script", str(tmp_path / "empty.srt")])


def test_device_alignment_seed_matches_host(tmp_path):
    """The coarse-to-fine device seed pins the same whole-stream offset as
    the host pooled-FFT + oracle-refine estimate.

    Uses broadband noise audio: its autocorrelation is a delta, so the
    pooled peak is unambiguous on both paths (the sparse synth episodes
    have near-flat whole-stream envelopes where coarse peaks are genuine
    ties and the two estimates may legitimately land pools apart)."""
    from sushi_tpu.align import batcher

    rng = np.random.RandomState(11)
    audio = (rng.randn(22 * 48000) * 6000).astype(np.int16)
    dst_audio = shift_audio(audio, 3.417)
    src_path = os.path.join(str(tmp_path), "src.wav")
    dst_path = os.path.join(str(tmp_path), "dst.wav")
    write_wav_int16(src_path, audio)
    write_wav_int16(dst_path, dst_audio)
    src = AudioStream(src_path, 12000, "uint8")
    dst = AudioStream(dst_path, 12000, "uint8")

    host = batcher.global_alignment_estimate(src.data, dst.data)
    matcher = DeviceMatcher(src, dst, groups_to_spans(make_groups(EVENTS), src))
    device = matcher.global_alignment_estimate()
    assert abs(device - host) <= 1
    assert abs(device - round(3.417 * 12000)) <= 1


def test_alignment_seed_disk_memo(tmp_path, monkeypatch):
    from sushi_tpu.media import stream_cache

    monkeypatch.setenv("SUSHI_STREAM_CACHE", str(tmp_path / "cache"))
    assert stream_cache.load_alignment_seed("aaa", "bbb") is None
    stream_cache.store_alignment_seed("aaa", "bbb", -41004)
    assert stream_cache.load_alignment_seed("aaa", "bbb") == -41004
    # a matcher with keyed streams must hit the memo instead of the device
    from sushi_tpu.align import batcher

    src, dst = make_pair(str(tmp_path), 22.0, EVENTS, dst_shift=1.0, seed=6)
    src.cache_key, dst.cache_key = "aaa", "bbb"
    batcher._DELTA0_MEMO.clear()
    matcher = DeviceMatcher(src, dst, groups_to_spans(make_groups(EVENTS), src))
    assert matcher.global_alignment_estimate() == -41004


def test_fft_bucket_admits_3smooth(monkeypatch):
    from sushi_tpu.align import batcher

    # 2^k and 3*2^(k-1) sizes, ascending
    assert batcher._fft_bucket(1) == batcher._MIN_FFT
    assert batcher._fft_bucket(4096) == 4096
    assert batcher._fft_bucket(4097) == 6144
    assert batcher._fft_bucket(6144) == 6144
    assert batcher._fft_bucket(6145) == 8192
    assert batcher._fft_bucket(70000) == 98304
    assert batcher._fft_bucket(100000) == 131072
    # every admitted size keeps the kernel's 128-lane block reshape legal
    for probe in range(1, 1 << 20, 4093):
        assert batcher._fft_bucket(probe) % 128 == 0
        assert batcher._fft_bucket(probe) >= min(probe, batcher._MAX_FFT)
    # respects a (test-shrunk) cap read at call time
    monkeypatch.setattr(batcher, "_MAX_FFT", 1 << 14)
    assert batcher._fft_bucket(1 << 20) == 1 << 14


def test_join_packed_matches_concat():
    import jax.numpy as jnp
    from sushi_tpu.ops import sqdiff

    a = jnp.arange(8, dtype=jnp.float32).reshape(2, 4)
    b = jnp.arange(6, dtype=jnp.float32).reshape(2, 3) + 100
    joined = np.asarray(sqdiff.join_packed(a, b))
    np.testing.assert_array_equal(joined, np.concatenate([np.asarray(a), np.asarray(b)], axis=1))


def test_upload_memo_eviction_thread_safe(monkeypatch):
    # season ingest threads hammer the memo concurrently; lockless eviction
    # raced (two threads popping the same key -> KeyError)
    from concurrent.futures import ThreadPoolExecutor

    from sushi_tpu.align import batcher

    monkeypatch.setattr(batcher, "_UPLOAD_MEMO_MAX", 4)
    monkeypatch.setattr(batcher, "_UPLOAD_MEMO", {})

    class FakeStream:
        def __init__(self, key):
            self.cache_key = key
            self.data = np.zeros(16, np.uint8)

    def hammer(worker):
        for i in range(60):
            batcher.upload_stream(FakeStream(f"w{worker}-k{i}"))

    with ThreadPoolExecutor(max_workers=8) as pool:
        for future in [pool.submit(hammer, w) for w in range(8)]:
            future.result()  # raises if any eviction raced
    assert len(batcher._UPLOAD_MEMO) <= 4


def test_exact_tie_plateau_first_lag_through_batched_driver():
    """VERDICT r2 #7: an exact-tie plateau wider than rescore_k*128 lags,
    driven through the production batched path (execute_planned: bucketed
    fft, padded batch rows, packed fetch) — the winning lag must be cv2's
    FIRST minimal lag, not an arbitrary plateau block's winner."""
    import cv2
    import jax.numpy as jnp

    from sushi_tpu.align.batcher import PlannedSearch, execute_planned

    rng = np.random.RandomState(11)
    pat_len, win_len = 512, 8000
    plateau_start = 2000
    dst = np.zeros(32768, np.float32)
    dst[:plateau_start] = np.where(np.arange(plateau_start) % 2 == 0, 0.1, 0.9)
    dst[plateau_start:12000] = 0.5
    src = np.zeros(16384, np.float32)
    src[:pat_len] = 0.5

    planned = [
        PlannedSearch(key="plateau", pat_start=0, pat_len=pat_len, win_start=0,
                      win_len=win_len, start_time=0.0, sample_rate=12000)
    ]
    # filler rows with unrelated content so the chunk really is a padded
    # mixed batch (batch bucket 8), not a single-row special case
    src[1000:1600] = rng.rand(600).astype(np.float32)
    for i in range(5):
        planned.append(
            PlannedSearch(key=f"filler{i}", pat_start=1000 + i * 7, pat_len=400,
                          win_start=8000 + i * 13, win_len=6000,
                          start_time=0.0, sample_rate=12000)
        )
    dst[12000:24000] = rng.rand(12000).astype(np.float32)

    results = execute_planned(jnp.asarray(src), jnp.asarray(dst), planned)

    scores = cv2.matchTemplate(
        dst[:win_len].reshape(1, -1), src[:pat_len].reshape(1, -1), cv2.TM_SQDIFF_NORMED
    )[0]
    c_lag = int(scores.argmin())
    assert c_lag == plateau_start  # fixture sanity: cv2's first minimum
    plateau_width = (win_len - pat_len + 1) - plateau_start
    assert plateau_width > 16 * 128  # wider than every blockwise candidate

    score, found_time, abs_sample = results["plateau"]
    assert abs_sample == c_lag
    assert score == pytest.approx(float(scores[c_lag]), abs=1e-5)


def test_malformed_coarse_pool_env_is_ignored(monkeypatch, caplog):
    """A SUSHI_COARSE_POOL that doesn't evenly pool a bucket (pool=7 on a
    98304 bucket) must fall back to full rate with a warning, not crash
    the sync at trace time; a valid pool still passes its gates."""
    import logging
    from sushi_tpu.align import batcher

    monkeypatch.setattr(batcher, "_COARSE_POOL_ENV", 7)
    monkeypatch.setattr(batcher, "_COARSE_POOL_WARNED", set())
    with caplog.at_level(logging.WARNING, logger="sushi_tpu"):
        assert batcher._coarse_pool_for(98304, 60000) is None
        assert batcher._coarse_pool_for(98304, 60000) is None  # warn once
    assert sum("does not evenly pool" in r.message for r in caplog.records) == 1

    monkeypatch.setattr(batcher, "_COARSE_POOL_ENV", 8)
    assert batcher._coarse_pool_for(98304, 60000) == 8
    assert batcher._coarse_pool_for(8192, 60000) is None  # below MIN_FFT


def test_coarse_pooling_stays_opt_in(monkeypatch):
    """Pooling must NEVER engage without SUSHI_COARSE_POOL.  Two default-on
    trials at the wide buckets were measured and reverted: round 4 without
    a gate (tools/soak.py caught garbage-span divergence), round 5 WITH
    the score gate (the gate catches garbage rows, but clean-audio
    aliasing mislocalizes pooled picks by ~20-66 ms at TRUSTED scores —
    score-invisible, so no threshold fixes it; see the policy block at
    batcher._coarse_pool_for).  This pins the reject."""
    from sushi_tpu.align import batcher

    monkeypatch.setattr(batcher, "_COARSE_POOL_ENV", 0)  # unset default
    for fft_size in (98304, 131072, 262144, 1 << 19, 786432, 1 << 20):
        assert batcher._coarse_pool_for(fft_size, 60000) is None
    monkeypatch.setattr(batcher, "_COARSE_POOL_ENV", 4)  # explicit opt-in
    assert batcher._coarse_pool_for(1 << 19, 30000) == 4
    assert batcher._coarse_pool_for(1 << 19, 200) is None  # short pattern


def test_pool_gate_reruns_untrusted_rows_full_rate(monkeypatch):
    """The score gate end-to-end at a wide bucket under the OPT-IN pooled
    mode: a planted pattern is trusted (no re-run; pooled speed), a
    garbage row (no real match anywhere in its window) fails the trust
    threshold and must re-run full-rate so its (score, lag) exactly equal
    the float64 oracle's — the reference's noise-argmin on garbage is NOT
    pooled-recoverable, which is why the gate hardens the opt-in mode
    (it could not rescue a pooled DEFAULT: clean-audio aliasing
    mislocalizes at trusted scores, see test_coarse_pooling_stays_opt_in)."""
    import jax.numpy as jnp

    from sushi_tpu.align import batcher
    from sushi_tpu.align.batcher import TELEMETRY, PlannedSearch, execute_planned
    from sushi_tpu.ops import sqdiff

    monkeypatch.setattr(batcher, "_COARSE_POOL_ENV", 4)

    rng = np.random.RandomState(21)
    win_len = 200000  # buckets to fft 262144 >= _POOL_GATE_MIN_FFT
    pat_len = 30000
    # zero-mean noise: unrelated rows score ~1.0 (a shared DC offset would
    # drag random-vs-random normalized SSD toward 0.5, muddying the gate)
    src = rng.randn(300000).astype(np.float32)
    dst = rng.randn(400000).astype(np.float32)  # garbage: unrelated noise
    # plant row "hit"'s pattern mid-window so pooled coarse can trust it
    dst[50000 : 50000 + pat_len] = src[:pat_len]

    planned = [
        PlannedSearch(key="hit", pat_start=0, pat_len=pat_len, win_start=0,
                      win_len=win_len, start_time=0.0, sample_rate=12000),
        PlannedSearch(key="garbage", pat_start=40000, pat_len=pat_len,
                      win_start=100000, win_len=win_len,
                      start_time=0.0, sample_rate=12000),
    ]
    assert batcher._coarse_pool_for(262144, pat_len) is not None  # fixture sanity

    TELEMETRY.reset()
    results = execute_planned(jnp.asarray(src), jnp.asarray(dst), planned)
    summary = TELEMETRY.summary()

    for key, item in (("hit", planned[0]), ("garbage", planned[1])):
        want_score, want_lag = sqdiff.oracle_match(
            src[item.pat_start : item.pat_start + item.pat_len],
            dst[item.win_start : item.win_start + item.win_len],
        )
        score, _, abs_sample = results[key]
        assert abs_sample - item.win_start == want_lag, key
        assert score == pytest.approx(want_score, abs=1e-5), key
    assert results["hit"][0] < batcher._POOL_GATE_TRUST  # trusted as planted
    assert results["garbage"][0] >= batcher._POOL_GATE_TRUST
    assert summary["pool_gate_retries"] == 1  # only the garbage row re-ran
    assert summary["rounds"] == 2  # the main round + the gate mini-round


def test_pool_gate_kill_switch_skips_retry(monkeypatch):
    """SUSHI_POOL_GATE=0 (module constant ``_POOL_GATE``, process-start
    semantics like every kernel gate) must SKIP the score-gate mini-round
    entirely: one device round, zero retries, and the garbage row keeps
    its pooled (possibly mislocalized) result — the documented contract
    for reproducing pre-gate behavior under opt-in pooling."""
    import jax.numpy as jnp

    from sushi_tpu.align import batcher
    from sushi_tpu.align.batcher import TELEMETRY, PlannedSearch, execute_planned

    monkeypatch.setattr(batcher, "_COARSE_POOL_ENV", 4)
    monkeypatch.setattr(batcher, "_POOL_GATE", False)

    rng = np.random.RandomState(21)
    win_len = 200000
    pat_len = 30000
    src = rng.randn(300000).astype(np.float32)
    dst = rng.randn(400000).astype(np.float32)  # garbage: unrelated noise

    planned = [
        PlannedSearch(key="garbage", pat_start=40000, pat_len=pat_len,
                      win_start=100000, win_len=win_len,
                      start_time=0.0, sample_rate=12000),
    ]
    TELEMETRY.reset()
    results = execute_planned(jnp.asarray(src), jnp.asarray(dst), planned)
    summary = TELEMETRY.summary()
    assert results["garbage"][0] >= batcher._POOL_GATE_TRUST  # untrusted...
    assert summary["pool_gate_retries"] == 0  # ...but the gate is off
    assert summary["rounds"] == 1
