"""Multi-device sharding tests on the 8-virtual-CPU-device mesh."""

import numpy as np
import pytest

import jax

from sushi_tpu.ops.sqdiff import oracle_match
from sushi_tpu.parallel.sharded_search import (
    chunk_wide_window,
    make_mesh,
    sharded_match_rows,
    wide_window_search,
)


@pytest.fixture(scope="module")
def mesh8():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    return make_mesh((4, 2), ("dp", "sp"))


def test_chunk_wide_window_covers_all_lags():
    spans = chunk_wide_window(window_length=10000, pattern_length=700, num_chunks=4)
    covered = set()
    for offset, length in spans:
        if length:
            for lag in range(offset, offset + length - 700 + 1):
                covered.add(lag)
    assert covered == set(range(10000 - 700 + 1))


def test_chunk_wide_window_tiny_window_empty_tail():
    spans = chunk_wide_window(window_length=20, pattern_length=18, num_chunks=8)
    total = sum(max(0, length - 18 + 1) for _, length in spans if length)
    assert total == 3


def test_wide_window_search_matches_oracle(mesh8):
    rng = np.random.RandomState(11)
    window = rng.rand(50000).astype(np.float32)
    pattern = np.clip(window[31000:32000] + rng.randn(1000).astype(np.float32) * 0.02, 0, 1)
    score, lag = wide_window_search(pattern, window, mesh8, axis="sp")
    oracle_score, oracle_lag = oracle_match(pattern, window)
    assert abs(lag - oracle_lag) <= 1
    assert score == pytest.approx(oracle_score, abs=1e-3)


def test_wide_window_search_full_mesh_rows(mesh8):
    # rows sharded over BOTH axes: 8 requests over ('dp','sp')
    rng = np.random.RandomState(12)
    n = 4096
    windows = rng.rand(8, n).astype(np.float32)
    patterns = np.zeros((8, n), np.float32)
    true_lags = rng.randint(0, 2500, 8)
    for i in range(8):
        patterns[i, :512] = windows[i, true_lags[i] : true_lags[i] + 512]
    pat_lens = np.full(8, 512, np.int32)
    win_lens = np.full(8, n, np.int32)
    scores, lags = sharded_match_rows(
        patterns, pat_lens, windows, win_lens, n, mesh8, ("dp", "sp")
    )
    assert np.array_equal(np.asarray(lags), true_lags)
    assert np.all(np.asarray(scores) < 1e-5)


def test_sharded_alignment_step(mesh8):
    from sushi_tpu.models.aligner import sharded_alignment_step

    step, args = sharded_alignment_step(mesh8, fft_size=2048, rescore_k=8)
    scores, lags = step(*args)
    assert scores.shape == (4,)
    assert float(np.max(np.asarray(scores))) < 1e-3


def test_execute_planned_shards_over_production_mesh():
    """With >1 visible device (the conftest 8-CPU mesh) execute_planned
    must auto-shard chunk rows over the ('dp',) production mesh and still
    return oracle-exact results."""
    import jax.numpy as jnp

    from sushi_tpu.align import batcher
    from sushi_tpu.ops.sqdiff import oracle_match

    mesh = batcher.production_mesh()
    assert mesh is not None and mesh.shape["dp"] >= 2

    rng = np.random.RandomState(7)
    dst_host = rng.rand(40960).astype(np.float32)
    src_host = np.zeros(40960, np.float32)
    planned = []
    for i in range(5):
        pat_len = 300 + 17 * i
        lag = 2000 + 5000 * i
        src_host[i * 4000 : i * 4000 + pat_len] = dst_host[lag : lag + pat_len]
        planned.append(
            batcher.PlannedSearch(
                key=i, pat_start=i * 4000, pat_len=pat_len,
                win_start=max(0, lag - 700), win_len=2500,
                start_time=0.0, sample_rate=12000,
            )
        )
    src_dev = batcher._replicate_on_mesh(jnp.asarray(np.pad(src_host, (0, 8192))))
    dst_dev = batcher._replicate_on_mesh(jnp.asarray(np.pad(dst_host, (0, 8192))))
    results = batcher.execute_planned(src_dev, dst_dev, planned)
    assert batcher._SHARDED_MATCH, "sharded kernel cache empty — mesh path not taken"
    for item in planned:
        _, _, abs_sample = results[item.key]
        pattern = src_host[item.pat_start : item.pat_start + item.pat_len]
        window = dst_host[item.win_start : item.win_start + item.win_len]
        _, oracle_lag = oracle_match(pattern, window)
        assert abs((abs_sample - item.win_start) - oracle_lag) <= 1


def test_wide_window_chunks_shard_over_production_mesh(monkeypatch):
    """The production combination the dryrun's fixture test only
    approximated: ONE oversized request (win_len > _MAX_FFT) driven
    through execute_planned on the multi-device production mesh — its lag
    chunks must ride the sharded kernel's row axis and the host combine
    (batcher.execute_planned_multi's wide_parents merge) must stay
    oracle-exact."""
    import jax.numpy as jnp

    from sushi_tpu.align import batcher
    from sushi_tpu.ops.sqdiff import oracle_match

    monkeypatch.setattr(batcher, "_MAX_FFT", 1 << 13)  # force lag chunking
    mesh = batcher.production_mesh()
    assert mesh is not None and mesh.devices.size >= 2

    rng = np.random.RandomState(19)
    dst_host = rng.rand(60000).astype(np.float32)
    src_host = np.zeros(60000, np.float32)
    pat_len = 500
    lag = 41000  # deep in a late chunk, so the combine must cross chunks
    src_host[1000 : 1000 + pat_len] = dst_host[lag : lag + pat_len]
    item = batcher.PlannedSearch(
        key="wide", pat_start=1000, pat_len=pat_len,
        win_start=0, win_len=50000, start_time=0.0, sample_rate=12000,
    )
    src_dev = batcher._replicate_on_mesh(jnp.asarray(np.pad(src_host, (0, 1 << 14))))
    dst_dev = batcher._replicate_on_mesh(jnp.asarray(np.pad(dst_host, (0, 1 << 14))))
    batcher.TELEMETRY.reset()
    results = batcher.execute_planned(src_dev, dst_dev, [item])
    assert batcher._SHARDED_MATCH, "wide chunks did not take the sharded kernel"
    stats = batcher.TELEMETRY.rounds[-1]
    assert stats.host_fallbacks == 0
    chunk_rows = sum(v[0] for v in stats.buckets.values())
    assert chunk_rows > 1, "window was not lag-chunked"
    padded_rows = sum(v[1] for v in stats.buckets.values())
    assert padded_rows % mesh.devices.size == 0, "chunk rows not device-aligned"

    score, _, abs_sample = results["wide"]
    oracle_score, oracle_lag = oracle_match(src_host[1000 : 1000 + pat_len], dst_host[:50000])
    assert abs(abs_sample - oracle_lag) <= 1
    assert score == pytest.approx(oracle_score, abs=1e-4)


def test_mesh_disabled_by_env(monkeypatch):
    from sushi_tpu.align import batcher

    monkeypatch.setattr(batcher, "_MESH_STATE", [])
    monkeypatch.setenv("SUSHI_MESH", "off")
    assert batcher.production_mesh() is None
    monkeypatch.setattr(batcher, "_MESH_STATE", [])
    monkeypatch.setenv("SUSHI_MESH", "2")
    mesh = batcher.production_mesh()
    assert mesh is not None and mesh.devices.size == 2
    monkeypatch.setattr(batcher, "_MESH_STATE", [])  # leave unprobed for other tests
