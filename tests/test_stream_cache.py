"""Analysis-buffer disk memo: round-trip fidelity, invalidation, eviction."""

import os
import time

import numpy as np
import pytest

from sushi_tpu.media import stream_cache
from sushi_tpu.media.stream import AudioStream

from tests.fixtures import synth_episode, write_wav_int16


@pytest.fixture()
def cache_env(tmp_path, monkeypatch):
    directory = str(tmp_path / "stream_cache")
    monkeypatch.setenv("SUSHI_STREAM_CACHE", directory)
    return directory


def _write_episode(tmp_path, name="ep.wav", seed=0, duration=4.0):
    path = str(tmp_path / name)
    write_wav_int16(path, synth_episode(duration, [(1.0, 2.0)], seed=seed))
    return path


def test_cached_load_is_bit_identical(tmp_path, cache_env):
    path = _write_episode(tmp_path)
    fresh = stream_cache.load_stream(path, 12000, "uint8")
    direct = AudioStream(path, 12000, "uint8")
    cached = stream_cache.load_stream(path, 12000, "uint8")

    assert np.array_equal(np.asarray(cached.data), direct.data)
    assert np.array_equal(np.asarray(fresh.data), direct.data)
    assert cached.sample_rate == direct.sample_rate
    assert cached.sample_count == direct.sample_count
    assert cached.padding_size == direct.padding_size
    assert cached.cache_key == fresh.cache_key
    assert os.listdir(cache_env)  # something was actually persisted


def test_key_varies_with_params_and_content(tmp_path, cache_env):
    path = _write_episode(tmp_path)
    k_u8 = stream_cache.stream_key(path, 12000, "uint8")
    k_f32 = stream_cache.stream_key(path, 12000, "float32")
    k_rate = stream_cache.stream_key(path, 6000, "uint8")
    assert len({k_u8, k_f32, k_rate}) == 3

    # rewriting the file (new mtime/size) invalidates the key
    before = stream_cache.stream_key(path, 12000, "uint8")
    time.sleep(0.01)
    write_wav_int16(path, synth_episode(5.0, [(1.0, 2.0)], seed=9))
    after = stream_cache.stream_key(path, 12000, "uint8")
    assert before != after

    # and a cached load of the new content reflects the new audio
    reloaded = stream_cache.load_stream(path, 12000, "uint8")
    direct = AudioStream(path, 12000, "uint8")
    assert np.array_equal(np.asarray(reloaded.data), direct.data)


def test_cache_disabled(tmp_path, monkeypatch):
    monkeypatch.setenv("SUSHI_STREAM_CACHE", "off")
    path = _write_episode(tmp_path)
    stream = stream_cache.load_stream(path, 12000, "uint8")
    assert stream.cache_key is None
    assert stream_cache.cache_dir() is None


def test_eviction_keeps_newest(tmp_path, cache_env, monkeypatch):
    monkeypatch.setattr(stream_cache, "_MAX_ENTRIES", 2)
    paths = [_write_episode(tmp_path, "ep%d.wav" % i, seed=i, duration=2.0) for i in range(4)]
    for i, path in enumerate(paths):
        stream_cache.load_stream(path, 12000, "uint8")
        time.sleep(0.01)  # distinct mtimes for LRU ordering
    kept = [name for name in os.listdir(cache_env) if name.endswith(".npy")]
    assert len(kept) == 2
    newest = stream_cache.stream_key(paths[-1], 12000, "uint8")
    assert any(name.startswith(newest) for name in kept)


def test_load_pair_same_file_loads_once(tmp_path, cache_env):
    path = _write_episode(tmp_path)
    src, dst = stream_cache.load_pair(path, path, 12000, "uint8")
    assert src is dst


def test_load_pair_parallel(tmp_path, cache_env):
    a = _write_episode(tmp_path, "a.wav", seed=1)
    b = _write_episode(tmp_path, "b.wav", seed=2)
    src, dst = stream_cache.load_pair(a, b, 12000, "uint8")
    assert not np.array_equal(np.asarray(src.data), np.asarray(dst.data))
    assert src.cache_key != dst.cache_key


def test_upload_load_pipelines_device_and_defers_write(tmp_path, cache_env):
    """The cold path (upload=True): the buffer reaches the device upload
    memo immediately (so DeviceMatcher construction is a hit), the disk
    write is deferred to the background writer, and once flushed a second
    load is a bit-identical cache hit."""
    from sushi_tpu.align import batcher

    a = _write_episode(tmp_path, "a.wav", seed=3)
    b = _write_episode(tmp_path, "b.wav", seed=4)
    src, dst = stream_cache.load_pair(a, b, 12000, "uint8", upload=True)

    # device residency landed during the load
    with batcher._MEMO_LOCK:
        assert src.cache_key in batcher._UPLOAD_MEMO
        assert dst.cache_key in batcher._UPLOAD_MEMO

    # the deferred disk write lands by the flush barrier at the latest
    stream_cache.flush_writes()
    names = os.listdir(cache_env)
    assert any(name.startswith(src.cache_key) for name in names)
    assert any(name.startswith(dst.cache_key) for name in names)

    cached_src = stream_cache.load_stream(a, 12000, "uint8")
    assert np.array_equal(np.asarray(cached_src.data), np.asarray(src.data))
    assert cached_src.padding_size == src.padding_size
