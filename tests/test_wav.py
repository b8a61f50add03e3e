"""WAV ingest parity tests.

The oracle for the full load path is an independent in-test replica of the
reference pipeline's observable arithmetic (1-second cv2.INTER_NEAREST
chunk resizes, edge padding, 3x-median clip normalize, uint8 quantize),
built directly on cv2/numpy.
"""

import math

import cv2
import numpy as np
import pytest

from sushi_tpu.errors import SushiError
from sushi_tpu.media.resample import nearest_resize, nearest_resize_length
from sushi_tpu.media.riff import WaveReader
from sushi_tpu.media.stream import AudioStream

from tests.fixtures import synth_episode, write_wav_int16, write_wav_int24


def test_wave_reader_header_mono(tmp_path):
    path = str(tmp_path / "a.wav")
    write_wav_int16(path, np.arange(1000, dtype=np.int16), framerate=8000)
    with WaveReader(path) as reader:
        assert reader.framerate == 8000
        assert reader.channels_count == 1
        assert reader.sample_width == 2
        assert reader.frames_count == 1000
        assert np.array_equal(reader.readframes(10), np.arange(10, dtype=np.float32))


def test_wave_reader_stereo_downmix(tmp_path):
    path = str(tmp_path / "st.wav")
    left = np.array([100, 200, -300], np.int16)
    right = np.array([300, -200, 100], np.int16)
    write_wav_int16(path, np.stack([left, right], axis=1), framerate=8000)
    with WaveReader(path) as reader:
        mixed = reader.readframes(3)
    assert np.allclose(mixed, [(100 + 300) / 2, 0.0, -100.0])


def test_wave_reader_24bit_high_bytes(tmp_path):
    # the reference keeps only the two high bytes of 24-bit samples
    path = str(tmp_path / "w24.wav")
    values = np.array([0x123456, -0x123456, 0x7FFFFF, -0x800000], np.int32)
    write_wav_int24(path, values, framerate=8000)
    with WaveReader(path) as reader:
        frames = reader.readframes(4)
    # keeping the two high bytes == arithmetic shift right by 8
    expected = (values >> 8).astype(np.int16).astype(np.float32)
    assert np.array_equal(frames, expected)


def test_wave_reader_rejects_garbage(tmp_path):
    path = tmp_path / "bad.wav"
    path.write_bytes(b"OGGS" + b"\x00" * 64)
    with pytest.raises(SushiError):
        WaveReader(str(path))


def test_wave_reader_skips_extra_chunks(tmp_path):
    # LIST chunk between fmt and data must be skipped
    import struct

    samples = np.arange(16, dtype=np.int16)
    payload = samples.astype("<i2").tobytes()
    fmt = struct.pack("<HHLLHH", 1, 1, 8000, 16000, 2, 16)
    listc = b"LIST" + struct.pack("<I", 5) + b"INFOx"  # odd size -> word pad
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt + listc + b"\x00"
    body += b"data" + struct.pack("<I", len(payload)) + payload
    path = tmp_path / "list.wav"
    path.write_bytes(b"RIFF" + struct.pack("<I", len(body)) + body)
    with WaveReader(str(path)) as reader:
        assert reader.frames_count == 16
        assert np.array_equal(reader.readframes(16), samples.astype(np.float32))


@pytest.mark.parametrize("n,rate", [(48000, 0.25), (44100, 12000.0 / 44100.0), (1000, 0.33), (7, 0.25), (12000, 1.0)])
def test_nearest_resize_matches_cv2(n, rate):
    rng = np.random.RandomState(42)
    chunk = rng.randn(n).astype(np.float32)
    m = nearest_resize_length(n, rate)
    ours = nearest_resize(chunk, m)
    if m == 0:
        assert len(ours) == 0
        return
    theirs = cv2.resize(chunk.reshape(1, n), (m, 1), interpolation=cv2.INTER_NEAREST)[0]
    assert np.array_equal(ours, theirs)


def _oracle_load(path, sample_rate, sample_type):
    """Independent replica of the reference WavStream arithmetic on cv2."""
    with WaveReader(path) as reader:
        total_seconds = reader.frames_count / float(reader.framerate)
        rate = sample_rate / float(reader.framerate)
        sample_count = math.ceil(total_seconds * sample_rate)
        padding = 10 * reader.framerate
        data = np.zeros(int(padding * 2 + sample_count), np.float32)
        seconds = 0
        cursor = padding
        while seconds < total_seconds:
            chunk = reader.readframes(int(reader.framerate))
            new_length = int(round(len(chunk) * rate))
            if rate != 1:
                resized = cv2.resize(chunk.reshape(1, -1), (new_length, 1), interpolation=cv2.INTER_NEAREST)[0]
            else:
                resized = chunk
            data[cursor : cursor + new_length] = resized
            cursor += new_length
            seconds += 1
    data[:padding] = data[padding]
    data[-padding:] = data[-padding - 1]
    max_value = np.median(data[data >= 0]) * 3
    min_value = np.median(data[data <= 0]) * 3
    np.clip(data, min_value, max_value, out=data)
    data -= min_value
    data /= max_value - min_value
    if sample_type == "uint8":
        data *= 255.0
        data += 0.5
        data = data.astype(np.uint8)
    return data


@pytest.mark.parametrize("sample_type", ["uint8", "float32"])
@pytest.mark.parametrize("framerate", [48000, 44100])
def test_audio_stream_matches_oracle(tmp_path, sample_type, framerate):
    path = str(tmp_path / "ep.wav")
    audio = synth_episode(4.7, [(0.5, 1.2), (2.0, 3.1)], framerate=framerate, seed=3)
    write_wav_int16(path, audio, framerate=framerate)

    stream = AudioStream(path, sample_rate=12000, sample_type=sample_type)
    oracle = _oracle_load(path, 12000, sample_type)

    assert stream.data.dtype == oracle.dtype
    assert stream.data.shape == oracle.shape
    assert np.array_equal(stream.data, oracle)


def test_audio_stream_time_arithmetic(tmp_path):
    path = str(tmp_path / "ep.wav")
    write_wav_int16(path, synth_episode(2.0, [(0.5, 1.0)], seed=1), framerate=48000)
    stream = AudioStream(path, sample_rate=12000)
    assert stream.padding_size == 480000
    assert stream.duration_seconds == pytest.approx(2.0)
    assert stream.sample_for_time(0) == stream.padding_size
    assert stream.sample_for_time(-1.0) == stream.padding_size - 12000
    sub = stream.get_substream(0.5, 1.0)
    assert len(sub) == 6000


def test_audio_stream_rejects_bad_sample_type(tmp_path):
    with pytest.raises(SushiError):
        AudioStream("whatever.wav", sample_type="int32")


class TestNativeIngest:
    """Native C++ path must be byte-identical to the pure-Python path."""

    @pytest.fixture(autouse=True)
    def _need_native(self):
        from sushi_tpu.media import native

        if not native.available():
            pytest.skip("native wavio unavailable (no compiler)")

    @pytest.mark.parametrize("framerate", [48000, 44100])
    @pytest.mark.parametrize("sample_type", ["uint8", "float32"])
    def test_native_matches_python(self, tmp_path, framerate, sample_type):
        path = str(tmp_path / "ep.wav")
        audio = synth_episode(4.3, [(0.5, 1.2), (2.0, 3.1)], framerate=framerate, seed=13)
        write_wav_int16(path, np.stack([audio, audio // 2], axis=1), framerate=framerate)
        native_stream = AudioStream(path, 12000, sample_type, use_native=True)
        python_stream = AudioStream(path, 12000, sample_type, use_native=False)
        assert native_stream.data.dtype == python_stream.data.dtype
        assert np.array_equal(native_stream.data, python_stream.data)

    def test_native_24bit_matches_python(self, tmp_path):
        path = str(tmp_path / "w24.wav")
        rng = np.random.RandomState(3)
        samples = rng.randint(-(2**23), 2**23 - 1, 48000 * 2).astype(np.int32)
        write_wav_int24(path, samples, framerate=48000)
        native_stream = AudioStream(path, 12000, "uint8", use_native=True)
        python_stream = AudioStream(path, 12000, "uint8", use_native=False)
        assert np.array_equal(native_stream.data, python_stream.data)

    def test_native_probe(self, tmp_path):
        from sushi_tpu.media import native

        path = str(tmp_path / "p.wav")
        write_wav_int16(path, np.zeros((8000, 2), np.int16), framerate=8000)
        assert native.probe(path) == (8000, 8000, 2, 2)
        assert native.probe(str(tmp_path / "missing.wav")) is None

    def test_native_extensible_float_matches_python(self, tmp_path):
        # both ingest paths must classify the SubFormat GUID identically
        path = str(tmp_path / "ext.wav")
        rng = np.random.RandomState(5)
        samples = (rng.randn(48000 * 2) * 4000).astype(np.float32)
        _write_extensible_wav(path, samples)
        native_stream = AudioStream(path, 12000, "uint8", use_native=True)
        python_stream = AudioStream(path, 12000, "uint8", use_native=False)
        assert np.array_equal(native_stream.data, python_stream.data)



def _write_extensible_wav(path, samples_f32, framerate=48000, sub_tag=0x0003):
    """WAVE_FORMAT_EXTENSIBLE container with a 40-byte fmt chunk whose
    SubFormat GUID carries the effective format (here IEEE float)."""
    import struct

    data = samples_f32.astype("<f4").tobytes()
    guid = struct.pack("<H", sub_tag) + bytes.fromhex("000000000010800000AA00389B71")
    fmt = struct.pack(
        "<HHLLHHHHL", 0xFFFE, 1, framerate, framerate * 4, 4, 32, 22, 32, 0x4
    ) + guid
    with open(path, "wb") as handle:
        payload = b"WAVE" + b"fmt " + struct.pack("<L", len(fmt)) + fmt
        payload += b"data" + struct.pack("<L", len(data)) + data
        handle.write(b"RIFF" + struct.pack("<L", len(payload)) + payload)


def test_wave_reader_extensible_float(tmp_path):
    # an EXTENSIBLE float WAV must decode as float, not int32-reinterpreted
    # noise: the effective format is the SubFormat GUID's first word
    path = str(tmp_path / "ext.wav")
    samples = np.array([0.0, 0.5, -0.25, 1.0], np.float32)
    _write_extensible_wav(path, samples)
    with WaveReader(path) as reader:
        assert reader.sample_width == 4
        decoded = reader.readframes(4)
    np.testing.assert_array_equal(decoded, samples)


def test_wave_reader_extensible_unknown_subformat_rejected(tmp_path):
    path = str(tmp_path / "ext.wav")
    _write_extensible_wav(path, np.zeros(4, np.float32), sub_tag=0x0055)  # mp3
    with pytest.raises(SushiError, match="sub-format"):
        WaveReader(path)
