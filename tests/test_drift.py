"""Large-accumulated-offset sync (BASELINE config 3): the destination gains
a 15-second insertion mid-episode, so the shift jumps beyond the normal
search window and the rewind/escalation machinery (window -> max_window,
index rewind) must recover.

Note: a *continuous* speed-change fixture (true 4.27% PAL stretch) is not
syncable by this algorithm family at all — the waveform desyncs by >1000
samples within a single line, so no sample-aligned SQDIFF match exists;
verified against the float64 sequential oracle, the reference semantics
lock onto pad plateaus exactly like our kernel does.  Real Sushi usage for
PAL<->NTSC is accumulated offsets (different cuts), which this covers.
"""

import numpy as np
import pytest

from sushi_tpu.text.subs import SrtScript

from tests.fixtures import synth_episode, write_srt, write_wav_int16
from tests.test_pipeline import run_cli

BASE_SHIFT = 1.25
JUMP = 15.0  # inserted at 24s, far beyond the normal +-10s window
JUMP_AT = 24.0


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("jump")
    events = [(3.0 + 7.0 * i, 3.0 + 7.0 * i + 2.2) for i in range(10)]
    audio = synth_episode(75.0, events, seed=31)
    rng = np.random.RandomState(6)

    frame_rate = 48000
    cut = int(JUMP_AT * frame_rate)
    insertion = rng.randint(-300, 300, int(JUMP * frame_rate)).astype(np.int16)
    lead = rng.randint(-300, 300, int(BASE_SHIFT * frame_rate)).astype(np.int16)
    dst_audio = np.concatenate([lead, audio[:cut], insertion, audio[cut:]])
    dst_audio = (dst_audio.astype(np.int32) + rng.randint(-120, 120, len(dst_audio))).astype(np.int16)

    write_wav_int16(str(tmp / "src.wav"), audio)
    write_wav_int16(str(tmp / "dst.wav"), dst_audio)
    write_srt(str(tmp / "in.srt"), [(s, e, "line") for s, e in events])
    return tmp, events


def test_jump_recovery_via_window_escalation(media):
    tmp, events = media
    out = str(tmp / "out.srt")
    run_cli(
        ["--src", str(tmp / "src.wav"), "--dst", str(tmp / "dst.wav"),
         "--script", str(tmp / "in.srt"), "-o", out]
    )
    result = SrtScript.from_file(out)
    assert len(result.events) == len(events)
    for event, (start, _) in zip(result.events, events):
        expected = start + BASE_SHIFT + (JUMP if start >= JUMP_AT else 0.0)
        assert event.start == pytest.approx(expected, abs=0.01), (start, expected)


def test_jump_matches_sequential_oracle(media):
    # the escalation/rewind path must stay decision-identical to a
    # sequential oracle run
    from sushi_tpu.media.stream import AudioStream
    from sushi_tpu.align.batcher import calculate_shifts
    from tests.test_search import make_groups, run_sequential_oracle

    tmp, events = media
    src = AudioStream(str(tmp / "src.wav"), 12000, "uint8")
    dst = AudioStream(str(tmp / "dst.wav"), 12000, "uint8")
    sequential = run_sequential_oracle(src, dst, make_groups(events))
    device = calculate_shifts(src, dst, make_groups(events), 10, 30, 5)
    for dev, seq in zip(device, sequential):
        if seq.shift is None:
            assert dev.shift is None
        else:
            assert dev.shift == pytest.approx(seq.shift, abs=1.5 / 12000.0)
