"""End-to-end pipeline runs on synthetic media through the CLI entry."""

import logging
import os

import numpy as np
import pytest

from sushi_tpu.cli import parse_args_and_run
from sushi_tpu.errors import SushiError
from sushi_tpu.text.subs import AssScript, SrtScript

from tests.fixtures import shift_audio, synth_episode, write_ass, write_srt, write_wav_int16

EVENTS = [
    (2.0, 3.8, "First line"),
    (5.0, 6.5, "Second line"),
    (8.2, 9.9, "Third line"),
    (12.0, 13.5, "Fourth line"),
    (15.1, 16.6, "Fifth line"),
    (18.0, 19.4, "Sixth line"),
]
TRUE_SHIFT = 2.505


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("e2e")
    audio = synth_episode(22.0, [(s, e) for s, e, _ in EVENTS], seed=21)
    rng = np.random.RandomState(77)
    dst_audio = shift_audio(audio, TRUE_SHIFT)
    dst_audio = (dst_audio.astype(np.int32) + rng.randint(-150, 150, len(dst_audio))).astype(np.int16)
    src_wav = str(tmp / "src.wav")
    dst_wav = str(tmp / "dst.wav")
    write_wav_int16(src_wav, audio)
    write_wav_int16(dst_wav, dst_audio)
    return tmp, src_wav, dst_wav


def run_cli(args):
    root = logging.getLogger()
    had = list(root.handlers)
    try:
        parse_args_and_run(args)
    finally:
        for handler in root.handlers:
            if handler not in had:
                root.removeHandler(handler)


def test_srt_end_to_end(media):
    tmp, src_wav, dst_wav = media
    script = str(tmp / "in.srt")
    out = str(tmp / "out.srt")
    write_srt(script, EVENTS)

    run_cli(["--src", src_wav, "--dst", dst_wav, "--script", script, "-o", out])

    result = SrtScript.from_file(out)
    assert len(result.events) == len(EVENTS)
    for event, (start, _, text) in zip(result.events, EVENTS):
        assert event.text == text
        assert event.start == pytest.approx(start + TRUE_SHIFT, abs=2e-3)


def test_ass_end_to_end_with_comment(media):
    tmp, src_wav, dst_wav = media
    script = str(tmp / "in.ass")
    out = str(tmp / "out.ass")
    write_ass(script, EVENTS, comments=[2])

    run_cli(["--src", src_wav, "--dst", dst_wav, "--script", script, "-o", out])

    result = AssScript.from_file(out)
    assert len(result.events) == len(EVENTS)
    for event, (start, _, _) in zip(result.events, EVENTS):
        # ASS timestamps are centisecond-precision
        assert event.start == pytest.approx(start + TRUE_SHIFT, abs=6e-3)
    assert result.events[2].is_comment


def test_no_grouping_mode(media):
    tmp, src_wav, dst_wav = media
    script = str(tmp / "in2.srt")
    out = str(tmp / "out2.srt")
    write_srt(script, EVENTS)
    run_cli(["--src", src_wav, "--dst", dst_wav, "--script", script, "-o", out, "--no-grouping"])
    result = SrtScript.from_file(out)
    for event, (start, _, _) in zip(result.events, EVENTS):
        assert event.start == pytest.approx(start + TRUE_SHIFT, abs=2e-3)


# --- CLI contract errors (mirroring the reference's tests/main.py:184-218) ---


def test_unknown_script_type(media, tmp_path):
    tmp, src_wav, dst_wav = media
    bad = str(tmp_path / "s.mkv")
    open(bad, "w").close()
    with pytest.raises(SushiError, match="script"):
        run_cli(["--src", src_wav, "--dst", dst_wav, "--script", bad])


def test_mismatched_output_extension(media, tmp_path):
    tmp, src_wav, dst_wav = media
    script = str(tmp / "in.srt")
    write_srt(script, EVENTS)
    with pytest.raises(SushiError, match="don't match"):
        run_cli(["--src", src_wav, "--dst", dst_wav, "--script", script, "-o", str(tmp_path / "o.ass")])


def test_timecodes_and_fps_conflict(media, tmp_path):
    tmp, src_wav, dst_wav = media
    script = str(tmp / "in.srt")
    tc = str(tmp_path / "tc.txt")
    open(tc, "w").close()
    with pytest.raises(SushiError, match="[Tt]imecodes"):
        run_cli(
            ["--src", src_wav, "--dst", dst_wav, "--script", script,
             "--src-timecodes", tc, "--src-fps", "25"]
        )


def test_missing_source_file(tmp_path):
    with pytest.raises(SushiError, match="Source"):
        run_cli(["--src", str(tmp_path / "none.wav"), "--dst", str(tmp_path / "none2.wav"),
                 "--script", str(tmp_path / "s.srt")])


def test_wav_without_script_fails(media):
    tmp, src_wav, dst_wav = media
    with pytest.raises(SushiError, match="[Ss]cript"):
        run_cli(["--src", src_wav, "--dst", dst_wav])


def test_keyframes_require_both(media):
    tmp, src_wav, dst_wav = media
    script = str(tmp / "in.srt")
    with pytest.raises(SushiError, match="keyframes"):
        run_cli(["--src", src_wav, "--dst", dst_wav, "--script", script, "--src-keyframes", "auto"])


def test_identical_src_dst_zero_shift(media):
    # perfect matches give diff == 0 everywhere; the reference divides by
    # zero in fix_near_borders — we must produce a clean zero-shift script
    tmp, src_wav, _ = media
    script = str(tmp / "in3.srt")
    out = str(tmp / "out3.srt")
    write_srt(script, EVENTS)
    run_cli(["--src", src_wav, "--dst", src_wav, "--script", script, "-o", out])
    result = SrtScript.from_file(out)
    for event, (start, _, _) in zip(result.events, EVENTS):
        assert event.start == pytest.approx(start, abs=1e-3)


def test_float32_sample_type_end_to_end(media):
    # --sample-type float32 (reference sushi.py:769-770, SUPPRESS'd flag):
    # the device path must handle float32-resident streams, not just uint8
    tmp, src_wav, dst_wav = media
    script = str(tmp / "in3.srt")
    out = str(tmp / "out3.srt")
    write_srt(script, EVENTS)
    run_cli([
        "--src", src_wav, "--dst", dst_wav, "--script", script, "-o", out,
        "--sample-type", "float32",
    ])
    result = SrtScript.from_file(out)
    for event, (start, _, _) in zip(result.events, EVENTS):
        assert event.start == pytest.approx(start + TRUE_SHIFT, abs=2e-3)


def test_alternate_sample_rate_end_to_end(media):
    # --sample-rate 24000 (reference sushi.py:772-773): window arithmetic,
    # padding, and kernel shapes must all follow the analysis rate
    tmp, src_wav, dst_wav = media
    script = str(tmp / "in4.srt")
    out = str(tmp / "out4.srt")
    write_srt(script, EVENTS)
    run_cli([
        "--src", src_wav, "--dst", dst_wav, "--script", script, "-o", out,
        "--sample-rate", "24000",
    ])
    result = SrtScript.from_file(out)
    for event, (start, _, _) in zip(result.events, EVENTS):
        assert event.start == pytest.approx(start + TRUE_SHIFT, abs=2e-3)


def test_shift_plot_written(media, tmp_path):
    # --test-shift-plot (SUPPRESS'd, reference sushi.py:767): the 3-stage
    # debug plot must be written when matplotlib is available
    pytest.importorskip("matplotlib")
    tmp, src_wav, dst_wav = media
    script = str(tmp / "in5.srt")
    out = str(tmp / "out5.srt")
    plot = str(tmp_path / "shifts.png")
    write_srt(script, EVENTS)
    run_cli([
        "--src", src_wav, "--dst", dst_wav, "--script", script, "-o", out,
        "--test-shift-plot", plot,
    ])
    import os as _os

    assert _os.path.exists(plot) and _os.path.getsize(plot) > 0
