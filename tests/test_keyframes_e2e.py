"""Keyframe snapping end-to-end through the CLI: src/dst SCXvid logs +
CFR fps; shifted starts must snap onto destination keyframe times."""

import numpy as np
import pytest

from sushi_tpu.text.subs import SrtScript

from tests.fixtures import shift_audio, synth_episode, write_srt, write_wav_int16
from tests.test_pipeline import run_cli

FPS = 24.0
TRUE_SHIFT = 2.505
EVENTS = [(2.0, 3.75), (6.0, 7.5), (10.0, 11.5), (14.0, 15.5)]
KF_NUDGE_FRAMES = 1  # dst keyframes sit one frame after the perfect shift


def write_scxvid_log(path, keyframe_frames, total_frames):
    lines = ["# XviD 2pass stat file", "# version", "#"]
    frames = set(keyframe_frames)
    for frame in range(total_frames):
        lines.append("i 1 2 3" if frame in frames else "p 1 2 3")
    with open(path, "w", encoding="utf-8") as handle:
        handle.write("\n".join(lines))


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("kf")
    audio = synth_episode(18.0, EVENTS, seed=9)
    rng = np.random.RandomState(4)
    dst_audio = shift_audio(audio, TRUE_SHIFT)
    dst_audio = (dst_audio.astype(np.int32) + rng.randint(-150, 150, len(dst_audio))).astype(np.int16)
    write_wav_int16(str(tmp / "src.wav"), audio)
    write_wav_int16(str(tmp / "dst.wav"), dst_audio)
    write_srt(str(tmp / "in.srt"), [(s, e, "line") for s, e in EVENTS])

    # src keyframes exactly on event start frames
    src_frames = [int(round(s * FPS)) for s, _ in EVENTS]
    write_scxvid_log(str(tmp / "src.kf.txt"), src_frames, int(18 * FPS))
    # dst keyframes one frame after each perfectly-shifted start
    dst_frames = [int(round((s + TRUE_SHIFT) * FPS)) + KF_NUDGE_FRAMES for s, _ in EVENTS]
    write_scxvid_log(str(tmp / "dst.kf.txt"), dst_frames, int(25 * FPS))
    return tmp


def test_snapping_moves_starts_onto_dst_keyframes(media):
    out = str(media / "out.srt")
    run_cli(
        [
            "--src", str(media / "src.wav"),
            "--dst", str(media / "dst.wav"),
            "--script", str(media / "in.srt"),
            "-o", out,
            "--src-keyframes", str(media / "src.kf.txt"),
            "--dst-keyframes", str(media / "dst.kf.txt"),
            "--src-fps", str(FPS),
            "--dst-fps", str(FPS),
        ]
    )
    result = SrtScript.from_file(out)
    for event, (start, _) in zip(result.events, EVENTS):
        expected_kf_time = (int(round((start + TRUE_SHIFT) * FPS)) + KF_NUDGE_FRAMES) / FPS
        assert event.start == pytest.approx(expected_kf_time, abs=5e-3), (
            event.start,
            start + TRUE_SHIFT,
        )


def test_kf_mode_shift_only_does_not_snap_edges(media):
    out = str(media / "out_shift.srt")
    run_cli(
        [
            "--src", str(media / "src.wav"),
            "--dst", str(media / "dst.wav"),
            "--script", str(media / "in.srt"),
            "-o", out,
            "--src-keyframes", str(media / "src.kf.txt"),
            "--dst-keyframes", str(media / "dst.kf.txt"),
            "--src-fps", str(FPS),
            "--dst-fps", str(FPS),
            "--kf-mode", "shift",
        ]
    )
    result = SrtScript.from_file(out)
    # whole-group shift correction still applies, so starts land near the
    # keyframes, but per-edge snapping is off: durations stay unchanged
    for event, (start, end) in zip(result.events, EVENTS):
        assert (event.end - event.start) == pytest.approx(end - start, abs=2e-3)


def test_v2_timecodes_match_cfr_run(media, tmp_path):
    # a uniform 24fps v2 timecodes file must reproduce the --fps run
    # byte-for-byte: exercises the v2 parse + timecode-driven frame math
    # end-to-end (reference demux.py:135-207)
    tc_path = str(tmp_path / "tc.v2.txt")
    with open(tc_path, "w", encoding="utf-8") as handle:
        handle.write("# timecode format v2\n")
        for frame in range(int(25 * FPS) + 1):
            handle.write("%.6f\n" % (frame * 1000.0 / FPS))

    base_args = [
        "--src", str(media / "src.wav"),
        "--dst", str(media / "dst.wav"),
        "--script", str(media / "in.srt"),
        "--src-keyframes", str(media / "src.kf.txt"),
        "--dst-keyframes", str(media / "dst.kf.txt"),
    ]
    out_fps = str(tmp_path / "out_fps.srt")
    run_cli(base_args + ["-o", out_fps, "--src-fps", str(FPS), "--dst-fps", str(FPS)])
    out_v2 = str(tmp_path / "out_v2.srt")
    run_cli(base_args + ["-o", out_v2, "--src-timecodes", tc_path, "--dst-timecodes", tc_path])

    with open(out_fps, "rb") as a, open(out_v2, "rb") as b:
        assert a.read() == b.read()
