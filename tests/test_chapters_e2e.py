"""Chapter-driven grouping end-to-end: two chapters with different shifts,
grouped via an OGM chapters file; plus non-default sample rates and
float32 analysis buffers through the CLI."""

import numpy as np
import pytest

from sushi_tpu.text.subs import SrtScript

from tests.fixtures import shift_audio, synth_episode, write_srt, write_wav_int16
from tests.test_pipeline import run_cli

EVENTS = [(2.0, 3.6), (5.0, 6.4), (8.0, 9.4), (14.0, 15.4), (17.0, 18.4), (20.0, 21.4)]
SHIFT_A, SHIFT_B = 1.5, 2.75
CHAPTER_AT = 11.5


@pytest.fixture(scope="module")
def media(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("ch")
    audio = synth_episode(23.0, EVENTS, seed=41)
    cut = int(CHAPTER_AT * 48000)
    part_a = shift_audio(audio, SHIFT_A)
    part_b = shift_audio(audio, SHIFT_B)
    dst_audio = np.concatenate([part_a[:cut], part_b[cut:]])
    rng = np.random.RandomState(2)
    dst_audio = (dst_audio.astype(np.int32) + rng.randint(-120, 120, len(dst_audio))).astype(np.int16)
    write_wav_int16(str(tmp / "src.wav"), audio)
    write_wav_int16(str(tmp / "dst.wav"), dst_audio)
    write_srt(str(tmp / "in.srt"), [(s, e, "line") for s, e in EVENTS])
    (tmp / "chapters.txt").write_text(
        "CHAPTER01=00:00:00.000\nCHAPTER01NAME=a\nCHAPTER02=00:00:11.500\nCHAPTER02NAME=b\n",
        encoding="utf-8",
    )
    (tmp / "chapters.xml").write_text(
        "<Chapters><EditionEntry>"
        "<ChapterAtom><ChapterTimeStart>00:00:00.000</ChapterTimeStart></ChapterAtom>"
        "<ChapterAtom><ChapterTimeStart>00:00:11.500</ChapterTimeStart></ChapterAtom>"
        "</EditionEntry></Chapters>",
        encoding="utf-8",
    )
    return tmp


def expected_start(start):
    return start + (SHIFT_A if start < CHAPTER_AT else SHIFT_B)


@pytest.mark.parametrize("chapters_file", ["chapters.txt", "chapters.xml"])
def test_chapter_grouping_recovers_both_shifts(media, chapters_file):
    out = str(media / ("out_" + chapters_file + ".srt"))
    run_cli(
        ["--src", str(media / "src.wav"), "--dst", str(media / "dst.wav"),
         "--script", str(media / "in.srt"), "-o", out,
         "--chapters", str(media / chapters_file)]
    )
    result = SrtScript.from_file(out)
    for event, (start, _) in zip(result.events, EVENTS):
        assert event.start == pytest.approx(expected_start(start), abs=2e-3), start


def test_chapters_none_disables(media):
    out = str(media / "out_none.srt")
    run_cli(
        ["--src", str(media / "src.wav"), "--dst", str(media / "dst.wav"),
         "--script", str(media / "in.srt"), "-o", out, "--chapters", "none"]
    )
    result = SrtScript.from_file(out)
    # automatic grouping also recovers both shifts on this clean fixture
    for event, (start, _) in zip(result.events, EVENTS):
        assert event.start == pytest.approx(expected_start(start), abs=2e-3)


def test_nondefault_sample_rate_and_float32(media):
    out = str(media / "out_8k.srt")
    run_cli(
        ["--src", str(media / "src.wav"), "--dst", str(media / "dst.wav"),
         "--script", str(media / "in.srt"), "-o", out,
         "--sample-rate", "8000", "--sample-type", "float32", "--chapters", "none"]
    )
    result = SrtScript.from_file(out)
    for event, (start, _) in zip(result.events, EVENTS):
        assert event.start == pytest.approx(expected_start(start), abs=3e-3)
