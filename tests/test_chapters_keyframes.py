import pytest

from sushi_tpu.errors import SushiError
from sushi_tpu.text import chapters, keyframes

XML_TEXT = """<?xml version="1.0"?>
<Chapters>
  <EditionEntry>
    <ChapterAtom><ChapterTimeStart>00:05:00.123</ChapterTimeStart></ChapterAtom>
    <ChapterAtom><ChapterTimeStart>00:01:00.000</ChapterTimeStart></ChapterAtom>
  </EditionEntry>
</Chapters>"""

OGM_TEXT = """CHAPTER01=00:00:00.000
CHAPTER01NAME=Intro
CHAPTER02=00:04:17.000
CHAPTER02NAME=Part A"""

SCXVID_TEXT = """# XviD 2pass stat file
# comment
# comment
i frame0
p frame1
b frame2
i frame3"""


def test_xml_chapters_sorted_and_zero_prepended():
    times = chapters.parse_xml_start_times(XML_TEXT)
    assert times == [0, 60.0, 300.123]


def test_ogm_chapters():
    times = chapters.parse_ogm_start_times(OGM_TEXT)
    assert times == [0.0, 257.0]


def test_ogm_round_trip():
    formatted = chapters.format_ogm_chapters([0.0, 257.0])
    assert chapters.parse_ogm_start_times(formatted) == [0.0, 257.0]
    assert "CHAPTER01=00:00:00.000" in formatted
    assert formatted.endswith("\n")


def test_scxvid_keyframes_offsets():
    frames = keyframes.parse_scxvid_keyframes(SCXVID_TEXT)
    assert frames == [0, 3]


def test_parse_keyframes_ensures_zero(tmp_path):
    log = tmp_path / "kf.txt"
    log.write_text("# XviD 2pass stat file\nx\nx\nx\nx\ni f\n", encoding="utf-8")
    frames = keyframes.parse_keyframes(str(log))
    assert frames[0] == 0
    assert 2 in frames


def test_parse_keyframes_rejects_unknown(tmp_path):
    log = tmp_path / "kf.txt"
    log.write_text("not a stat file", encoding="utf-8")
    with pytest.raises(SushiError):
        keyframes.parse_keyframes(str(log))
