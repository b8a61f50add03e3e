import os

import pytest

from sushi_tpu.errors import SushiError
from sushi_tpu.text.subs import AssEvent, AssScript, ScriptEvent, SrtEvent, SrtScript, load_script

SRT_EVENT_TEXT = """1
00:00:01,266 --> 00:00:03,366
Text that *really* matters"""

ASS_EVENT_TEXT = (
    "Dialogue: 0,0:00:01.26,0:00:03.37,Default,,0000,0000,0000,,Text that *really* matters"
)

ASS_SCRIPT_TEXT = """[Script Info]
Title: Test script
ScriptType: v4.00+

[V4+ Styles]
Format: Name, Fontname, Fontsize, PrimaryColour, SecondaryColour, OutlineColour, BackColour, Bold, Italic, Underline, StrikeOut, ScaleX, ScaleY, Spacing, Angle, BorderStyle, Outline, Shadow, Alignment, MarginL, MarginR, MarginV, Encoding
Style: Default,Arial,20,&H00FFFFFF,&H000000FF,&H00000000,&H00000000,0,0,0,0,100,100,0,0,1,2,2,2,10,10,10,1

[Events]
Format: Layer, Start, End, Style, Name, MarginL, MarginR, MarginV, Effect, Text
Dialogue: 0,0:00:01.26,0:00:03.37,Default,,0,0,0,,First line
Comment: 0,0:00:03.37,0:00:05.50,Default,,0,0,0,,A comment
Dialogue: 0,0:00:05.50,0:00:07.00,Default,,0,0,0,,Second line

[Aegisub Project Garbage]
Audio File: whatever.mkv"""

SRT_SCRIPT_TEXT = """1
00:00:01,266 --> 00:00:03,366
First line
with a continuation

2
00:00:05,000 --> 00:00:07,100
Second line"""


def test_srt_event_round_trip():
    event = SrtEvent.from_string(SRT_EVENT_TEXT)
    assert event.source_index == 1
    assert event.start == pytest.approx(1.266)
    assert event.end == pytest.approx(3.366)
    assert event.text == "Text that *really* matters"
    assert str(event) == SRT_EVENT_TEXT


def test_ass_event_round_trip():
    event = AssEvent(ASS_EVENT_TEXT)
    assert event.start == pytest.approx(1.26)
    assert event.end == pytest.approx(3.37)
    assert not event.is_comment
    assert str(event) == ASS_EVENT_TEXT


def test_ass_comment_detection():
    event = AssEvent("Comment: 0,0:00:01.00,0:00:02.00,Default,,0,0,0,,hi")
    assert event.is_comment


def test_srt_script_file_round_trip(tmp_path):
    src = tmp_path / "in.srt"
    src.write_text(SRT_SCRIPT_TEXT, encoding="utf-8")
    script = SrtScript.from_file(str(src))
    assert len(script.events) == 2
    assert script.events[0].text == "First line\nwith a continuation"
    out = tmp_path / "out.srt"
    script.save_to_file(str(out))
    assert out.read_text(encoding="utf-8") == SRT_SCRIPT_TEXT


def test_ass_script_file_round_trip(tmp_path):
    src = tmp_path / "in.ass"
    src.write_text(ASS_SCRIPT_TEXT, encoding="utf-8")
    script = AssScript.from_file(str(src))
    assert len(script.events) == 3
    assert script.events[1].is_comment
    out = tmp_path / "out.ass"
    script.save_to_file(str(out))
    saved = out.read_text(encoding="utf-8-sig")
    assert saved == ASS_SCRIPT_TEXT.replace("\n", os.linesep)


def test_ass_save_restores_source_order(tmp_path):
    src = tmp_path / "in.ass"
    src.write_text(ASS_SCRIPT_TEXT, encoding="utf-8")
    script = AssScript.from_file(str(src))
    script.sort_by_time()
    script.events.reverse()  # scramble; save must re-sort by source_index
    out = tmp_path / "out.ass"
    script.save_to_file(str(out))
    assert out.read_text(encoding="utf-8-sig") == ASS_SCRIPT_TEXT.replace("\n", os.linesep)


def test_invalid_ass_raises(tmp_path):
    bad = tmp_path / "bad.ass"
    bad.write_text("no sections here", encoding="utf-8")
    with pytest.raises(SushiError):
        AssScript.from_file(str(bad))


def test_load_script_dispatch(tmp_path):
    srt = tmp_path / "a.srt"
    srt.write_text(SRT_SCRIPT_TEXT, encoding="utf-8")
    assert isinstance(load_script(str(srt)), SrtScript)
    with pytest.raises(SushiError):
        load_script(str(tmp_path / "a.sub"))


def test_event_link_chain():
    a = ScriptEvent(1, 0.0, 1.0, "a")
    b = ScriptEvent(2, 1.0, 2.0, "b")
    c = ScriptEvent(3, 2.0, 3.0, "c")
    a.set_shift(0.5, 0.25)
    b.link_event(a)
    c.link_event(b)
    assert c.shift == 0.5 and c.diff == 0.25
    assert c.get_link_chain_end() is a
    c.resolve_link()
    assert not c.linked and c.shift == 0.5
    assert b.linked


def test_event_shifted_times_and_apply():
    e = ScriptEvent(1, 10.0, 12.0, "x")
    e.set_shift(1.5, 0.1)
    e.adjust_additional_shifts(-0.25, 0.25)
    assert e.shifted_start == pytest.approx(11.25)
    assert e.shifted_end == pytest.approx(13.75)
    e.apply_shift()
    assert e.start == pytest.approx(11.25)
    assert e.end == pytest.approx(13.75)


def test_srt_crlf_interior_newlines_preserved(tmp_path):
    # the reference reads via codecs.open (no newline translation): interior
    # \r\n of multiline CRLF cues must survive byte-for-byte into the output
    path = str(tmp_path / "crlf.srt")
    raw = b"1\r\n00:00:01,000 --> 00:00:02,000\r\nline one\r\nline two\r\n\r\n2\r\n00:00:03,000 --> 00:00:04,000\r\nsolo\r\n"
    with open(path, "wb") as handle:
        handle.write(raw)
    script = SrtScript.from_file(path)
    assert script.events[0].text == "line one\r\nline two"
    out = str(tmp_path / "out.srt")
    script.save_to_file(out)
    with open(out, "rb") as handle:
        saved = handle.read()
    assert b"line one\r\nline two" in saved
