from sushi_tpu.text.timefmt import format_ass_time, format_srt_time, parse_hms, parse_srt_time


def test_format_ass_zero():
    assert format_ass_time(0) == "0:00:00.00"


def test_format_ass_65_seconds():
    assert format_ass_time(65) == "0:01:05.00"


def test_format_ass_float_seconds():
    assert format_ass_time(5.559) == "0:00:05.56"


def test_format_ass_hours():
    assert format_ass_time(3600 + 60 * 15 + 35.15) == "1:15:35.15"


def test_format_ass_100ms():
    assert format_ass_time(544.997) == "0:09:05.00"


def test_format_ass_half_centisecond_rounds_up():
    # 0.125 * 100 == 12.5 exactly in binary; Python 2's round gives 13.
    assert format_ass_time(0.125) == "0:00:00.13"


def test_format_srt():
    assert format_srt_time(0) == "00:00:00,000"
    assert format_srt_time(3661.5) == "01:01:01,500"
    assert format_srt_time(59.9995) == "00:01:00,000"


def test_parse_round_trip():
    assert parse_hms("1:02:03.25") == 3723.25
    assert parse_srt_time("01:02:03,250") == 3723.25


def test_negative_half_rounds_away_from_zero():
    # py2 round(-12.5) == -13: negative shifted times at exact halves must
    # match (events shifted before 0 are written as-is, like the reference)
    from sushi_tpu.text.timefmt import _round_half_up

    assert _round_half_up(-12.5) == -13
    assert _round_half_up(12.5) == 13
    assert _round_half_up(-12.4) == -12
    assert _round_half_up(-0.125 * 100) == -13
