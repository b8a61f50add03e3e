import pytest

from sushi_tpu.errors import SushiError
from sushi_tpu.media.timecodes import CfrTimecodes, Timecodes

V1_TEXT = """# timecode format v1
Assume 23.976024
0,29,29.970030
1000,1001,59.940060"""

V2_TEXT = "# timecode format v2\n" + "\n".join(
    str(x) for x in (0.0, 41.708, 83.417, 125.125, 166.833)
)


class TestCfr:
    tc = CfrTimecodes(23.976024)

    def test_frame_time(self):
        assert self.tc.get_frame_time(0) == 0
        assert self.tc.get_frame_time(24) == pytest.approx(1.001, abs=1e-6)

    def test_frame_number(self):
        assert self.tc.get_frame_number(0.0) == 0
        assert self.tc.get_frame_number(1.0009) == 23
        assert self.tc.get_frame_number(1.0011) == 24

    def test_frame_size(self):
        assert self.tc.get_frame_size(123.456) == pytest.approx(1.0 / 23.976024)


class TestV2:
    tc = Timecodes.parse(V2_TEXT)

    def test_frame_time_inside(self):
        assert self.tc.get_frame_time(2) == pytest.approx(0.083417)

    def test_frame_time_past_end_clamps(self):
        assert self.tc.get_frame_time(1000) == pytest.approx(0.166833)

    def test_frame_number(self):
        assert self.tc.get_frame_number(0.08) == 2

    def test_frame_size(self):
        # bisect_left lands on frame 2; size = t3 - t2
        assert self.tc.get_frame_size(0.05) == pytest.approx(0.125125 - 0.083417, abs=1e-9)


class TestV1:
    tc = Timecodes.parse(V1_TEXT)

    def test_first_override_block_faster(self):
        # frames 0..29 run at 29.97 fps
        assert self.tc.get_frame_time(1) == pytest.approx(1 / 29.970030, abs=1e-6)

    def test_default_fps_after_block(self):
        t30 = self.tc.get_frame_time(30)
        t31 = self.tc.get_frame_time(31)
        assert (t31 - t30) == pytest.approx(1 / 23.976024, abs=1e-6)

    def test_extends_past_last_override_with_default(self):
        t = self.tc.get_frame_time(2000)
        assert t > self.tc.get_frame_time(1001)


def test_unknown_format_raises():
    with pytest.raises(SushiError):
        Timecodes.parse("# timecode format v3\n123")


def test_frame_number_past_end_replicates_reference_oddity():
    """Bug-for-bug parity pin (reference demux.py:152-155): past the last
    explicit v1 time with a default fps, the reference computes
    int((timestamp - sum(times)) / frame_duration) — sum of ALL frame
    times, not times[-1] — producing a large negative frame number.  We
    deliberately replicate it (see timecodes.py get_frame_number); this
    test freezes that choice so any change is a conscious one."""
    tc = Timecodes([0.0, 0.5, 1.0], default_fps=10.0)
    expected = int((100.0 - sum([0.0, 0.5, 1.0])) / 0.1)
    assert tc.get_frame_number(100.0) == expected == 985

    # in-range queries are unaffected: plain bisect
    assert tc.get_frame_number(0.5) == 1
    # without a default fps the past-the-end path cannot trigger
    assert Timecodes([0.0, 0.5, 1.0], None).get_frame_number(100.0) == 3
