"""Grouping/repair heuristics on a duck-typed FakeEvent, mirroring the
coverage of the reference's tests/main.py."""

import pytest

from sushi_tpu.align import heuristics
from sushi_tpu.align.groups import merge_short_lines_into_groups, prepare_search_groups
from sushi_tpu.align.snapping import get_distance_to_closest_kf
from sushi_tpu.errors import SushiError


class FakeEvent:
    def __init__(self, shift=0.0, diff=0.0, start=0.0, end=0.0, is_comment=False):
        self._shift = shift
        self._diff = diff
        self.start = start
        self.end = end
        self.is_comment = is_comment
        self._linked_event = None

    @property
    def shift(self):
        return self._linked_event.shift if self._linked_event else self._shift

    @property
    def diff(self):
        return self._linked_event.diff if self._linked_event else self._diff

    @property
    def duration(self):
        return self.end - self.start

    @property
    def linked(self):
        return self._linked_event is not None

    def link_event(self, other):
        self._linked_event = other

    def get_link_chain_end(self):
        return self._linked_event.get_link_chain_end() if self._linked_event else self

    def set_shift(self, shift, diff):
        self._shift = shift
        self._diff = diff

    def __repr__(self):
        return f"FakeEvent(shift={self._shift})"


def shifts(events):
    return [e.shift for e in events]


# --- interpolate_nones -------------------------------------------------------


def test_interpolate_nones_middle():
    assert heuristics.interpolate_nones([1, None, 3], [1, 2, 3]) == [1, 2, 3]


def test_interpolate_nones_ends_clamp():
    assert heuristics.interpolate_nones([None, 2, None], [1, 2, 3]) == [2, 2, 2]


def test_interpolate_nones_all_none():
    assert heuristics.interpolate_nones([None, None], [1, 2]) == []


def test_interpolate_nones_no_nones():
    assert heuristics.interpolate_nones([5, 6], [1, 2]) == [5, 6]


def test_interpolate_nones_duplicate_point_fills_from_known():
    # a None whose point duplicates a point carrying a value takes that
    # value (reference sushi.py:71-93: only "no Nones at all" returns early)
    assert heuristics.interpolate_nones([1.0, None], [5.0, 5.0]) == [1.0, 1.0]
    assert heuristics.interpolate_nones([None, 2.0, None, 7.0], [3.0, 3.0, 5.0, 5.0]) == [2.0, 2.0, 7.0, 7.0]


# --- running_median / smooth_events ------------------------------------------


def test_running_median_basic():
    assert heuristics.running_median([1, 2, 100, 3, 4], 3) == [1, 2, 3, 4, 4]


def test_running_median_rejects_even_window():
    with pytest.raises(SushiError):
        heuristics.running_median([1, 2, 3], 2)


def test_smooth_events_replaces_outlier():
    events = [FakeEvent(shift=s) for s in (10, 10, 9000, 10, 10)]
    heuristics.smooth_events(events, radius=1)
    assert shifts(events) == [10, 10, 10, 10, 10]


def test_smooth_events_zero_radius_noop():
    events = [FakeEvent(shift=s) for s in (1, 5, 9)]
    heuristics.smooth_events(events, radius=0)
    assert shifts(events) == [1, 5, 9]


# --- detect_groups ------------------------------------------------------------


def test_detect_groups_splits_on_shift_jump():
    events = [FakeEvent(shift=s) for s in (0.1, 0.101, 0.5, 0.5, 0.1)]
    groups = heuristics.detect_groups(events)
    assert [len(g) for g in groups] == [2, 2, 1]


# --- groups_from_chapters -------------------------------------------------------


def make_timed(times):
    return [FakeEvent(start=s, end=e) for s, e in times]


def test_groups_from_chapters_basic():
    events = make_timed([(0, 1), (2, 3), (10, 11), (12, 13)])
    groups = heuristics.groups_from_chapters(events, [0, 5])
    assert [len(g) for g in groups] == [2, 2]


def test_groups_from_chapters_empty_chapters_dropped():
    events = make_timed([(0, 1), (20, 21)])
    groups = heuristics.groups_from_chapters(events, [0, 5, 10, 15])
    assert [len(g) for g in groups] == [1, 1]


def test_groups_from_chapters_all_linked_group_merges_to_parent():
    events = make_timed([(0, 1), (2, 3), (10, 11)])
    events[2].link_event(events[1])
    groups = heuristics.groups_from_chapters(events, [0, 5])
    assert len(groups) == 1
    assert len(groups[0]) == 3


# --- split_broken_groups --------------------------------------------------------


def test_split_broken_groups_consistent_passthrough():
    groups = [[FakeEvent(shift=0.5), FakeEvent(shift=0.5)], [FakeEvent(shift=1.0)]]
    result = heuristics.split_broken_groups(groups)
    assert [len(g) for g in result] == [2, 1]


def test_split_broken_groups_splits_inconsistent():
    broken = [FakeEvent(shift=0.0), FakeEvent(shift=0.0), FakeEvent(shift=5.0), FakeEvent(shift=5.0)]
    result = heuristics.split_broken_groups([broken])
    assert [len(g) for g in result] == [2, 2]
    assert result[0][0].shift == 0.0 and result[1][0].shift == 5.0


def test_split_broken_groups_remerges_compatible_neighbors():
    broken = [FakeEvent(shift=0.0), FakeEvent(shift=5.0)]
    tail = [FakeEvent(shift=5.0), FakeEvent(shift=5.0)]
    result = heuristics.split_broken_groups([broken, tail])
    assert [len(g) for g in result] == [1, 3]


# --- fix_near_borders ------------------------------------------------------------


def test_fix_near_borders_links_outliers():
    events = [FakeEvent(diff=d) for d in (9.0, 0.5, 0.5, 0.5, 0.5, 0.5, 9.0)]
    heuristics.fix_near_borders(events)
    assert [e.linked for e in events] == [True, False, False, False, False, False, True]
    assert events[0].diff == 0.5


def test_fix_near_borders_no_outliers():
    events = [FakeEvent(diff=0.5) for _ in range(5)]
    heuristics.fix_near_borders(events)
    assert not any(e.linked for e in events)


# --- average_shifts ------------------------------------------------------------


def test_average_shifts_weighted():
    events = [FakeEvent(shift=1.0, diff=0.0), FakeEvent(shift=3.0, diff=0.5)]
    average = heuristics.average_shifts(events)
    assert average == pytest.approx((1.0 * 1.0 + 3.0 * 0.5) / 1.5)
    assert events[0].shift == average


def test_average_shifts_skips_linked():
    linked = FakeEvent(shift=100.0, diff=0.0)
    anchor = FakeEvent(shift=2.0, diff=0.0)
    linked.link_event(anchor)
    heuristics.average_shifts([anchor, linked])
    assert anchor.shift == 2.0


# --- keyframe distance ------------------------------------------------------------


def test_distance_to_closest_kf():
    keytimes = [0, 10, 20]
    assert get_distance_to_closest_kf(-5, keytimes) == 5
    assert get_distance_to_closest_kf(12, keytimes) == -2
    assert get_distance_to_closest_kf(16, keytimes) == 4
    assert get_distance_to_closest_kf(25, keytimes) == -5


# --- merge_short_lines / prepare_search_groups -----------------------------------


def test_merge_short_lines_clusters_typesetting():
    events = make_timed([(0.0, 0.1), (0.2, 0.3), (0.4, 0.5), (5.0, 8.0)])
    groups = merge_short_lines_into_groups(events, [0], max_ts_duration=0.42, max_ts_distance=0.42)
    assert [len(g) for g in groups] == [3, 1]


def test_merge_short_lines_respects_chapters():
    events = make_timed([(0.0, 0.1), (0.2, 0.3)])
    groups = merge_short_lines_into_groups(events, [0, 0.15], max_ts_duration=0.42, max_ts_distance=0.42)
    assert [len(g) for g in groups] == [1, 1]


def test_prepare_search_groups_links_comments_and_zero_duration():
    events = [
        FakeEvent(start=1.0, end=2.0),
        FakeEvent(start=2.0, end=2.0),  # zero duration -> links forward
        FakeEvent(start=3.0, end=4.0, is_comment=True),  # comment -> links forward
        FakeEvent(start=5.0, end=8.0),
        FakeEvent(start=100.0, end=101.0),  # out of range -> links back
    ]
    groups = prepare_search_groups(
        events, source_duration=50.0, chapter_times=[], max_ts_duration=0.42, max_ts_distance=0.42
    )
    assert events[1].linked and events[2].linked and events[4].linked
    assert [len(g) for g in groups] == [1, 1]


def test_prepare_search_groups_links_duplicates():
    events = [
        FakeEvent(start=1.0, end=2.0),
        FakeEvent(start=1.0, end=2.0),
        FakeEvent(start=1.0, end=3.0),
    ]
    prepare_search_groups(
        events, source_duration=50.0, chapter_times=[], max_ts_duration=0.42, max_ts_distance=0.42
    )
    assert events[1].linked and events[1].get_link_chain_end() is events[0]
    assert not events[2].linked


def test_prepare_search_groups_links_nested_groups():
    events = [
        FakeEvent(start=1.0, end=10.0),
        FakeEvent(start=2.0, end=3.0),
    ]
    groups = prepare_search_groups(
        events, source_duration=50.0, chapter_times=[], max_ts_duration=5.0, max_ts_distance=0.42
    )
    assert len(groups) == 1
    assert events[1].linked


# --- keyframe shift/distance helpers -----------------------------------------


class _FakeTimecodes:
    def __init__(self, frame_size=1.0 / 24):
        self._size = frame_size

    def get_frame_size(self, timestamp):
        return self._size


def _kf_event(start, end, shift):
    event = FakeEvent(start=start, end=end)
    event.set_shift(shift, 0.1)
    # duck-type the shifted_* properties snapping reads
    FakeEvent.shifted_start = property(lambda self: self.start + self.shift)
    FakeEvent.shifted_end = property(lambda self: self.end + self.shift)
    return event


def test_find_keyframe_shift_within_limit():
    from sushi_tpu.align.snapping import find_keyframe_shift

    tc = _FakeTimecodes()
    event = _kf_event(10.0, 12.0, 2.0)
    # src keyframes exactly at start/end+frame; dst keyframes one frame later
    src_keys = [10.0, 12.0 + 1.0 / 24]
    dst_keys = [12.0 + 1.0 / 24, 14.0 + 2.0 / 24]
    start_shift, end_shift = find_keyframe_shift([event], src_keys, dst_keys, tc, tc, max_kf_distance=2)
    assert start_shift == pytest.approx(1.0 / 24)
    assert end_shift == pytest.approx(1.0 / 24)


def test_find_keyframe_shift_beyond_limit_is_none():
    from sushi_tpu.align.snapping import find_keyframe_shift

    tc = _FakeTimecodes()
    event = _kf_event(10.0, 12.0, 2.0)
    # dst keyframe half a second away: beyond 2 frames at 24fps
    start_shift, end_shift = find_keyframe_shift(
        [event], [10.0, 12.5], [12.5, 15.0], tc, tc, max_kf_distance=2
    )
    assert start_shift is None


def test_find_keyframes_distances_zero_outside_limit():
    from sushi_tpu.align.snapping import find_keyframes_distances

    tc = _FakeTimecodes()
    event = _kf_event(10.0, 12.0, 2.0)
    ds, de = find_keyframes_distances(event, [10.02], [12.03], tc, max_kf_distance=2)
    assert ds == pytest.approx(0.01, abs=1e-9)
    far = find_keyframes_distances(event, [5.0], [9.0], tc, max_kf_distance=2)
    assert far == (0, 0)
