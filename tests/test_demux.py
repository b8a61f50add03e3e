"""Demux layer tests: no real ffmpeg — subprocess calls are mocked and the
exact argv contracts are pinned (mirroring the reference's tests/demuxing.py)."""

from unittest import mock

import pytest

from sushi_tpu.errors import SushiError
from sushi_tpu.media.demux import (
    Demuxer,
    FFmpeg,
    FFprobe,
    MediaInfo,
    MkvToolnix,
    SCXviD,
    probe_media_info,
)

FFMPEG_PROBE_OUTPUT = """Input #0, matroska,webm, from 'ep.mkv':
  Metadata:
    title           : Episode 5
  Duration: 00:24:00.12, start: 0.000000, bitrate: 5664 kb/s
  Chapter #0.0: start 0.000000, end 287.162000
    Metadata:
      title           : Part A
  Chapter #0.1: start 287.162000, end 1437.186000
    Metadata:
      title           : Part B
    Stream #0:0(jpn): Video: h264 (High 10), yuv420p10le, 1920x1080 (default)
    Stream #0:1(jpn): Audio: flac, 48000 Hz, stereo, s16 (default)
    Metadata:
      title           : Japanese 2.0 FLAC
    Stream #0:2(eng): Audio: aac, 48000 Hz, stereo, fltp
    Stream #0:3(eng): Subtitle: ass (default)
    Metadata:
      title           : English subs
    Stream #0:4(enm): Subtitle: subrip
"""


class TestProbeParsing:
    info = MediaInfo(
        video=FFmpeg._get_video_streams(FFMPEG_PROBE_OUTPUT),
        audio=FFmpeg._get_audio_streams(FFMPEG_PROBE_OUTPUT),
        subtitles=FFmpeg._get_subtitles_streams(FFMPEG_PROBE_OUTPUT),
        chapters=FFmpeg._get_chapters_times(FFMPEG_PROBE_OUTPUT),
    )

    def test_video_streams(self):
        assert len(self.info.video) == 1
        assert self.info.video[0].id == 0
        assert self.info.video[0].default

    def test_audio_streams(self):
        assert [a.id for a in self.info.audio] == [1, 2]
        assert self.info.audio[0].default and not self.info.audio[1].default
        assert self.info.audio[0].title == "Japanese 2.0 FLAC"

    def test_subtitle_streams(self):
        assert [s.id for s in self.info.subtitles] == [3, 4]
        assert self.info.subtitles[0].type == ".ass"
        assert self.info.subtitles[1].type == ".srt"
        assert self.info.subtitles[0].default
        assert self.info.subtitles[0].title == "English subs"

    def test_chapters(self):
        assert self.info.chapters == [0.0, 287.162]


def test_ffmpeg_demux_argv():
    with mock.patch("subprocess.call") as call:
        FFmpeg.demux_file(
            "ep.mkv",
            audio_stream=1,
            audio_path="audio.wav",
            audio_rate=12000,
            script_stream=3,
            script_path="subs.ass",
            video_stream=0,
            timecodes_path="tc.txt",
        )
        call.assert_called_once_with(
            [
                "ffmpeg", "-hide_banner", "-i", "ep.mkv", "-y",
                "-map", "0:1", "-ar", "12000", "-ac", "1", "-acodec", "pcm_s16le", "audio.wav",
                "-map", "0:3", "subs.ass",
                "-map", "0:0", "-f", "mkvtimestamp_v2", "tc.txt",
            ]
        )


def test_mkvextract_argv():
    with mock.patch("subprocess.call") as call:
        MkvToolnix.extract_timecodes("ep.mkv", stream_idx=0, output_path="tc.txt")
        call.assert_called_once_with(["mkvextract", "timecodes_v2", "ep.mkv", "0:tc.txt"])


def test_scxvid_argv():
    with mock.patch("subprocess.Popen") as popen:
        SCXviD.make_keyframes("ep.mkv", "kfs.txt")
        first = popen.call_args_list[0][0][0]
        second = popen.call_args_list[1][0][0]
        assert first == [
            "ffmpeg", "-i", "ep.mkv", "-f", "yuv4mpegpipe", "-vf", "scale=640:360",
            "-pix_fmt", "yuv420p", "-vsync", "drop", "-",
        ]
        assert second == ["SCXvid", "kfs.txt"]


def test_ffmpeg_missing_binary_maps_to_sushi_error():
    with mock.patch("subprocess.Popen", side_effect=OSError(2, "nope")):
        with pytest.raises(SushiError, match="ffmpeg"):
            FFmpeg.get_info("ep.mkv")
    with mock.patch("subprocess.call", side_effect=OSError(2, "nope")):
        with pytest.raises(SushiError, match="ffmpeg"):
            FFmpeg.demux_file("ep.mkv", audio_stream=1, audio_path="a.wav")


FFPROBE_JSON_OUTPUT = """{
    "streams": [
        {"index": 0, "codec_name": "h264", "codec_type": "video", "profile": "High 10",
         "width": 1920, "height": 1080,
         "disposition": {"default": 1, "forced": 0}, "tags": {"language": "jpn"}},
        {"index": 1, "codec_name": "flac", "codec_type": "audio", "sample_rate": "48000",
         "channel_layout": "stereo",
         "disposition": {"default": 1, "forced": 0},
         "tags": {"language": "jpn", "title": "Japanese 2.0 FLAC"}},
        {"index": 2, "codec_name": "aac", "codec_type": "audio", "sample_rate": "48000",
         "channel_layout": "stereo",
         "disposition": {"default": 0, "forced": 0}, "tags": {"language": "eng"}},
        {"index": 3, "codec_name": "ass", "codec_type": "subtitle",
         "disposition": {"default": 1, "forced": 0},
         "tags": {"language": "eng", "title": "English subs"}},
        {"index": 4, "codec_name": "subrip", "codec_type": "subtitle",
         "disposition": {"default": 0, "forced": 0}, "tags": {"language": "enm"}}
    ],
    "chapters": [
        {"id": 1, "start_time": "0.000000", "end_time": "287.162000",
         "tags": {"title": "Part A"}},
        {"id": 2, "start_time": "287.162000", "end_time": "1437.186000",
         "tags": {"title": "Part B"}}
    ]
}"""


class TestFFprobeParsing:
    """The ffprobe JSON path must extract the same facts as the scrape."""

    info = FFprobe.parse_media_info(FFPROBE_JSON_OUTPUT)

    def test_matches_scrape_results(self):
        scraped = TestProbeParsing.info
        assert [v.id for v in self.info.video] == [v.id for v in scraped.video]
        assert [a.id for a in self.info.audio] == [a.id for a in scraped.audio]
        assert [(s.id, s.type, s.default) for s in self.info.subtitles] == [
            (s.id, s.type, s.default) for s in scraped.subtitles
        ]
        assert self.info.chapters == scraped.chapters

    def test_titles_and_defaults(self):
        assert self.info.audio[0].title == "Japanese 2.0 FLAC"
        assert self.info.audio[0].default and not self.info.audio[1].default
        assert self.info.video[0].default

    def test_unparsable_output_returns_none(self):
        assert FFprobe.parse_media_info("not json at all") is None
        assert FFprobe.parse_media_info('{"streams": [{"no_index": true}]}') is None


def test_probe_prefers_ffprobe_with_scrape_fallback():
    with mock.patch.object(FFprobe, "get_output", return_value=FFPROBE_JSON_OUTPUT):
        with mock.patch.object(FFmpeg, "get_info") as scrape:
            with mock.patch("sushi_tpu.media.demux.shutil.which", return_value="/usr/bin/ffmpeg"):
                info = probe_media_info("ep.mkv")
    scrape.assert_not_called()
    assert [a.id for a in info.audio] == [1, 2]

    # ffprobe missing -> the reference's ffmpeg stderr scrape takes over
    with mock.patch.object(FFprobe, "get_output", return_value=None):
        with mock.patch.object(FFmpeg, "get_info", return_value=FFMPEG_PROBE_OUTPUT):
            info = probe_media_info("ep.mkv")
    assert [a.id for a in info.audio] == [1, 2]


def _make_demuxer(path="ep.mkv"):
    with mock.patch.object(FFprobe, "get_output", return_value=None):
        with mock.patch.object(FFmpeg, "get_info", return_value=FFMPEG_PROBE_OUTPUT):
            return Demuxer(path)


class TestDemuxerFacade:
    def test_wav_passthrough(self):
        demuxer = Demuxer("audio.wav")
        assert demuxer.is_wav
        assert demuxer.chapters == []
        assert not demuxer.has_video

    def test_selects_single_default_audio(self):
        demuxer = _make_demuxer()
        demuxer.set_audio(stream_idx=None, output_path="a.wav", sample_rate=12000)
        assert demuxer._audio_stream.id == 1  # default track among two

    def test_selects_explicit_stream(self):
        demuxer = _make_demuxer()
        demuxer.set_audio(stream_idx=2, output_path="a.wav", sample_rate=12000)
        assert demuxer._audio_stream.id == 2

    def test_bad_stream_index_lists_candidates(self):
        demuxer = _make_demuxer()
        with pytest.raises(SushiError, match="doesn't exist"):
            demuxer.set_audio(stream_idx=9, output_path="a.wav", sample_rate=12000)

    def test_subs_type_detection(self):
        demuxer = _make_demuxer()
        assert demuxer.get_subs_type(None) == ".ass"
        assert demuxer.get_subs_type(4) == ".srt"

    def test_demux_runs_single_ffmpeg_call(self):
        demuxer = _make_demuxer()
        demuxer.set_audio(stream_idx=1, output_path="a.wav", sample_rate=12000)
        demuxer.set_script(stream_idx=3, output_path="s.ass")
        with mock.patch("subprocess.call") as call:
            demuxer.demux()
        argv = call.call_args[0][0]
        assert argv[:5] == ["ffmpeg", "-hide_banner", "-i", "ep.mkv", "-y"]
        assert "a.wav" in argv and "s.ass" in argv

    def test_mkv_timecodes_prefers_mkvextract(self):
        demuxer = _make_demuxer("ep.mkv")
        demuxer.set_timecodes(output_path="tc.txt")
        with mock.patch("subprocess.call") as call:
            demuxer.demux()
        assert call.call_args_list[0][0][0][0] == "mkvextract"

    def test_mkvextract_missing_falls_back_to_ffmpeg(self):
        demuxer = _make_demuxer("ep.mkv")
        demuxer.set_timecodes(output_path="tc.txt")
        calls = []

        def fake_call(argv):
            calls.append(argv)
            if argv[0] == "mkvextract":
                raise OSError(2, "not installed")
            return 0

        with mock.patch("subprocess.call", side_effect=fake_call):
            demuxer.demux()
        assert calls[0][0] == "mkvextract"
        assert calls[1][0] == "ffmpeg"
        assert "mkvtimestamp_v2" in calls[1]

    def test_chapters_written_as_ogm(self, tmp_path):
        demuxer = _make_demuxer()
        out = tmp_path / "ch.txt"
        demuxer.set_chapters(str(out))
        with mock.patch("subprocess.call"):
            demuxer.demux()
        text = out.read_text()
        assert "CHAPTER01=00:00:00.000" in text
        assert "CHAPTER02=00:04:47.162" in text

    def test_cleanup_removes_outputs(self, tmp_path):
        demuxer = _make_demuxer()
        audio = tmp_path / "a.wav"
        audio.write_text("x")
        demuxer.set_audio(stream_idx=1, output_path=str(audio), sample_rate=12000)
        demuxer.cleanup()
        assert not audio.exists()


def test_probe_fails_fast_without_ffmpeg():
    # ffprobe present but ffmpeg missing must raise at probe time (the
    # reference fails fast in Demuxer.__init__), not later inside demux()
    with mock.patch.object(FFprobe, "get_output", return_value=FFPROBE_JSON_OUTPUT):
        with mock.patch("sushi_tpu.media.demux.shutil.which", return_value=None):
            with pytest.raises(SushiError, match="ffmpeg"):
                probe_media_info("ep.mkv")


def test_cleanup_tolerates_missing_outputs(tmp_path):
    # cleanup runs from run()'s finally: a demux failure leaves outputs
    # uncreated, and cleanup must not mask the real error
    demuxer = _make_demuxer()
    demuxer.set_audio(stream_idx=1, output_path=str(tmp_path / "never.wav"), sample_rate=12000)
    demuxer.cleanup()  # must not raise


def test_ffprobe_drops_negative_chapter_starts():
    import json as _json

    probed = _json.loads(FFPROBE_JSON_OUTPUT)
    probed.setdefault("chapters", []).insert(0, {"start_time": "-0.007000"})
    info = FFprobe.parse_media_info(_json.dumps(probed))
    assert all(start >= 0 for start in info.chapters)
