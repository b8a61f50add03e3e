"""Season batch sync: three episodes with different shifts sharing device
batches; outputs must match per-episode single runs."""

import json

import numpy as np
import pytest

from sushi_tpu.errors import SushiError
from sushi_tpu.season import SeasonJob, load_jobs, sync_season
from sushi_tpu.text.subs import SrtScript

from tests.fixtures import shift_audio, synth_episode, write_srt, write_wav_int16

EVENTS = [(2.0, 3.7), (5.5, 7.0), (9.0, 10.5), (12.5, 14.0)]
SHIFTS = [1.25, 3.417, 0.75]


@pytest.fixture(scope="module")
def season(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("season")
    jobs = []
    for i, shift in enumerate(SHIFTS):
        audio = synth_episode(16.0, EVENTS, seed=50 + i)
        rng = np.random.RandomState(60 + i)
        dst_audio = shift_audio(audio, shift)
        dst_audio = (dst_audio.astype(np.int32) + rng.randint(-150, 150, len(dst_audio))).astype(np.int16)
        src = str(tmp / f"ep{i}.src.wav")
        dst = str(tmp / f"ep{i}.dst.wav")
        script = str(tmp / f"ep{i}.srt")
        out = str(tmp / f"ep{i}.out.srt")
        write_wav_int16(src, audio)
        write_wav_int16(dst, dst_audio)
        write_srt(script, [(s, e, f"ep{i} line") for s, e in EVENTS])
        jobs.append(SeasonJob(src, dst, script, out))
    return tmp, jobs


def test_season_sync_recovers_each_shift(season):
    tmp, jobs = season
    sync_season(jobs)
    for job, shift in zip(jobs, SHIFTS):
        result = SrtScript.from_file(job.output)
        assert len(result.events) == len(EVENTS)
        for event, (start, _) in zip(result.events, EVENTS):
            assert event.start == pytest.approx(start + shift, abs=2e-3), job.output


def test_load_jobs_validation(tmp_path):
    bad = tmp_path / "jobs.json"
    bad.write_text(json.dumps([{"src": "a"}]), encoding="utf-8")
    with pytest.raises(SushiError, match="job #0"):
        load_jobs(str(bad))
    bad.write_text("{}", encoding="utf-8")
    with pytest.raises(SushiError, match="non-empty"):
        load_jobs(str(bad))


def test_season_cli_entry(season, tmp_path):
    tmp, jobs = season
    jobs_file = tmp_path / "jobs.json"
    outs = [str(tmp_path / f"cli{i}.srt") for i in range(len(jobs))]
    jobs_file.write_text(
        json.dumps(
            [
                {"src": j.src, "dst": j.dst, "script": j.script, "output": out}
                for j, out in zip(jobs, outs)
            ]
        ),
        encoding="utf-8",
    )
    from sushi_tpu.season import main

    main([str(jobs_file)])
    for out, shift in zip(outs, SHIFTS):
        result = SrtScript.from_file(out)
        assert result.events[0].start == pytest.approx(EVENTS[0][0] + shift, abs=2e-3)


@pytest.fixture()
def fake_ffmpeg(tmp_path, monkeypatch):
    """A PATH-shimmed ffmpeg: probe prints a stream listing, demux 'extracts'
    audio by copying ``<container>.hidden.wav`` (the argv contract is pinned
    separately in tests/test_demux.py; this exercises the real Demuxer flow
    end-to-end without ffmpeg on the box)."""
    bindir = tmp_path / "bin"
    bindir.mkdir()
    stub = bindir / "ffmpeg"
    stub.write_text(
        "#!/bin/sh\n"
        'input=""; prev=""; out=""\n'
        'for a in "$@"; do\n'
        '  if [ "$prev" = "-i" ]; then input="$a"; fi\n'
        '  prev="$a"; out="$a"\n'
        "done\n"
        'if [ "$#" -le 3 ]; then\n'
        "  printf 'Input #0, matroska,webm, from %s:\\n' \"$input\" >&2\n"
        "  printf '    Stream #0:0: Video: h264 (default)\\n' >&2\n"
        "  printf '    Stream #0:1: Audio: pcm_s16le (default)\\n' >&2\n"
        "  printf '    Stream #0:2: Audio: pcm_s16le\\n' >&2\n"
        "  exit 1\n"
        "fi\n"
        'printf "demux %s\\n" "$input" >> "' + str(bindir) + '/demux.log"\n'
        'cp "${input%.mkv}.hidden.wav" "$out"\n'
    )
    stub.chmod(0o755)
    monkeypatch.setenv("PATH", str(bindir) + ":" + str(__import__("os").environ["PATH"]))
    return bindir


def test_season_demuxes_containers(tmp_path, fake_ffmpeg):
    """BASELINE config 5 shape: container sources demuxed via the Demuxer on
    ingest threads, streamed into shared device batches."""
    import os

    jobs = []
    shifts = [1.25, 2.0]
    for i, shift in enumerate(shifts):
        audio = synth_episode(16.0, EVENTS, seed=80 + i)
        dst_audio = shift_audio(audio, shift)
        container = str(tmp_path / f"ep{i}.dst.mkv")
        with open(container, "w") as handle:
            handle.write("not really matroska")
        write_wav_int16(container[: -len(".mkv")] + ".hidden.wav", dst_audio)
        src = str(tmp_path / f"ep{i}.src.wav")
        write_wav_int16(src, audio)
        script = str(tmp_path / f"ep{i}.srt")
        write_srt(script, [(s, e, f"ep{i} line") for s, e in EVENTS])
        jobs.append(SeasonJob(src, container, script, str(tmp_path / f"ep{i}.out.srt")))

    temp_dir = str(tmp_path / "work")
    sync_season(jobs, temp_dir=temp_dir, io_threads=2)

    for job, shift in zip(jobs, shifts):
        result = SrtScript.from_file(job.output)
        for event, (start, _) in zip(result.events, EVENTS):
            assert event.start == pytest.approx(start + shift, abs=2e-3), job.output
    # demuxed audio landed in the temp dir and is kept without --cleanup
    demuxed = [n for n in os.listdir(temp_dir) if n.endswith(".sushi.wav")]
    assert len(demuxed) == len(shifts)


def test_season_shared_container_demuxes_once(tmp_path, fake_ffmpeg):
    """Two jobs sharing one destination container (e.g. a movie synced
    against two script revisions) must demux it exactly once — concurrent
    ffmpeg runs onto the same output path could corrupt the WAV."""
    import os

    shift = 2.0
    audio = synth_episode(16.0, EVENTS, seed=95)
    dst_audio = shift_audio(audio, shift)
    container = str(tmp_path / "movie.mkv")
    with open(container, "w") as handle:
        handle.write("not really matroska")
    write_wav_int16(container[: -len(".mkv")] + ".hidden.wav", dst_audio)
    src = str(tmp_path / "movie.src.wav")
    write_wav_int16(src, audio)
    jobs = []
    for i in range(2):
        script = str(tmp_path / f"rev{i}.srt")
        write_srt(script, [(s, e, f"rev{i} line") for s, e in EVENTS])
        jobs.append(SeasonJob(src, container, script, str(tmp_path / f"rev{i}.out.srt")))

    temp_dir = str(tmp_path / "work")
    failures = sync_season(jobs, temp_dir=temp_dir, io_threads=2)
    assert failures == []

    for job in jobs:
        result = SrtScript.from_file(job.output)
        for event, (start, _) in zip(result.events, EVENTS):
            assert event.start == pytest.approx(start + shift, abs=2e-3), job.output
    log_path = fake_ffmpeg / "demux.log"
    demux_calls = [line for line in log_path.read_text().splitlines() if container in line]
    assert len(demux_calls) == 1, demux_calls


def test_season_survives_one_broken_episode(season, tmp_path):
    """A corrupt source WAV fails its own episode only; the rest of the
    season syncs and the failure is reported in the return value."""
    tmp, jobs = season
    broken_src = tmp_path / "broken.src.wav"
    broken_src.write_bytes(b"RIFFgarbage-not-a-wav")
    bad = SeasonJob(str(broken_src), jobs[0].dst, jobs[0].script, str(tmp_path / "bad.out.srt"))
    good = SeasonJob(jobs[1].src, jobs[1].dst, jobs[1].script, str(tmp_path / "good.out.srt"))

    failures = sync_season([bad, good], io_threads=2)

    assert len(failures) == 1 and failures[0][0] is bad
    result = SrtScript.from_file(good.output)
    for event, (start, _) in zip(result.events, EVENTS):
        assert event.start == pytest.approx(start + SHIFTS[1], abs=2e-3)
    assert not (tmp_path / "bad.out.srt").exists()


def test_season_same_basename_containers_do_not_collide(tmp_path, fake_ffmpeg):
    """TV/ep01.mkv vs BD/ep01.mkv with --temp-dir: the demuxed audio paths
    must not collide (keyed by basename alone they would, and the episode
    would silently sync against itself with shift ~0)."""
    shift = 2.0
    audio = synth_episode(16.0, EVENTS, seed=90)
    dst_audio = shift_audio(audio, shift)
    tv, bd = tmp_path / "TV", tmp_path / "BD"
    tv.mkdir(), bd.mkdir()
    src_container = str(tv / "ep01.mkv")
    dst_container = str(bd / "ep01.mkv")
    for container, wav in ((src_container, audio), (dst_container, dst_audio)):
        with open(container, "w") as handle:
            handle.write("not really matroska")
        write_wav_int16(container[: -len(".mkv")] + ".hidden.wav", wav)
    script = str(tmp_path / "ep01.srt")
    write_srt(script, [(s, e, "line") for s, e in EVENTS])
    out = str(tmp_path / "ep01.out.srt")

    temp_dir = str(tmp_path / "work")
    sync_season([SeasonJob(src_container, dst_container, script, out)],
                temp_dir=temp_dir, io_threads=2)

    result = SrtScript.from_file(out)
    for event, (start, _) in zip(result.events, EVENTS):
        assert event.start == pytest.approx(start + shift, abs=2e-3)


def test_season_keyframe_jobs_byte_identical_to_pipeline(tmp_path):
    """VERDICT r2 #4: per-job keyframes/fps run the pipeline's FULL
    post-processing (snapping included) — a 2-episode season must write
    byte-identical outputs to two single pipeline runs."""
    from tests.test_keyframes_e2e import write_scxvid_log
    from tests.test_pipeline import run_cli

    fps = 24.0
    shifts = [2.505, 1.25]
    jobs = []
    for i, shift in enumerate(shifts):
        audio = synth_episode(18.0, EVENTS, seed=70 + i)
        rng = np.random.RandomState(75 + i)
        dst_audio = shift_audio(audio, shift)
        dst_audio = (dst_audio.astype(np.int32) + rng.randint(-150, 150, len(dst_audio))).astype(np.int16)
        src = str(tmp_path / f"kf{i}.src.wav")
        dst = str(tmp_path / f"kf{i}.dst.wav")
        script = str(tmp_path / f"kf{i}.srt")
        write_wav_int16(src, audio)
        write_wav_int16(dst, dst_audio)
        write_srt(script, [(s, e, f"ep{i} line") for s, e in EVENTS])
        src_kf = str(tmp_path / f"kf{i}.src.kf.txt")
        dst_kf = str(tmp_path / f"kf{i}.dst.kf.txt")
        write_scxvid_log(src_kf, [int(round(s * fps)) for s, _ in EVENTS], int(18 * fps))
        write_scxvid_log(dst_kf, [int(round((s + shift) * fps)) + 1 for s, _ in EVENTS], int(25 * fps))
        jobs.append(
            SeasonJob(
                src, dst, script, str(tmp_path / f"kf{i}.season.srt"),
                src_keyframes=src_kf, dst_keyframes=dst_kf,
                src_fps=fps, dst_fps=fps,
            )
        )

    failures = sync_season(jobs, io_threads=2)
    assert failures == []

    for i, job in enumerate(jobs):
        single_out = str(tmp_path / f"kf{i}.single.srt")
        run_cli(
            [
                "--src", job.src, "--dst", job.dst, "--script", job.script,
                "-o", single_out,
                "--src-keyframes", job.src_keyframes,
                "--dst-keyframes", job.dst_keyframes,
                "--src-fps", str(fps), "--dst-fps", str(fps),
            ]
        )
        with open(job.output, "rb") as season_handle, open(single_out, "rb") as single_handle:
            assert season_handle.read() == single_handle.read(), job.output
        # sanity: snapping actually moved starts onto the nudged keyframes
        result = SrtScript.from_file(job.output)
        for event, (start, _) in zip(result.events, EVENTS):
            expected = (int(round((start + shifts[i]) * fps)) + 1) / fps
            assert event.start == pytest.approx(expected, abs=5e-3)


def test_season_job_keyframe_validation(tmp_path, season):
    _, jobs = season
    base = jobs[0]
    one_sided = SeasonJob(base.src, base.dst, base.script, str(tmp_path / "x.srt"),
                          src_keyframes=base.script)  # any existing file
    with pytest.raises(SushiError, match="none or both"):
        sync_season([one_sided])
    auto = SeasonJob(base.src, base.dst, base.script, str(tmp_path / "x.srt"),
                     src_keyframes="auto", dst_keyframes="auto")
    with pytest.raises(SushiError, match="explicit keyframe"):
        sync_season([auto])


def test_season_demux_dedupe_keys_by_resolved_track(tmp_path, fake_ffmpeg):
    """The demux registry dedupes by RESOLVED track: jobs selecting
    *different* audio tracks of one container must not share a demuxed
    WAV (the second would silently align against the wrong audio), while
    a default-track request and an explicit index naming that same track
    must share one demux (not run two)."""
    shift = 1.5
    audio = synth_episode(16.0, EVENTS, seed=97)
    container = str(tmp_path / "movie.mkv")
    with open(container, "w") as handle:
        handle.write("not really matroska")
    write_wav_int16(container[: -len(".mkv")] + ".hidden.wav", shift_audio(audio, shift))
    src = str(tmp_path / "movie.src.wav")
    write_wav_int16(src, audio)
    jobs = []
    # default (resolves to track 1), explicit track 1 (same), track 2
    for i, idx in enumerate((None, 1, 2)):
        script = str(tmp_path / f"job{i}.srt")
        write_srt(script, [(s, e, f"job{i} line") for s, e in EVENTS])
        jobs.append(
            SeasonJob(src, container, script, str(tmp_path / f"job{i}.out.srt"),
                      dst_audio_idx=idx)
        )

    temp_dir = str(tmp_path / "work")
    failures = sync_season(jobs, temp_dir=temp_dir, io_threads=2)
    assert failures == []
    for job in jobs:
        result = SrtScript.from_file(job.output)
        for event, (start, _) in zip(result.events, EVENTS):
            assert event.start == pytest.approx(start + shift, abs=2e-3), job.output
    log_path = fake_ffmpeg / "demux.log"
    demux_calls = [line for line in log_path.read_text().splitlines() if container in line]
    assert len(demux_calls) == 2, demux_calls  # track 1 once (shared), track 2 once


def test_season_fps_timecodes_conflict_rejected_without_keyframes(tmp_path, season):
    """The fps-vs-timecodes conflict fails fast even when no keyframes are
    in play — same unconditional validation as the single-episode CLI."""
    _, jobs = season
    base = jobs[0]
    conflicted = SeasonJob(base.src, base.dst, base.script, str(tmp_path / "x.srt"),
                           src_timecodes=base.script, src_fps=23.976)
    with pytest.raises(SushiError, match="fps and timecodes"):
        sync_season([conflicted])
