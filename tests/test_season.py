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
