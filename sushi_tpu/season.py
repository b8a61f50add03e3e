"""Season sync: batch many episodes through shared device batches.

The reference processes one episode per process; syncing a season means N
sequential runs.  Here all episodes' analysis streams are concatenated
into one pair of device-resident buffers and every episode's search
session contributes requests to the same bucketed kernel batches — the
TPU sees a few large dispatches for the whole season (episode-level data
parallelism on one chip; shard the row axis over a mesh for more chips,
see sushi_tpu.parallel).

Usage:
    python -m sushi_tpu.season jobs.json [--sample-rate N] [--window N] ...

jobs.json: [{"src": ..., "dst": ..., "script": ..., "output": ...}, ...]
(only WAV sources here; demux containers to WAV first or via the main CLI).
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import sys
import time
from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np

from sushi_tpu.align import heuristics
from sushi_tpu.align.batcher import (
    _MAX_FFT,
    PatternTable,
    PlannedSearch,
    SearchSession,
    execute_planned,
    global_alignment_estimate,
    run_sessions,
    window_bounds,
)
from sushi_tpu.align.groups import prepare_search_groups
from sushi_tpu.errors import SushiError
from sushi_tpu.media.stream import AudioStream
from sushi_tpu.text.subs import load_script
from sushi_tpu.utils.compile_cache import enable as enable_compile_cache

_log = logging.getLogger("sushi_tpu")


@dataclass
class SeasonJob:
    src: str
    dst: str
    script: str
    output: str


@dataclass
class _Episode:
    job: SeasonJob
    script: object
    src_stream: AudioStream
    dst_stream: AudioStream
    groups: list
    session: SearchSession
    patterns: PatternTable
    src_base: int
    dst_base: int


def load_jobs(path: str) -> List[SeasonJob]:
    with open(path, encoding="utf-8") as handle:
        raw = json.load(handle)
    if not isinstance(raw, list) or not raw:
        raise SushiError("jobs file must be a non-empty JSON list")
    jobs = []
    for i, entry in enumerate(raw):
        try:
            jobs.append(
                SeasonJob(entry["src"], entry["dst"], entry["script"], entry["output"])
            )
        except (TypeError, KeyError):
            raise SushiError("job #{0} must have src/dst/script/output".format(i))
    return jobs


def sync_season(
    jobs: List[SeasonJob],
    sample_rate: int = 12000,
    sample_type: str = "uint8",
    window: float = 10,
    max_window: float = 30,
    rewind_thresh: int = 5,
    smooth_radius: int = 3,
    max_ts_duration: float = 1001.0 / 24000.0 * 10,
    max_ts_distance: float = 1001.0 / 24000.0 * 10,
) -> None:
    enable_compile_cache()
    import jax.numpy as jnp

    for job in jobs:
        for path, title in ((job.src, "Source"), (job.dst, "Destination"), (job.script, "Script")):
            if not os.path.exists(path):
                raise SushiError("{0} file doesn't exist: {1}".format(title, path))

    started = time.time()
    episodes: List[_Episode] = []
    src_parts: List[np.ndarray] = []
    dst_parts: List[np.ndarray] = []
    src_cursor = dst_cursor = 0
    for job in jobs:
        script = load_script(job.script)
        script.sort_by_time()
        src_stream = AudioStream(job.src, sample_rate, sample_type)
        dst_stream = AudioStream(job.dst, sample_rate, sample_type)
        groups = prepare_search_groups(
            script.events,
            source_duration=src_stream.duration_seconds,
            chapter_times=[],
            max_ts_duration=max_ts_duration,
            max_ts_distance=max_ts_distance,
        )
        session = SearchSession(
            src_stream,
            dst_stream,
            groups,
            window,
            max_window,
            rewind_thresh,
            delta0=global_alignment_estimate(src_stream.data, dst_stream.data),
        )
        episodes.append(
            _Episode(
                job=job,
                script=script,
                src_stream=src_stream,
                dst_stream=dst_stream,
                groups=groups,
                session=session,
                patterns=PatternTable(session.spans),
                src_base=src_cursor,
                dst_base=dst_cursor,
            )
        )
        # separator padding keeps fixed-size gathers inside one episode
        src_parts.extend((src_stream.data, np.zeros(_MAX_FFT, src_stream.data.dtype)))
        dst_parts.extend((dst_stream.data, np.zeros(_MAX_FFT, dst_stream.data.dtype)))
        src_cursor += len(src_stream.data) + _MAX_FFT
        dst_cursor += len(dst_stream.data) + _MAX_FFT
    _log.info("season: %d episodes ingested in %.2fs", len(jobs), time.time() - started)

    from sushi_tpu.align.batcher import pad_stream_for_device

    # quantized padding so compiled kernel shapes are reused across seasons
    src_host = np.concatenate(src_parts)
    dst_host = np.concatenate(dst_parts)
    src_dev = jnp.asarray(pad_stream_for_device(src_host))
    dst_dev = jnp.asarray(pad_stream_for_device(dst_host))

    by_session = {episode.session: episode for episode in episodes}

    def execute(tagged: List[Tuple[SearchSession, object]]):
        planned = []
        for session, request in tagged:
            episode = by_session[session]
            pat_start, pat_len = episode.patterns.bounds(request.group_idx, request.part)
            win_start, win_len, start_time = window_bounds(episode.dst_stream, request, pat_len)
            planned.append(
                PlannedSearch(
                    key=(session, request),
                    pat_start=pat_start + episode.src_base,
                    pat_len=pat_len,
                    win_start=win_start + episode.dst_base,
                    win_len=win_len,
                    start_time=start_time,
                    sample_rate=episode.dst_stream.sample_rate,
                )
            )
        raw = execute_planned(src_dev, dst_dev, planned, host_fallback=(src_host, dst_host))
        # translate absolute samples back to episode-local buffer indices
        # (the predictor's alignment table is episode-local)
        return {
            key: (score, found_time, abs_sample - by_session[key[0]].dst_base)
            for key, (score, found_time, abs_sample) in raw.items()
        }

    run_sessions([episode.session for episode in episodes], execute)

    for episode in episodes:
        events = episode.script.events
        heuristics.fix_near_borders(events)
        heuristics.smooth_events([e for e in events if not e.linked], smooth_radius)
        groups = heuristics.detect_groups(events)
        for group in groups:
            heuristics.average_shifts(group)
        for event in events:
            event.apply_shift()
        episode.script.save_to_file(episode.job.output)
        _log.info("season: wrote %s", episode.job.output)

    _log.info("season: synced %d episodes in %.2fs", len(jobs), time.time() - started)


def main(argv: Optional[List[str]] = None) -> None:
    parser = argparse.ArgumentParser(
        prog="sushi-tpu-season", description="Batch-sync a season of episodes on TPU"
    )
    parser.add_argument("jobs", help="JSON file with [{src,dst,script,output}, ...]")
    parser.add_argument("--sample-rate", default=12000, type=int, dest="sample_rate")
    parser.add_argument("--sample-type", default="uint8", choices=["float32", "uint8"], dest="sample_type")
    parser.add_argument("--window", default=10, type=int)
    parser.add_argument("--max-window", default=30, type=int, dest="max_window")
    parser.add_argument("--rewind-thresh", default=5, type=int, dest="rewind_thresh")
    parser.add_argument("--smooth-radius", default=3, type=int, dest="smooth_radius")
    parser.add_argument("-v", "--verbose", action="store_true")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.DEBUG if args.verbose else logging.INFO, format="%(message)s")
    try:
        sync_season(
            load_jobs(args.jobs),
            sample_rate=args.sample_rate,
            sample_type=args.sample_type,
            window=args.window,
            max_window=args.max_window,
            rewind_thresh=args.rewind_thresh,
            smooth_radius=args.smooth_radius,
        )
    except SushiError as error:
        logging.critical("%s", error)
        sys.exit(2)


if __name__ == "__main__":
    main()
