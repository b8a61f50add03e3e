#!/usr/bin/env python3
"""End-to-end regression harness.

The reference ships a JSON-configured runner that executes the CLI against
real media and compares the output frame-accurately against a hand-verified
"ideal" script, demanding an EXACT expected-failure count (both regressions
and silent behavior changes fail), plus WAV-load time/RSS budgets
(/root/reference/regression-tests.py:37-210).  This is the same mechanism,
self-contained: `--make-fixtures` synthesizes deterministic media with
known-true shifts so the harness runs out of the box on any machine.

Usage:
    python tools/regression.py --make-fixtures /tmp/sushi_regression
    python tools/regression.py /tmp/sushi_regression/regression.json
"""

from __future__ import annotations

import argparse
import json
import logging
import os
import resource
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def compare_scripts(ideal_path: str, output_path: str, fps: float) -> int:
    """Frame-accurate line diff; returns the number of mismatching events."""
    from sushi_tpu.media.timecodes import Timecodes
    from sushi_tpu.text.subs import load_script

    timecodes = Timecodes.cfr(fps)
    ideal = load_script(ideal_path).events
    produced = load_script(output_path).events
    if len(ideal) != len(produced):
        logging.error("event count mismatch: ideal %d vs output %d", len(ideal), len(produced))
        return abs(len(ideal) - len(produced)) + sum(1 for _ in ideal)
    failures = 0
    for idx, (a, b) in enumerate(zip(ideal, produced)):
        same_start = timecodes.get_frame_number(a.start) == timecodes.get_frame_number(b.start)
        same_end = timecodes.get_frame_number(a.end) == timecodes.get_frame_number(b.end)
        if not (same_start and same_end):
            failures += 1
            if failures <= 10:
                logging.info(
                    "  line %d: ideal %.3f-%.3f vs output %.3f-%.3f",
                    idx, a.start, a.end, b.start, b.end,
                )
    return failures


def run_test(test: dict, base: str, enforce_time_budget: bool = True) -> bool:
    name = test["name"]
    out_path = os.path.join(base, name + ".out" + os.path.splitext(test["script"])[1])
    cmd = [
        sys.executable, "-m", "sushi_tpu",
        "--src", os.path.join(base, test["src"]),
        "--dst", os.path.join(base, test["dst"]),
        "--script", os.path.join(base, test["script"]),
        "-o", out_path,
    ] + test.get("extra_args", [])
    logging.info("[%s] %s", name, " ".join(cmd[2:]))
    started = time.time()
    code = subprocess.call(cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    elapsed = time.time() - started
    if code != 0:
        logging.error("[%s] FAILED: exit code %d", name, code)
        return False
    failures = compare_scripts(os.path.join(base, test["ideal"]), out_path, test.get("fps", 23.976))
    expected = test.get("expected_errors", 0)
    if failures != expected:
        logging.error("[%s] FAILED: %d line errors, expected exactly %d", name, failures, expected)
        return False
    max_time = test.get("max_time")
    if max_time and elapsed > max_time:
        if enforce_time_budget:
            logging.error("[%s] FAILED: took %.2fs, budget %.2fs", name, elapsed, max_time)
            return False
        # concurrent tests oversubscribe the host; wall-clock budgets only
        # mean anything when tests run alone
        logging.info("[%s] over budget (%.2fs > %.2fs) but --jobs > 1; not enforced", name, elapsed, max_time)
    logging.info("[%s] ok: %d expected line errors, %.2fs", name, failures, elapsed)
    return True


def run_season_test(test: dict, base: str) -> bool:
    """Batch-mode regression: one season run over several jobs, each output
    compared frame-accurately against its ideal with an exact error count
    (the same contract as the single-episode tests)."""
    name = test["name"]
    jobs = []
    for i, job in enumerate(test["jobs"]):
        jobs.append(
            {
                "src": os.path.join(base, job["src"]),
                "dst": os.path.join(base, job["dst"]),
                "script": os.path.join(base, job["script"]),
                "output": os.path.join(base, "%s.out%d%s" % (
                    name, i, os.path.splitext(job["script"])[1])),
            }
        )
    jobs_path = os.path.join(base, name + ".jobs.json")
    with open(jobs_path, "w", encoding="utf-8") as handle:
        json.dump(jobs, handle)
    cmd = [sys.executable, "-m", "sushi_tpu.season", jobs_path] + test.get("extra_args", [])
    logging.info("[%s] %s", name, " ".join(cmd[2:]))
    started = time.time()
    code = subprocess.call(cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    elapsed = time.time() - started
    if code != 0:
        logging.error("[%s] FAILED: exit code %d", name, code)
        return False
    ok = True
    for job_cfg, job in zip(test["jobs"], jobs):
        failures = compare_scripts(
            os.path.join(base, job_cfg["ideal"]), job["output"], test.get("fps", 23.976)
        )
        expected = job_cfg.get("expected_errors", 0)
        if failures != expected:
            logging.error(
                "[%s] FAILED on %s: %d line errors, expected exactly %d",
                name, job_cfg["src"], failures, expected,
            )
            ok = False
    if ok:
        logging.info("[%s] ok: %d jobs, %.2fs", name, len(jobs), elapsed)
    return ok


def run_wav_test(test: dict, base: str) -> bool:
    from sushi_tpu.media.stream import AudioStream

    name = test["name"]
    usage_before = resource.getrusage(resource.RUSAGE_SELF)
    started = time.time()
    AudioStream(os.path.join(base, test["path"]), test.get("sample_rate", 12000), "uint8")
    elapsed = time.time() - started
    usage_after = resource.getrusage(resource.RUSAGE_SELF)
    cpu = (usage_after.ru_utime + usage_after.ru_stime) - (usage_before.ru_utime + usage_before.ru_stime)
    rss_delta_mb = (usage_after.ru_maxrss - usage_before.ru_maxrss) / 1024.0

    ok = True
    if test.get("max_time") and cpu > test["max_time"]:
        logging.error("[%s] FAILED: %.2fs CPU, budget %.2fs", name, cpu, test["max_time"])
        ok = False
    if test.get("max_memory") and rss_delta_mb > test["max_memory"]:
        logging.error("[%s] FAILED: %.1f MB RSS delta, budget %s MB", name, rss_delta_mb, test["max_memory"])
        ok = False
    if ok:
        logging.info("[%s] ok: %.2fs wall, %.2fs CPU, %.1f MB RSS delta", name, elapsed, cpu, rss_delta_mb)
    return ok


def make_fixtures(base: str) -> str:
    """Synthesize a default regression media set with known-true shifts."""
    import numpy as np

    from tests.fixtures import shift_audio, synth_episode, write_srt, write_ass, write_wav_int16
    from sushi_tpu.text.subs import load_script

    os.makedirs(base, exist_ok=True)
    rng = np.random.RandomState(99)
    events = []
    cursor = 2.0
    while cursor < 290.0:
        duration = 1.0 + rng.rand() * 2.5
        events.append((cursor, cursor + duration))
        cursor += duration + 0.7 + rng.rand() * 1.5

    shift = 2.505
    audio = synth_episode(300.0, events, seed=17)
    dst_audio = shift_audio(audio, shift)
    dst_audio = (dst_audio.astype(np.int32) + rng.randint(-150, 150, len(dst_audio))).astype(np.int16)
    write_wav_int16(os.path.join(base, "ep.src.wav"), audio)
    write_wav_int16(os.path.join(base, "ep.dst.wav"), dst_audio)

    # a second destination with a 15s insertion near 150s: exercises the
    # window-escalation/rewind recovery path end to end.  The insertion
    # lands mid-gap between two events so no line straddles the cut.
    gap_index = next(i for i, (s, _) in enumerate(events) if s > 150.0)
    cut_time = (events[gap_index - 1][1] + events[gap_index][0]) / 2.0
    jump_at = int((cut_time + shift) * 48000)
    insertion = rng.randint(-300, 300, 15 * 48000).astype(np.int16)
    jump_audio = np.concatenate([dst_audio[:jump_at], insertion, dst_audio[jump_at:]])
    write_wav_int16(os.path.join(base, "ep.jump.wav"), jump_audio)

    lines = [(s, e, "line %d" % i) for i, (s, e) in enumerate(events)]
    write_srt(os.path.join(base, "ep.srt"), lines)
    write_ass(os.path.join(base, "ep.ass"), lines)
    # ideals derive from the ROUND-TRIPPED inputs (scripts quantize times to
    # their format precision), shifted by the known-true amount
    for ext in (".srt", ".ass"):
        script = load_script(os.path.join(base, "ep" + ext))
        for event in script.events:
            event.set_shift(shift, 0.0)
            event.apply_shift()
        script.save_to_file(os.path.join(base, "ep.ideal" + ext))

    # jump ideal: +15s extra after the insertion point
    script = load_script(os.path.join(base, "ep.srt"))
    for event in script.events:
        event.set_shift(shift + (15.0 if event.start >= cut_time else 0.0), 0.0)
        event.apply_shift()
    script.save_to_file(os.path.join(base, "ep.jump.ideal.srt"))

    config = {
        "tests": [
            {"name": "srt-uniform-shift", "src": "ep.src.wav", "dst": "ep.dst.wav",
             "script": "ep.srt", "ideal": "ep.ideal.srt", "expected_errors": 0, "fps": 23.976},
            # 3 stable line "errors": ASS centisecond quantization puts
            # round(x)+shift vs round(x+shift) on opposite sides of a frame
            # boundary for 3 of the ~110 lines — the exact-count contract
            # (like the reference's expected_errors: 84) catches changes
            {"name": "ass-uniform-shift", "src": "ep.src.wav", "dst": "ep.dst.wav",
             "script": "ep.ass", "ideal": "ep.ideal.ass", "expected_errors": 3, "fps": 23.976},
            {"name": "srt-no-grouping", "src": "ep.src.wav", "dst": "ep.dst.wav",
             "script": "ep.srt", "ideal": "ep.ideal.srt", "expected_errors": 0,
             "fps": 23.976, "extra_args": ["--no-grouping"]},
            {"name": "srt-15s-jump-recovery", "src": "ep.src.wav", "dst": "ep.jump.wav",
             "script": "ep.srt", "ideal": "ep.jump.ideal.srt", "expected_errors": 0,
             "fps": 23.976},
        ],
        "season_tests": [
            # both fixture episodes as one batch: the uniform shift and the
            # 15s-jump recovery must survive merged device rounds
            {"name": "season-batch", "fps": 23.976, "jobs": [
                {"src": "ep.src.wav", "dst": "ep.dst.wav", "script": "ep.srt",
                 "ideal": "ep.ideal.srt", "expected_errors": 0},
                {"src": "ep.src.wav", "dst": "ep.jump.wav", "script": "ep.srt",
                 "ideal": "ep.jump.ideal.srt", "expected_errors": 0},
            ]},
        ],
        "wav_tests": [
            {"name": "wav-load-budget", "path": "ep.src.wav", "max_time": 0.7, "max_memory": 120}
        ],
    }
    config_path = os.path.join(base, "regression.json")
    with open(config_path, "w", encoding="utf-8") as handle:
        json.dump(config, handle, indent=2)
    logging.info("fixtures written to %s", base)
    return config_path


def main() -> None:
    parser = argparse.ArgumentParser(description="sushi-tpu end-to-end regression harness")
    parser.add_argument("config", nargs="?", help="regression.json path")
    parser.add_argument("--make-fixtures", metavar="DIR", help="synthesize default fixtures into DIR")
    parser.add_argument("--only", default=None, help="run only the named test")
    parser.add_argument(
        "--jobs", default=1, type=int,
        help="CLI tests to run concurrently (each is its own subprocess; "
        "per-test wall-time budgets are only meaningful at --jobs 1)",
    )
    args = parser.parse_args()

    logging.basicConfig(level=logging.INFO, format="%(message)s")

    config_path = args.config
    if args.make_fixtures:
        config_path = make_fixtures(args.make_fixtures)
        if not args.config:
            logging.info("now run: python tools/regression.py %s", config_path)
            return
    if not config_path:
        parser.error("config path required (or use --make-fixtures)")

    with open(config_path, encoding="utf-8") as handle:
        config = json.load(handle)
    base = os.path.dirname(os.path.abspath(config_path))

    failed = []
    selected = [t for t in config.get("tests", []) if not args.only or t["name"] == args.only]
    if args.jobs > 1 and len(selected) > 1:
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=args.jobs) as pool:
            outcomes = pool.map(lambda t: run_test(t, base, enforce_time_budget=False), selected)
            for test, ok in zip(selected, outcomes):
                if not ok:
                    failed.append(test["name"])
    else:
        for test in selected:
            if not run_test(test, base):
                failed.append(test["name"])
    for test in config.get("season_tests", []):
        if args.only and test["name"] != args.only:
            continue
        if not run_season_test(test, base):
            failed.append(test["name"])
    # wav perf/RSS budget tests measure this process's rusage: keep serial
    for test in config.get("wav_tests", []):
        if args.only and test["name"] != args.only:
            continue
        if not run_wav_test(test, base):
            failed.append(test["name"])

    if failed:
        logging.error("FAILED: %s", ", ".join(failed))
        sys.exit(1)
    logging.info("all regression tests passed")


if __name__ == "__main__":
    main()
