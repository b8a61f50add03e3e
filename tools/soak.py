#!/usr/bin/env python3
"""Randomized exactness soak: device search vs the sequential float64 oracle.

Generates random episodes — shifts (including negative and >window jumps),
noise levels, corrupted spans, truncated destinations — and checks that the
batched device search reproduces the sequential oracle run's decisions:
the same groups fail, and successful shifts agree within ±1 analysis
sample.  This is the strongest evidence that speculative-replay batching
preserves the reference algorithm's behavior on arbitrary inputs.

Usage: python tools/soak.py [iterations] [--seed N]
"""

from __future__ import annotations

import argparse
import logging
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def random_fixture(rng, tmp):
    from tests.fixtures import shift_audio, synth_episode, write_wav_int16

    duration = rng.uniform(20, 50)
    count = rng.randint(4, 12)
    starts = np.sort(rng.uniform(2.0, duration - 4.0, count))
    events = []
    for s in starts:
        if events and s < events[-1][1] + 0.4:
            continue
        events.append((float(s), float(s + rng.uniform(0.8, 2.5))))

    shift = float(rng.uniform(-3.0, 6.0))
    audio = synth_episode(duration, events, seed=rng.randint(1 << 30))
    dst_audio = shift_audio(audio, shift)
    # symmetric zero-mean noise at a randomized level
    noise_amp = int(rng.uniform(50, 400))
    dst_audio = (
        dst_audio.astype(np.int32) + rng.randint(-noise_amp, noise_amp + 1, len(dst_audio))
    ).astype(np.int16)

    # scenarios that cannot apply (too few events) relabel honestly so the
    # log never claims coverage that didn't run
    scenario = rng.choice(["plain", "corrupt", "truncated", "jump"])
    if scenario == "corrupt":
        if len(events) > 3:
            a, b = events[1][0], events[min(3, len(events) - 1)][1]
            lo = max(0, int((a + shift) * 48000))
            hi = min(len(dst_audio), int((b + shift) * 48000))
            dst_audio[lo:hi] = rng.randint(-9000, 9000, hi - lo)
        else:
            scenario = "plain"
    elif scenario == "truncated":
        dst_audio = dst_audio[: int(len(dst_audio) * rng.uniform(0.4, 0.8))]
    elif scenario == "jump":
        cut = int((events[len(events) // 2][0] - 1.0 + shift) * 48000)
        if len(events) > 4 and 0 < cut < len(dst_audio):
            gap = rng.randint(-300, 300, int(rng.uniform(11, 16) * 48000)).astype(np.int16)
            dst_audio = np.concatenate([dst_audio[:cut], gap, dst_audio[cut:]])
        else:
            scenario = "plain"

    src_path = os.path.join(tmp, "src.wav")
    dst_path = os.path.join(tmp, "dst.wav")
    write_wav_int16(src_path, audio)
    write_wav_int16(dst_path, dst_audio)
    return src_path, dst_path, events, shift, scenario


def run_iteration(rng, index):
    from sushi_tpu.align.batcher import DeviceMatcher, OracleMatcher, calculate_shifts, groups_to_spans
    from sushi_tpu.align import machine
    from sushi_tpu.media.stream import AudioStream
    from sushi_tpu.text.subs import ScriptEvent

    with tempfile.TemporaryDirectory() as tmp:
        src_path, dst_path, events, shift, scenario = random_fixture(rng, tmp)
        src = AudioStream(src_path, 12000, "uint8")
        dst = AudioStream(dst_path, 12000, "uint8")

        def groups():
            return [[ScriptEvent(i + 1, s, e, "x")] for i, (s, e) in enumerate(events)]

        spans = groups_to_spans(groups(), src)
        matcher = DeviceMatcher(src, dst, spans)

        # contract 1 (hard): speculative-replay batching produces exactly the
        # shifts a sequential drive of the same kernel produces (scores may
        # differ in the last ULP — XLA reduction order varies with the
        # compiled batch shape — but shifts, i.e. decisions, must be equal)
        device_sequential = machine.run_search(
            spans, dst.duration_seconds, dst.sample_rate,
            lambda request: matcher.execute([request])[request][:2], 10, 30, 5,
        )
        device_batched = calculate_shifts(src, dst, groups(), 10, 30, 5, matcher=matcher)

        mismatches = []
        for g, (bat, seq) in enumerate(zip(device_batched, device_sequential)):
            # shifts (the decisions) must be exactly equal — EXCEPT among
            # bit-identical score ties: in corrupted/garbage regions two
            # distant lags can score exactly equal (float64-verified), and
            # which one the coarse pass nominates depends on FFT rounding
            # that legitimately differs between compiled batch shapes.  A
            # tie-break between equal scores is not a decision; everything
            # with distinguishable scores must match exactly.
            score_gap = abs((bat.diff or 0) - (seq.diff or 0))
            exact_tie = (bat.diff or 0) == (seq.diff or 0)
            if (bat.shift != seq.shift and not exact_tie) or score_gap > 2e-4:
                mismatches.append((g, bat.shift, seq.shift, "batching"))

        # contract 2 (soft on plateaus): vs the float64 oracle, shifts agree
        # within ±1 sample OR the picks are equal-quality (score ties broken
        # arbitrarily by FFT noise in constant/pad regions — the oracle's own
        # pick is arbitrary there, as is cv2's)
        oracle = OracleMatcher(src, dst, spans)
        oracle_run = machine.run_search(
            spans, dst.duration_seconds, dst.sample_rate,
            lambda request: oracle.find(request)[:2], 10, 30, 5,
        )
        for g, (bat, orc) in enumerate(zip(device_batched, oracle_run)):
            if (bat.shift is None) != (orc.shift is None):
                mismatches.append((g, bat.shift, orc.shift, "fail-state"))
            elif bat.shift is not None and abs(bat.shift - orc.shift) > 1.5 / 12000.0:
                # equal-quality tie waiver: score agreement alone is not
                # enough — flushed (broken-range) groups inherit the
                # terminating search's diff, so two engines diverging in a
                # flushed range could carry near-equal scores with wildly
                # different shifts.  Only waive when the scores tie AND the
                # picks are either both poor matches (plateau/garbage, where
                # the oracle's own pick is arbitrary) or nearby
                score_tie = abs((bat.diff or 0) - (orc.diff or 0)) <= 1e-5
                both_poor = (bat.diff or 0) >= 0.2 and (orc.diff or 0) >= 0.2
                nearby = abs(bat.shift - orc.shift) <= 0.05
                if not (score_tie and (both_poor or nearby)):
                    mismatches.append((g, bat.shift, orc.shift, "value"))

        status = "OK" if not mismatches else "MISMATCH"
        logging.info(
            "soak %03d: %-9s shift=%+.3f events=%d -> %s",
            index, scenario, shift, len(events), status,
        )
        for g, a, b, kind in mismatches:
            logging.error("  group %d: batched=%s other=%s (%s)", g, a, b, kind)
        return not mismatches


def run_season_iteration(rng, index, episodes=3):
    """Merged-round season sync vs per-episode single runs, byte-compared.

    Episodes use 'plain' scenarios (randomized shifts, noise, event
    layouts) where every decision is score-distinguishable, so the season
    path — which merges chunks across episodes into different compiled
    batch shapes than a single run — must write byte-identical scripts.
    (Corrupted/garbage scenarios are excluded on purpose: bit-equal score
    ties there may legitimately break differently between batch shapes —
    the documented tie caveat — which the single-episode soak's
    score-tie waiver handles but a byte compare cannot.)"""
    from sushi_tpu import pipeline
    from sushi_tpu.cli import create_arg_parser
    from sushi_tpu.season import SeasonJob, sync_season
    from tests.fixtures import write_srt

    with tempfile.TemporaryDirectory() as tmp:
        jobs = []
        shifts = []
        for e in range(episodes):
            sub = os.path.join(tmp, "ep%d" % e)
            os.makedirs(sub)
            while True:  # draw until a plain scenario comes up
                src_path, dst_path, events, shift, scenario = random_fixture(rng, sub)
                if scenario == "plain":
                    break
            script = os.path.join(sub, "in.srt")
            write_srt(script, [(s, en, "ep%d line" % e) for (s, en) in events])
            jobs.append(SeasonJob(src_path, dst_path, script, os.path.join(sub, "season.srt")))
            shifts.append(shift)

        season_failures = sync_season(jobs, io_threads=episodes)
        parser = create_arg_parser()
        mismatches = []
        for e, job in enumerate(jobs):
            single_out = os.path.join(tmp, "single%d.srt" % e)
            args = parser.parse_args(
                ["--src", job.src, "--dst", job.dst, "--script", job.script, "-o", single_out]
            )
            single_error = None
            try:
                pipeline.run(args)
            except Exception as error:  # noqa: BLE001 — engines must agree on failure
                single_error = "%s: %s" % (type(error).__name__, error)
            season_error = next((msg for j, msg in season_failures if j is job), None)
            if (single_error is None) != (season_error is None):
                mismatches.append((e, "fail-state", single_error, season_error))
            elif single_error is None:
                with open(single_out, "rb") as handle:
                    single_bytes = handle.read()
                with open(job.output, "rb") as handle:
                    season_bytes = handle.read()
                if single_bytes != season_bytes:
                    mismatches.append((e, "bytes", len(single_bytes), len(season_bytes)))

        status = "OK" if not mismatches else "MISMATCH"
        logging.info(
            "season soak %03d: %d episodes shifts=[%s] -> %s",
            index, episodes, ", ".join("%+.2f" % s for s in shifts), status,
        )
        for entry in mismatches:
            logging.error("  episode mismatch: %r", entry)
        return not mismatches


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("iterations", nargs="?", type=int, default=10)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--season", action="store_true",
        help="soak the season batch path: merged rounds vs single runs, byte-compared",
    )
    parser.add_argument(
        "--artifact", metavar="PATH",
        help="append a JSON record of this run (mode/iterations/failures/seed/"
             "backend/wall) to PATH, so long soaks are evidence, not memory",
    )
    args = parser.parse_args()

    # standalone runs must persist compiles like bench-spawned runs do
    # (bench injects JAX_COMPILATION_CACHE_DIR; a cold standalone soak
    # otherwise recompiles every scenario shape — a 12-iteration run was
    # measured blowing a 10-minute budget on compiles alone)
    from sushi_tpu.utils import compile_cache

    compile_cache.enable()

    logging.basicConfig(level=logging.INFO, format="%(message)s")
    logging.getLogger("sushi_tpu").setLevel(logging.ERROR)

    rng = np.random.RandomState(args.seed)
    started = time.time()
    failures = 0
    for index in range(args.iterations):
        iteration = run_season_iteration if args.season else run_iteration
        if not iteration(rng, index):
            failures += 1
    wall = time.time() - started
    logging.info(
        "soak done: %d/%d ok in %.1fs", args.iterations - failures, args.iterations, wall,
    )
    if args.artifact:
        import json

        import jax

        record = {
            "mode": "season" if args.season else "single",
            "iterations": args.iterations,
            "failures": failures,
            "seed": args.seed,
            "backend": jax.default_backend(),
            "wall_seconds": round(wall, 1),
        }
        try:
            with open(args.artifact, "r", encoding="utf-8") as handle:
                records = json.load(handle)
        except (OSError, ValueError):
            records = []
        records.append(record)
        with open(args.artifact, "w", encoding="utf-8") as handle:
            json.dump(records, handle, indent=1)
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
