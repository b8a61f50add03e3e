#!/usr/bin/env python3
"""Headline benchmark: sync a 24-minute episode (~350 events).

Compares the full pipeline (WAV ingest + batched TPU shift search) against
the reference engine measured on this machine: the same state machine
driven sequentially by cv2.matchTemplate(TM_SQDIFF_NORMED) — i.e. exactly
the compute the reference performs per /root/reference/wav.py:185 and
sushi.py:400-508 (the reference itself is Python 2 and cannot run here).

Prints ONE JSON line:
  {"metric": ..., "value": <our sync seconds>, "unit": "s",
   "vs_baseline": <baseline_seconds / our_seconds>}

Details (fixture timings, per-stage breakdown, shift correctness) go to
stderr.  Fixture and baseline measurements are cached under /tmp.
"""

import json
import os
import sys
import time

BENCH_DIR = "/tmp/sushi_tpu_bench_v1"
EPISODE_SECONDS = 24 * 60
EVENT_COUNT = 350
TRUE_SHIFT = 3.417


def log(message: str) -> None:
    print(message, file=sys.stderr, flush=True)


def build_fixture():
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.fixtures import shift_audio, synth_episode, write_srt, write_wav_int16

    os.makedirs(BENCH_DIR, exist_ok=True)
    src_wav = os.path.join(BENCH_DIR, "src.wav")
    dst_wav = os.path.join(BENCH_DIR, "dst.wav")
    script = os.path.join(BENCH_DIR, "in.srt")
    # stale-fixture guard: regenerate when the generator constants change,
    # not merely when the files are missing
    manifest_path = os.path.join(BENCH_DIR, "fixture.json")
    manifest = {"episode_seconds": EPISODE_SECONDS, "events": EVENT_COUNT, "shift": TRUE_SHIFT}
    try:
        with open(manifest_path, encoding="utf-8") as handle:
            cached_manifest = json.load(handle)
    except (OSError, ValueError):
        cached_manifest = None
    if cached_manifest == manifest and all(
        os.path.exists(p) for p in (src_wav, dst_wav, script)
    ):
        return src_wav, dst_wav, script

    log("bench: generating 24-min fixture episode...")
    started = time.time()
    rng = np.random.RandomState(2024)
    events = []
    cursor = 2.0
    while len(events) < EVENT_COUNT:
        duration = 1.0 + rng.rand() * 2.5
        events.append((cursor, cursor + duration))
        cursor += duration + 0.5 + rng.rand() * 1.5
    scale = (EPISODE_SECONDS - 10.0) / cursor
    events = [(s * scale, e * scale) for s, e in events]

    audio = synth_episode(EPISODE_SECONDS, events, seed=7)
    dst_audio = shift_audio(audio, TRUE_SHIFT)
    dst_audio = (dst_audio.astype(np.int32) + rng.randint(-150, 150, len(dst_audio))).astype(np.int16)
    write_wav_int16(src_wav, audio)
    write_wav_int16(dst_wav, dst_audio)
    write_srt(script, [(s, e, "line %d" % i) for i, (s, e) in enumerate(events)])
    with open(manifest_path, "w", encoding="utf-8") as handle:
        json.dump(manifest, handle)
    log("bench: fixture built in %.1fs" % (time.time() - started))
    return src_wav, dst_wav, script


def _synth_pair(
    src_wav, dst_wav, script, *, seconds, count, shift, seed,
    jump=0.0, corrupt=False,
):
    """One (src, dst, script) fixture episode with a known true shift.

    ``jump`` > 0 inserts that many seconds of noise mid-episode (a sponsor
    bumper — the destination's shift jumps, forcing the state machine's
    rewind/escalation path, /root/reference/sushi.py:468-479); ``corrupt``
    replaces a few events' destination audio with garbage (no true match
    exists, exercising the verification splits)."""
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tests.fixtures import shift_audio, synth_episode, write_srt, write_wav_int16

    rng = np.random.RandomState(seed)
    events = []
    cursor = 2.0
    while len(events) < count:
        duration = 1.0 + rng.rand() * 2.0
        events.append((cursor, cursor + duration))
        cursor += duration + 0.6 + rng.rand() * 1.8
    scale = (seconds - 10.0) / cursor
    events = [(s * scale, e * scale) for s, e in events]

    audio = synth_episode(seconds, events, seed=seed + 1)
    dst_audio = shift_audio(audio, shift)
    dst_audio = (
        dst_audio.astype(np.int32) + rng.randint(-150, 150, len(dst_audio))
    ).astype(np.int16)
    if corrupt:
        # corrupted span over a few mid-episode events: replace with garbage
        lo = int((events[count // 4][0] + shift) * 48000)
        hi = int((events[count // 4 + 3][1] + shift) * 48000)
        dst_audio[lo:hi] = rng.randint(-9000, 9000, hi - lo)
    if jump > 0.0:
        # mid-episode jump: insert `jump` seconds of noise at the half point
        cut = int((events[count // 2][0] - 1.0 + shift) * 48000)
        gap = rng.randint(-300, 300, int(jump * 48000)).astype(np.int16)
        dst_audio = np.concatenate([dst_audio[:cut], gap, dst_audio[cut:]])

    write_wav_int16(src_wav, audio)
    write_wav_int16(dst_wav, dst_audio)
    write_srt(script, [(s, e, "line %d" % i) for i, (s, e) in enumerate(events)])


def build_pathological_fixture():
    """An ~8-min episode that forces the recovery path: a mid-episode +12 s
    shift jump (destination gains a noise insert, like a sponsor bumper)
    plus a corrupted span over several events.  The state machine must
    rewind and escalate window widths (/root/reference/sushi.py:468-479),
    so syncing it prices the multi-round RTT floor the clean headline
    episode (device_rounds=1) never pays.  Deterministic seed; same
    manifest-guard scheme as the main fixture."""
    os.makedirs(BENCH_DIR, exist_ok=True)
    src_wav = os.path.join(BENCH_DIR, "patho.src.wav")
    dst_wav = os.path.join(BENCH_DIR, "patho.dst.wav")
    script = os.path.join(BENCH_DIR, "patho.srt")
    manifest_path = os.path.join(BENCH_DIR, "patho.json")
    manifest = {"version": 2, "seconds": 480, "events": 90, "shift": 2.0, "jump": 12.0}
    try:
        with open(manifest_path, encoding="utf-8") as handle:
            cached = json.load(handle)
    except (OSError, ValueError):
        cached = None
    if cached == manifest and all(os.path.exists(p) for p in (src_wav, dst_wav, script)):
        return src_wav, dst_wav, script

    log("bench: generating pathological fixture episode...")
    _synth_pair(
        src_wav, dst_wav, script,
        seconds=480.0, count=90, shift=2.0, seed=99, jump=12.0, corrupt=True,
    )
    with open(manifest_path, "w", encoding="utf-8") as handle:
        json.dump(manifest, handle)
    return src_wav, dst_wav, script


def build_season_fixtures(episodes):
    """Per-episode VARIED season fixtures (8-min episodes): every episode
    gets its own seed, true shift, and event count, and two slots carry a
    mid-episode jump (multi-round rewind episodes), so the season
    throughput number covers heterogeneous bucket mixes, length outliers,
    and mid-season recovery — not 24 hardlinks of one friendly pair (the
    r4 season bench's weakness).  Built once behind a manifest guard
    (~30 s); returns [(src, dst, script), ...]."""
    os.makedirs(BENCH_DIR, exist_ok=True)
    manifest_path = os.path.join(BENCH_DIR, "season_fixtures.json")
    manifest = {"version": 1, "episodes": episodes, "seconds": 480}
    specs = []
    for i in range(episodes):
        specs.append({
            "src": os.path.join(BENCH_DIR, "season.ep%02d.src.wav" % i),
            "dst": os.path.join(BENCH_DIR, "season.ep%02d.dst.wav" % i),
            "script": os.path.join(BENCH_DIR, "season.ep%02d.srt" % i),
            "count": 55 + (i * 7) % 41,          # 55..95 events
            "shift": 0.8 + (i * 0.37) % 3.8,      # 0.8..4.6 s
            "seed": 1000 + i,
            "jump": 12.0 if i in (5, 17) else 0.0,
        })
    try:
        with open(manifest_path, encoding="utf-8") as handle:
            cached = json.load(handle)
    except (OSError, ValueError):
        cached = None
    if cached == manifest and all(
        os.path.exists(p) for s in specs for p in (s["src"], s["dst"], s["script"])
    ):
        return [(s["src"], s["dst"], s["script"]) for s in specs]

    log("bench: generating %d varied season fixture episodes..." % episodes)
    started = time.time()
    for s in specs:
        for p in (s["src"], s["dst"], s["script"]):
            # pre-r5 benches HARDLINKED these names to the main fixture;
            # writing through a stale link would corrupt src.wav in place
            if os.path.exists(p):
                os.unlink(p)
        _synth_pair(
            s["src"], s["dst"], s["script"],
            seconds=480.0, count=s["count"], shift=s["shift"], seed=s["seed"],
            jump=s["jump"],
        )
    with open(manifest_path, "w", encoding="utf-8") as handle:
        json.dump(manifest, handle)
    log("bench: season fixtures built in %.1fs" % (time.time() - started))
    return [(s["src"], s["dst"], s["script"]) for s in specs]


class _Args:
    """Pipeline args with CLI defaults (mirrors cli.create_arg_parser)."""

    window = 10
    max_window = 30
    rewind_thresh = 5
    grouping = True
    max_kf_distance = 2
    kf_mode = "all"
    smooth_radius = 3
    max_ts_duration = 1001.0 / 24000.0 * 10
    max_ts_distance = 1001.0 / 24000.0 * 10
    plot_path = None
    sample_type = "uint8"
    sample_rate = 12000
    src_audio_idx = None
    src_script_idx = None
    dst_audio_idx = None
    cleanup = False
    temp_dir = None
    chapters_file = None
    dst_keyframes = None
    src_keyframes = None
    dst_fps = None
    src_fps = None
    dst_timecodes = None
    src_timecodes = None
    output_script = None


def measure_ours(src_wav, dst_wav, script):
    from sushi_tpu.pipeline import run

    args = _Args()
    args.source = src_wav
    args.destination = dst_wav
    args.script_file = script
    args.output_script = os.path.join(BENCH_DIR, "out.tpu.srt")

    # warm-up run: compiles kernels (persisted to the XLA compile cache)
    log("bench: TPU pipeline warm-up run (compiles)...")
    t0 = time.time()
    run(args)
    cold = time.time() - t0
    log("bench: warm-up run %.2fs" % cold)

    t0 = time.time()
    run(args)
    warm = time.time() - t0
    log("bench: measured TPU pipeline run %.2fs (cold %.2fs)" % (warm, cold))
    return warm


class _RecordingMatcher:
    """DeviceMatcher proxy that records every executed request, so the
    bench can replay the episode's real device rounds for amortized
    device-execute timing."""

    def __init__(self, matcher):
        self._matcher = matcher
        self.requests = []

    def execute(self, requests):
        self.requests.extend(requests)
        return self._matcher.execute(requests)

    def global_alignment_estimate(self):
        return self._matcher.global_alignment_estimate()


def measure_stages(src_wav, dst_wav, script):
    """Instrumented stage breakdown through the production path (stream
    cache + upload memo + disk alignment seed), plus kernel telemetry."""
    from sushi_tpu.align.batcher import TELEMETRY, DeviceMatcher, calculate_shifts, groups_to_spans
    from sushi_tpu.align.groups import prepare_search_groups
    from sushi_tpu.media.stream_cache import load_pair
    from sushi_tpu.text.subs import SrtScript

    t0 = time.time()
    src, dst = load_pair(src_wav, dst_wav, 12000, "uint8")
    t_load = time.time() - t0
    doc = SrtScript.from_file(script)
    doc.sort_by_time()
    groups = prepare_search_groups(
        doc.events, source_duration=src.duration_seconds, chapter_times=[],
        max_ts_duration=_Args.max_ts_duration, max_ts_distance=_Args.max_ts_distance,
    )
    t0 = time.time()
    matcher = DeviceMatcher(src, dst, groups_to_spans(groups, src))
    t_init = time.time() - t0
    recorder = _RecordingMatcher(matcher)
    TELEMETRY.reset()
    t0 = time.time()
    calculate_shifts(src, dst, groups, 10, 30, 5, matcher=recorder)
    t_search = time.time() - t0
    telemetry = TELEMETRY.summary()
    log(
        "bench: stages — load %.2fs, device init/upload %.2fs, search %.2fs"
        % (t_load, t_init, t_search)
    )
    log("bench: search telemetry — %s" % json.dumps(telemetry))
    return t_search, telemetry, matcher, recorder.requests


def measure_search_execute(matcher, requests, attempts=3, repeat=9):
    """Device-execute vs wire split for the episode's REAL search rounds.

    Replays the recorded requests through the production path
    (execute_planned_multi) with each chunk dispatched once vs ``repeat``
    times before the single fetch.  The device queue serializes the
    repeats, so ``fetch(N) ≈ N*execute + wire``:
        execute ≈ (fetch_N - fetch_1) / (N - 1);  wire ≈ fetch_1 - execute.
    Returns (execute_seconds, wire_seconds, kernel_gflop) for the round.
    """
    from sushi_tpu.align.batcher import TELEMETRY, execute_planned_multi

    items = [(matcher.pair, matcher.plan(request, request)) for request in requests]

    def fetch_time(times):
        best = float("inf")
        gflop = 0.0
        for _ in range(attempts):
            TELEMETRY.reset()
            execute_planned_multi(items, repeat=times)
            stats = TELEMETRY.rounds[-1]
            best = min(best, stats.fetch_seconds)
            gflop = stats.kernel_gflop
        return best, gflop

    fetch_1, gflop = fetch_time(1)
    fetch_n, _ = fetch_time(repeat)
    execute = max((fetch_n - fetch_1) / (repeat - 1), 0.0)
    wire = max(fetch_1 - execute, 0.0)
    log(
        "bench: search round split — execute %.1fms, wire %.1fms "
        "(fetch_1 %.1fms, fetch_%d %.1fms, %.2f kernel GFLOP -> %.0f GFLOP/s)"
        % (execute * 1e3, wire * 1e3, fetch_1 * 1e3, repeat, fetch_n * 1e3,
           gflop, (gflop / execute if execute > 0 else 0.0))
    )
    return execute, wire, gflop


def measure_cold(src_wav, dst_wav, script, attempts=2):
    """Cold, never-seen-media sync — the workload the rebuild lost through
    round 4.  Fresh file copies each attempt defeat every memo (the stream
    cache, upload memo, and alignment seed key on path + mtime), so every
    attempt pays decode + device upload + whole-stream seed + search.
    Compiled executables stay warm, matching both the serving story (new
    episode arriving at a long-lived process) and the cv2 baseline's cold
    number (whose cv2/NumPy code is equally warm).

    Best-of-N with a per-attempt stage decomposition: the r4 driver and
    local runs measured 5.7 s vs 2.6 s for this SAME workload with no
    address for the gap — the decomposition (decode / upload / seed /
    search / other) says where a slow attempt's time went, and the min is
    the honest capability number under the same discipline the kernel
    timings use."""
    import shutil

    from sushi_tpu.align import batcher
    from sushi_tpu.media import stream_cache
    from sushi_tpu.pipeline import run

    best = float("inf")
    best_split = {}
    for attempt in range(attempts):
        cold_dir = os.path.join(BENCH_DIR, "cold")
        shutil.rmtree(cold_dir, ignore_errors=True)
        os.makedirs(cold_dir)
        src_c = os.path.join(cold_dir, "src.wav")
        dst_c = os.path.join(cold_dir, "dst.wav")
        script_c = os.path.join(cold_dir, "in.srt")
        shutil.copy(src_wav, src_c)
        shutil.copy(dst_wav, dst_c)
        shutil.copy(script, script_c)

        args = _Args()
        args.source = src_c
        args.destination = dst_c
        args.script_file = script_c
        args.output_script = os.path.join(cold_dir, "out.srt")
        stream_cache.reset_ingest_stats()
        batcher.SEED_STATS["seed_seconds"] = 0.0
        from sushi_tpu.align.batcher import TELEMETRY

        TELEMETRY.reset()
        t0 = time.time()
        run(args)
        cold = time.time() - t0
        ingest = dict(stream_cache.INGEST_STATS)
        search = TELEMETRY.summary()
        # decode+upload run on two overlapped threads, so their SUM can
        # exceed the wall clock they occupy — these fields are ADDRESSES
        # (where did time go), deliberately NOT a partition of the wall
        # clock; no residual field can close the balance under overlap
        split = {
            "cold_decode_seconds": round(ingest["decode_seconds"], 3),
            "cold_upload_seconds": round(ingest["upload_seconds"], 3),
            "cold_seed_seconds": round(batcher.SEED_STATS["seed_seconds"], 3),
            "cold_search_device_seconds": round(
                search["dispatch_seconds"] + search["fetch_seconds"], 3
            ),
        }
        log("bench: cold attempt %d: %.2fs %s" % (attempt, cold, json.dumps(split)))
        if cold < best:
            best = cold
            best_split = split
    log("bench: cold never-seen-media sync %.2fs (best of %d)" % (best, attempts))
    return best, best_split


def measure_pathological():
    """Sync the recovery-path fixture and report (seconds, rounds,
    requests).  Warm pass first (ingest/cache/upload memoized, like the
    headline number), then the measured pass — what's being priced is the
    multi-round search the rewind escalation forces, i.e. rounds x RTT +
    the wide-window buckets."""
    from sushi_tpu.align.batcher import TELEMETRY
    from sushi_tpu.pipeline import run

    src_wav, dst_wav, script = build_pathological_fixture()
    args = _Args()
    args.source = src_wav
    args.destination = dst_wav
    args.script_file = script
    args.output_script = os.path.join(BENCH_DIR, "patho.out.srt")

    run(args)  # warm: compiles + ingest memos
    TELEMETRY.reset()
    t0 = time.time()
    run(args)
    seconds = time.time() - t0
    summary = TELEMETRY.summary()
    log(
        "bench: pathological episode sync %.2fs in %d device rounds (%d requests; buckets %s)"
        % (seconds, summary["rounds"], summary["requests"], summary["buckets"])
    )
    return seconds, int(summary["rounds"]), int(summary["requests"])


def measure_season(episodes=12):
    """Season batch sync throughput (BASELINE config 5: episodes streamed
    through shared device rounds, demux/ingest pipelined on host threads).
    Episodes are per-episode VARIED 8-min fixtures (distinct seeds, shifts,
    event counts; two mid-season rewind episodes — see
    build_season_fixtures), so merged rounds see heterogeneous bucket
    mixes and a multi-round episode.  NOT comparable to pre-r5 season
    numbers, which timed 24 hardlinks of one identical 24-min pair.
    ffmpeg isn't installed on this box, so sources are WAV — the container
    demux flow is exercised by tests/test_season.py with a PATH-shimmed
    ffmpeg."""
    from sushi_tpu.season import SeasonJob, sync_season

    fixtures = build_season_fixtures(24)[:episodes]
    jobs = [
        SeasonJob(src_i, dst_i, script_i, os.path.join(BENCH_DIR, "season.out.%d.srt" % i))
        for i, (src_i, dst_i, script_i) in enumerate(fixtures)
    ]
    # best-of-N: the first call absorbs cold stream-cache ingest for all
    # episodes, the second the per-process executable warmup; the best
    # reflects steady-state serving.  Larger seasons get extra attempts —
    # their bigger merged rounds warm more executable shapes and were
    # measured still descending at attempt 3 (pre-r5 hardlink fixtures:
    # 2.55 → 2.35 → 2.09 → 1.60 s; the r5 VARIED fixtures show the same
    # pattern, e.g. 89.6 → 4.7 → 3.6 → 3.2 s with a cold-compile first
    # attempt).
    from sushi_tpu.align.batcher import TELEMETRY

    elapsed = float("inf")
    decomposition = {}
    for attempt in range(3 if episodes <= 12 else 5):
        TELEMETRY.reset()
        t0 = time.time()
        failures = sync_season(jobs, io_threads=8)
        took = time.time() - t0
        if failures:
            # a partial season must not publish an optimistic timing
            raise RuntimeError(
                "season bench: %d/%d episodes failed: %s"
                % (len(failures), episodes, "; ".join(m for _, m in failures))
            )
        log("bench: season attempt %d: %.2fs" % (attempt, took))
        if took < elapsed:
            elapsed = took
            # per-episode decomposition of the BEST attempt: device wire+
            # queue time (the single fetch per merged round) + dispatch
            # vs everything else (host replay, script I/O, threads)
            summary = TELEMETRY.summary()
            device = summary["dispatch_seconds"] + summary["fetch_seconds"]
            decomposition = {
                "device_seconds_per_episode": round(device / episodes, 4),
                "host_seconds_per_episode": round((took - device) / episodes, 4),
                "rounds": summary["rounds"],
            }
    log("bench: season %d episodes in %.2fs (%.1f episodes/min; per-episode %s)" % (
        episodes, elapsed, episodes * 60.0 / elapsed, json.dumps(decomposition)))
    return elapsed, decomposition


def measure_relay_rtt(probes=20):
    """Jit-dispatch + tiny fetch: the per-round latency floor this host
    pays to reach the chip.  On a local TPU this is ~0; through the tunnel
    it is tens of ms.  Reports (min, median, p90) over ``probes`` samples —
    the same statistical discipline the kernel timings use — so cross-round
    wall-clock comparisons can be read against relay weather: a fat
    median-minus-min spread means the relay was congested, not the code
    slower."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    bump = jax.jit(lambda v: v + 1)
    probe = jnp.zeros((2,), jnp.float32)
    np.asarray(bump(probe))
    samples = []
    for _ in range(probes):
        t0 = time.time()
        np.asarray(bump(probe))
        samples.append(time.time() - t0)
    samples.sort()
    stats = {
        "min": samples[0],
        "median": samples[len(samples) // 2],
        "p90": samples[min(int(len(samples) * 0.9), len(samples) - 1)],
    }
    log(
        "bench: device round-trip over %d probes: min %.1fms / median %.1fms / p90 %.1fms"
        % (probes, stats["min"] * 1e3, stats["median"] * 1e3, stats["p90"] * 1e3)
    )
    return stats


# TPU v5e (1 chip) public peaks, for honest utilization ratios
_V5E_PEAK_BF16_GFLOPS = 197_000.0
_V5E_PEAK_HBM_GBPS = 819.0


def measure_kernel_throughput(prior=None):
    """Device-only kernel throughput at the standard bucket shapes.

    Amortized over many queue-serialized dispatches with ONE final fetch,
    so relay wire latency divides out: ``elapsed ≈ N*execute + wire``.
    Reports searches/s, model GFLOP/s (vs the chip's bf16 peak) and the
    gather-traffic GB/s (vs HBM peak) — the honest denominators for any
    kernel-optimization claim.  Returns the per-shape dicts.

    ``prior``: per-shape dicts from an earlier call this run, min-merged
    (numerator AND denominator).  The relay-fronted chip drifts between
    multi-minute slow/fast states (the same full-kernel dispatch measured
    3.99 ms and 4.92 ms forty minutes apart, same process-fresh
    conditions), so back-to-back repeats all land in ONE state; sampling
    again ~20 bench-minutes later and taking the min is the same
    "contention only ever ADDS time" discipline applied across states.
    The second pass reuses the warm executables, so it costs seconds."""
    import numpy as np
    import jax.numpy as jnp

    from sushi_tpu.align.batcher import _coarse_pool_for, kernel_flop_model
    from sushi_tpu.ops import sqdiff

    rng = np.random.RandomState(0)
    stream = jnp.asarray(rng.randint(0, 256, 1 << 25).astype(np.uint8))
    shapes = []
    # pat_cap mirrors production: _fft_bucket(30000) = 32768 at every shape.
    # 393216 (3*2^17) is the bucket a 30s escalation window actually lands
    # in (360000 + pattern samples at 12 kHz); 524288 (pow2) is kept for
    # cross-round continuity with r3/r4 artifacts
    for fft_size, batch, pat_cap in (
        (98304, 64, 32768), (131072, 128, 32768),
        (393216, 128, 32768), (524288, 128, 32768),
    ):
        starts = rng.randint(0, 1 << 24, batch).astype(np.int32)
        bounds = jnp.asarray(np.array(
            [starts, np.full(batch, 30000, np.int32),
             starts, np.full(batch, fft_size - 4096, np.int32)], np.int32,
        ))
        # same coarse-pool decision the production batcher makes for this
        # bucket (full-rate at the flagship shapes, pooled wide buckets)
        coarse_pool = _coarse_pool_for(fft_size, 30000)

        def dispatch():
            # the production entry: one packed [4, B] bounds operand
            return sqdiff.match_from_streams_bounds(
                stream, stream, bounds,
                fft_size=fft_size, slice_len=fft_size, pat_cap=pat_cap,
                coarse_pool=coarse_pool,
            )

        np.asarray(dispatch())  # warm the executable
        # min over repeats: relay contention and queue jitter only ever ADD
        # time, so the min is the honest device-capability number (a single
        # sample was measured swinging the per-shape ratio by ~20% run to
        # run, which is noise, not kernel change)
        iterations = 12
        execute = float("inf")
        for _ in range(3):
            t0 = time.time()
            packed = None
            for _ in range(iterations):
                packed = dispatch()
            np.asarray(packed)  # one fetch drains the whole queue
            elapsed = time.time() - t0
            t0 = time.time()
            np.asarray(dispatch())
            single = time.time() - t0  # 1*execute + wire
            execute = min(execute, max((elapsed - single) / (iterations - 1), 1e-9))

        # the same single search through the reference's native engine
        # (cv2.matchTemplate, DFT path at these sizes) on this host — the
        # honest apples-to-apples KERNEL ratio: per-search device time vs
        # per-search cv2 time at identical pattern/window sizes.  Same
        # discipline on the denominator: min over samples, so host load
        # spikes can't flatter the ratio either way.
        import cv2

        win_np = (
            np.asarray(stream[: fft_size - 4096]).astype(np.float32).reshape(1, -1) / 255.0
        )
        pat_np = win_np[:, 5000 : 5000 + 30000].copy()
        cv2.matchTemplate(win_np, pat_np, cv2.TM_SQDIFF_NORMED)  # warm
        cv2_per_search = float("inf")
        for _ in range(5):
            t0 = time.time()
            cv2.matchTemplate(win_np, pat_np, cv2.TM_SQDIFF_NORMED)
            cv2_per_search = min(cv2_per_search, time.time() - t0)

        if prior is not None:
            for entry in prior:
                if entry["fft_size"] == fft_size and entry["batch"] == batch:
                    execute = min(execute, entry["execute_ms"] / 1e3)
                    cv2_per_search = min(cv2_per_search, entry["cv2_ms_per_search"] / 1e3)

        gflop = batch * kernel_flop_model(fft_size, pat_cap, coarse_pool=coarse_pool or 1) / 1e9
        gathered_gb = batch * fft_size * 2 * 4 / 1e9
        shapes.append(
            {
                "fft_size": fft_size,
                "batch": batch,
                "coarse_pool": coarse_pool or 1,
                "execute_ms": round(execute * 1e3, 2),
                "searches_per_second": round(batch / execute, 0),
                "gflops": round(gflop / execute, 1),
                "pct_of_bf16_peak": round(100.0 * gflop / execute / _V5E_PEAK_BF16_GFLOPS, 2),
                "gather_gbps": round(gathered_gb / execute, 1),
                "pct_of_hbm_peak": round(100.0 * gathered_gb / execute / _V5E_PEAK_HBM_GBPS, 1),
                "cv2_ms_per_search": round(cv2_per_search * 1e3, 2),
                "vs_cv2_per_search": round(cv2_per_search / (execute / batch), 1),
            }
        )
        log("bench: kernel-only %s" % json.dumps(shapes[-1]))
    return shapes


def run_season_soak(iterations=3):
    """Season batch soak (tools/soak.py --season) as a driver-visible
    artifact: merged-round season syncs must write byte-identical scripts
    to per-episode single runs on randomized plain-scenario episodes.
    Three iterations x 3 episodes (each byte-compared against 3 single
    runs) bounds the bench cost; longer season soaks run standalone."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    for attempt in range(2):
        t0 = time.time()
        try:
            result = subprocess.run(
                [sys.executable, "tools/soak.py", str(iterations), "--season"],
                cwd=repo, capture_output=True, text=True, timeout=1800,
            )
            output = (result.stderr or "") + (result.stdout or "")
            if result.returncode == 0:
                passed = True
            elif "soak done:" in output:
                passed = False  # ran to completion, byte-compare failed: real
            else:
                passed = None  # crashed before one pass: infra, retriable
            tail = output.strip().splitlines()[-(8 if passed is None else 2):]
        except (subprocess.SubprocessError, OSError) as error:
            passed, tail = None, [str(error)]
        for line in tail:
            log("bench: season soak | " + line)
        log(
            "bench: season soak (%d iters) %s in %.1fs"
            % (iterations, {True: "PASSED", False: "FAILED", None: "DID NOT RUN"}[passed],
               time.time() - t0)
        )
        if passed is not None:
            return passed, iterations
        if attempt == 0:
            log("bench: season soak retrying (crash is infra, not a byte-compare verdict)")
    return None, 0


def run_soak(iterations=12):
    """Randomized exactness soak (tools/soak.py) as a driver-visible
    artifact: batched decisions vs the sequential float64 oracle across
    corruption/jump/truncation scenarios, ON THE CHIP.  12 iterations
    (~20s each warm: every iteration drives the kernel batched AND
    one-request-at-a-time AND against the host oracle) keeps the bench
    under budget; longer soaks run standalone (``python tools/soak.py
    100``).  A fresh kernel change empties the persistent compile cache
    and a cold soak can blow the timeout — but everything compiled
    before the kill IS cached, so the timeout path retries once at
    fewer iterations against a now-warm cache rather than reporting
    nothing.  Returns (passed, iterations_run) — (None, 0) only when
    both attempts failed to complete."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    for attempt_iters, timeout in ((iterations, 2400), (4, 1500)):
        t0 = time.time()
        try:
            result = subprocess.run(
                [sys.executable, "tools/soak.py", str(attempt_iters)],
                cwd=repo, capture_output=True, text=True, timeout=timeout,
            )
            output = (result.stderr or "") + (result.stdout or "")
            if result.returncode == 0:
                passed = True
            elif "soak done:" in output:
                # the soak RAN to completion and found decision mismatches —
                # a real kernel-parity failure, never retried away
                passed = False
            else:
                # died before finishing a single pass (relay outage, backend
                # crash): an infrastructure failure, not a parity verdict —
                # retriable exactly like the timeout path (one observed case:
                # a JAX backend error 19s in, while an immediate rerun of the
                # identical code passed)
                passed = None
            tail = output.strip().splitlines()[-(8 if passed is None else 2):]
        except (subprocess.SubprocessError, OSError) as error:
            passed, tail = None, [str(error)]
        for line in tail:
            log("bench: soak | " + line)
        log(
            "bench: soak (%d iters) %s in %.1fs"
            % (attempt_iters,
               {True: "PASSED", False: "FAILED", None: "DID NOT RUN"}[passed],
               time.time() - t0)
        )
        if passed is not None:
            return passed, attempt_iters
        if attempt_iters != 4:
            log("bench: soak retrying (crash/timeout is infra, not a parity verdict)")
    return None, 0


def run_chip_kernel_check():
    """Compiled-vs-XLA parity of the Pallas rescore on the real chip (the
    unit tests run it interpreted on CPU, which cannot see Mosaic lowering
    bugs — e.g. the (1, n) roll kernel that miscompiled at 3-smooth n).
    Returns True/False for a real chip run, None when there is no TPU to
    check (so the JSON cannot report a green parity signal for a check
    that never executed)."""
    import jax

    if jax.default_backend() != "tpu":
        log("bench: chip kernel parity check SKIPPED (no TPU backend)")
        return None
    from tools.chip_kernel_check import main as chip_check

    ok = chip_check() == 0
    log("bench: chip kernel parity check %s" % ("PASSED" if ok else "FAILED"))
    return ok


def run_regression():
    """Run the end-to-end regression harness (tools/regression.py) and
    report pass/fail — the bench fails loudly on budget or expected-error
    drift, mirroring the reference's regression-tests.py gate.

    Runs in scrubbed-env CPU subprocesses: the harness spawns one fresh CLI
    process per test, and cold-process chip attach through the tunneled
    relay costs tens of seconds each — the CPU backend measures the same
    decision logic without that noise."""
    import subprocess

    repo = os.path.dirname(os.path.abspath(__file__))
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env.pop("AXON_LOOPBACK_RELAY", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", os.path.join(repo, ".jax_cache"))
    # version-suffixed: bump when make_fixtures' config schema changes, or
    # a cached regression.json from an older round silently skips new tests
    base = "/tmp/sushi_tpu_regression_v2"
    t0 = time.time()
    try:
        if not os.path.exists(os.path.join(base, "regression.json")):
            subprocess.run(
                [sys.executable, "tools/regression.py", "--make-fixtures", base],
                env=env, cwd=repo, capture_output=True, text=True, timeout=600, check=True,
            )
        result = subprocess.run(
            [sys.executable, "tools/regression.py", os.path.join(base, "regression.json"),
             "--jobs", "4"],
            env=env, cwd=repo, capture_output=True, text=True, timeout=1200,
        )
        passed = result.returncode == 0
        tail = (result.stderr or result.stdout).strip().splitlines()[-8:]
    except (subprocess.SubprocessError, OSError) as error:
        passed, tail = False, [str(error)]
    seconds = time.time() - t0
    for line in tail:
        log("bench: regression | " + line)
    log("bench: regression harness %s in %.1fs" % ("PASSED" if passed else "FAILED", seconds))
    return passed, seconds


def measure_baseline(src_wav, dst_wav, script):
    """Reference engine: sequential cv2.matchTemplate through the same
    state machine and heuristics.  Measured fresh on every bench run so
    both engines see the same machine state (this host's throughput
    drifts considerably over hours).

    Returns (cold_seconds, warm_seconds).  The cold pass pays fresh WAV
    ingest like a first-ever sync; the warm pass reuses the already-loaded
    streams, matching what the TPU side's warm number pays (its stream
    cache makes repeat loads ~free) — comparing our warm run against a
    baseline that re-ingests every time would inflate the headline ratio."""
    import cv2
    import numpy as np

    from sushi_tpu.align import machine
    from sushi_tpu.align.batcher import PatternTable, groups_to_spans, stream_to_f32, window_bounds
    from sushi_tpu.align.groups import prepare_search_groups
    from sushi_tpu.media.stream import AudioStream
    from sushi_tpu.text.subs import SrtScript

    log("bench: measuring cv2 sequential baseline...")
    t0 = time.time()
    src_stream = AudioStream(src_wav, 12000, "uint8")
    dst_stream = AudioStream(dst_wav, 12000, "uint8")
    doc = SrtScript.from_file(script)
    doc.sort_by_time()
    groups = prepare_search_groups(
        doc.events,
        source_duration=src_stream.duration_seconds,
        chapter_times=[],
        max_ts_duration=_Args.max_ts_duration,
        max_ts_distance=_Args.max_ts_distance,
    )
    spans = groups_to_spans(groups, src_stream)
    patterns = PatternTable(spans)
    src_f32 = stream_to_f32(src_stream)
    dst_f32 = stream_to_f32(dst_stream)

    calls = [0]

    def cv2_find(request):
        calls[0] += 1
        pat_start, pat_len = patterns.bounds(request.group_idx, request.part)
        win_start, win_len, start_time = window_bounds(dst_stream, request, pat_len)
        pattern = src_f32[pat_start : pat_start + pat_len].reshape(1, -1)
        window = dst_f32[win_start : win_start + win_len].reshape(1, -1)
        scores = cv2.matchTemplate(window, pattern, cv2.TM_SQDIFF_NORMED)[0]
        idx = int(scores.argmin())
        return float(scores[idx]), start_time + idx / float(dst_stream.sample_rate)

    results = machine.run_search(
        spans, dst_stream.duration_seconds, dst_stream.sample_rate, cv2_find, 10, 30, 5
    )
    machine.apply_group_results(groups, results)
    for event in doc.events:
        event.apply_shift()
    doc.save_to_file(os.path.join(BENCH_DIR, "out.cv2.srt"))
    cold = time.time() - t0

    # warm pass: same full per-sync work (script parse, grouping, search,
    # shift apply, save) minus the ingest both engines memoize
    t0 = time.time()
    doc2 = SrtScript.from_file(script)
    doc2.sort_by_time()
    groups2 = prepare_search_groups(
        doc2.events,
        source_duration=src_stream.duration_seconds,
        chapter_times=[],
        max_ts_duration=_Args.max_ts_duration,
        max_ts_distance=_Args.max_ts_distance,
    )
    results2 = machine.run_search(
        spans, dst_stream.duration_seconds, dst_stream.sample_rate, cv2_find, 10, 30, 5
    )
    machine.apply_group_results(groups2, results2)
    for event in doc2.events:
        event.apply_shift()
    doc2.save_to_file(os.path.join(BENCH_DIR, "out.cv2.srt"))
    warm = time.time() - t0

    shifts = [r.shift for r in results if r.shift is not None]
    log(
        "bench: baseline cold %.2fs / warm %.2fs (%d matchTemplate calls, median shift %.4f)"
        % (cold, warm, calls[0], float(np.median(shifts)))
    )
    return cold, warm


def check_output_correctness():
    from sushi_tpu.text.subs import SrtScript

    ours = SrtScript.from_file(os.path.join(BENCH_DIR, "out.tpu.srt"))
    base = SrtScript.from_file(os.path.join(BENCH_DIR, "in.srt"))
    worst = 0.0
    for shifted, original in zip(ours.events, base.events):
        worst = max(worst, abs(shifted.start - original.start - TRUE_SHIFT))
    log("bench: worst per-line shift error vs truth: %.4fs" % worst)
    return worst


def wait_for_chip(max_wait_seconds=1200):
    """Bounded wait for a reachable accelerator.

    The tunneled relay this host uses has transient outages during which a
    jax op neither completes nor errors — it blocks forever.  Probing in a
    killable subprocess turns that silent hang into a bounded retry loop,
    giving the relay time to recover before the measurements start."""
    import subprocess

    probe = (
        "import jax, jax.numpy as jnp, numpy as np;"
        "np.asarray(jax.jit(lambda v: v + 1)(jnp.zeros(2)));"
        "print(jax.devices()[0].platform)"
    )
    deadline = time.time() + max_wait_seconds
    attempt = 0
    while True:
        attempt += 1
        try:
            result = subprocess.run(
                [sys.executable, "-c", probe], capture_output=True, text=True, timeout=150
            )
            if result.returncode == 0:
                platform = result.stdout.strip().splitlines()[-1]
                if attempt > 1:
                    log("bench: chip probe recovered on attempt %d" % attempt)
                return platform
            reason = (result.stderr or "").strip().splitlines()[-1:] or ["exit %d" % result.returncode]
            log("bench: chip probe failed (%s)" % reason[0][:120])
        except subprocess.TimeoutExpired:
            log("bench: chip probe hung >150s (relay outage?)")
        if time.time() >= deadline:
            log("bench: chip still unreachable after %ds; proceeding anyway" % max_wait_seconds)
            return None
        time.sleep(30)


def main():
    import logging

    logging.getLogger().setLevel(logging.ERROR)  # keep stderr usable
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if wait_for_chip(max_wait_seconds=7200) is None:
        # proceeding would hang forever on the first device op (relay ops
        # neither complete nor error during an outage) — emit an honest
        # failure line the driver can record instead
        print(json.dumps({
            "metric": "24min episode sync wall-clock (350 events, lower is better; "
                      "vs_baseline = warm cv2-sequential speedup, ingest memoized on both sides)",
            "value": None, "unit": "s", "vs_baseline": None,
            "error": "accelerator unreachable for 2h (relay outage); no measurements taken",
        }))
        sys.exit(1)
    from sushi_tpu.utils.device import ensure_accelerator

    platform = ensure_accelerator()
    log("bench: running on platform %r" % platform)
    src_wav, dst_wav, script = build_fixture()

    ours = measure_ours(src_wav, dst_wav, script)
    worst = check_output_correctness()
    cold_seconds, cold_split = measure_cold(src_wav, dst_wav, script)
    kernel_parity = run_chip_kernel_check()
    relay_rtt = measure_relay_rtt()
    kernel_shapes = measure_kernel_throughput()
    search_seconds, telemetry, matcher, requests = measure_stages(src_wav, dst_wav, script)
    execute_seconds, wire_seconds, round_gflop = measure_search_execute(matcher, requests)
    patho_seconds, patho_rounds, patho_requests = measure_pathological()
    season_seconds, _ = measure_season(episodes=12)
    season24_seconds, season_split = measure_season(episodes=24)
    # per-episode cost = the 24-episode run's own MEAN (device + host
    # shares sum to t24/24 by construction — an honest mean, not a
    # marginal).  The previous (t24 - t12)/12 "marginal" cross-run
    # subtraction of two noisy best-of-N numbers was noise-dominated
    # (r3: 0.057, r4 driver: 0.086, r4 local: 0.034 while both underlying
    # times improved) and is retired; the informative part of the
    # decomposition is the device/host SPLIT, not the sum
    season_per_episode = (
        season_split.get("device_seconds_per_episode", 0.0)
        + season_split.get("host_seconds_per_episode", 0.0)
    )
    log(
        "bench: season per-episode mean %.3fs (24-ep run telemetry; 12 eps %.2fs, 24 eps %.2fs)"
        % (season_per_episode, season_seconds, season24_seconds)
    )
    soak_passed, soak_iterations = run_soak()
    season_soak_passed, season_soak_iterations = run_season_soak()
    regression_passed, regression_seconds = run_regression()
    baseline_cold, baseline_warm = measure_baseline(src_wav, dst_wav, script)
    # second kernel sample ~20 bench-minutes after the first, min-merged:
    # the chip's multi-minute slow/fast drift states can't both cover the
    # whole run, and the warm executables make this pass cost seconds
    log("bench: kernel-throughput re-sweep (late chip state, min-merged)")
    kernel_shapes = measure_kernel_throughput(prior=kernel_shapes)

    best_kernel = max(kernel_shapes, key=lambda s: s["gflops"]) if kernel_shapes else {}
    result = {
        "metric": "24min episode sync wall-clock (350 events, lower is better; "
        "vs_baseline = warm cv2-sequential speedup, ingest memoized on both sides)",
        "value": round(ours, 3),
        "unit": "s",
        "vs_baseline": round(baseline_warm / ours, 2),
        "events_per_second": round(EVENT_COUNT / ours, 1),
        "baseline_seconds": round(baseline_warm, 3),
        "baseline_cold_ingest_seconds": round(baseline_cold, 3),
        "cold_sync_seconds": round(cold_seconds, 3),
        "cold_vs_baseline": round(baseline_cold / cold_seconds, 2),
        **cold_split,
        "worst_line_error_seconds": round(worst, 4),
        "search_stage_seconds": round(search_seconds, 3),
        "pathological_sync_seconds": round(patho_seconds, 3),
        "pathological_rounds": patho_rounds,
        "pathological_requests": patho_requests,
        "season_12_episodes_seconds": round(season_seconds, 3),
        "season_episodes_per_minute": round(12 * 60.0 / season_seconds, 1),
        "season_24_episodes_seconds": round(season24_seconds, 3),
        "season_24_episodes_per_minute": round(24 * 60.0 / season24_seconds, 1),
        # within-run number: the best 24-ep attempt's own mean per-episode
        # cost (device + host shares; NOT a cross-run subtraction, and
        # deliberately not called "marginal" — it is t24/24)
        "season_seconds_per_episode": round(season_per_episode, 4),
        "season_device_seconds_per_episode": season_split.get("device_seconds_per_episode"),
        "season_host_seconds_per_episode": season_split.get("host_seconds_per_episode"),
        "regression_passed": regression_passed,
        "chip_kernel_parity": kernel_parity,
        "soak_passed": soak_passed,
        "soak_iterations": soak_iterations,
        "season_soak_passed": season_soak_passed,
        "season_soak_iterations": season_soak_iterations,
        "device_rounds": telemetry["rounds"],
        "device_requests": telemetry["requests"],
        "device_dispatch_seconds": telemetry["dispatch_seconds"],
        "device_fetch_seconds": telemetry["fetch_seconds"],
        # honest split of the search round: device-execute vs relay wire
        # (execute_planned_multi(repeat=N) amortization, see
        # measure_search_execute)
        "search_device_execute_seconds": round(execute_seconds, 4),
        "search_wire_seconds": round(wire_seconds, 4),
        "search_kernel_gflop": round(round_gflop, 2),
        "search_kernel_gflops": round(round_gflop / execute_seconds, 1)
        if execute_seconds > 0 else 0.0,
        "relay_rtt_seconds": round(relay_rtt["median"], 4),
        "relay_rtt_min_seconds": round(relay_rtt["min"], 4),
        "relay_rtt_p90_seconds": round(relay_rtt["p90"], 4),
        "device_gathered_gb": telemetry["gathered_gb"],
        # kernel-only microbench at the standard bucket shapes
        "kernel_shapes": kernel_shapes,
        "kernel_best_gflops": best_kernel.get("gflops", 0.0),
        "kernel_best_pct_of_bf16_peak": best_kernel.get("pct_of_bf16_peak", 0.0),
        "kernel_best_searches_per_second": best_kernel.get("searches_per_second", 0.0),
        "kernel_vs_cv2_per_search": max(
            (s.get("vs_cv2_per_search", 0.0) for s in kernel_shapes), default=0.0
        ),
    }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
