#!/usr/bin/env python3
"""Compiled-kernel parity check on real TPU hardware.

The unit tests exercise the Pallas rescore in *interpret* mode (they run on
the CPU backend), which executes the kernel's semantics but not Mosaic's
compiled lowering.  This check runs the actual compiled kernel on the chip
against the XLA formulation across power-of-two AND 3-smooth row lengths —
the class of bug it exists to catch is a lowering that silently
miscomputes at some shape (the original (1, n) full-row-roll kernel did
exactly that at non-pow2 n, which unit tests could not see).

Run directly on a TPU host: ``python tools/chip_kernel_check.py``.
Exits non-zero on any mismatch.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from sushi_tpu.ops.pallas_ssd import rescore_candidates_pallas
    from sushi_tpu.ops.sqdiff import _rescore_candidates
    from sushi_tpu.utils import compile_cache

    # standalone runs must persist compiles like bench-spawned runs do
    # (bench injects JAX_COMPILATION_CACHE_DIR; a cold standalone run
    # otherwise spends many minutes recompiling every checked shape)
    compile_cache.enable(os.path.join(REPO, ".jax_cache"))

    backend = jax.default_backend()
    if backend != "tpu":
        print(f"chip_kernel_check: backend is {backend!r}, nothing to check", file=sys.stderr)
        return 0

    rng = np.random.RandomState(8)
    cases = [
        (4096, 500, None),
        (24576, 18000, None),       # 3-smooth, probe-refine shape
        (98304, 30000, 49152),      # 3-smooth, the dominant episode bucket
        (131072, 42000, 49152),
        (98304, 30000, None),
        # pat_cap=None at large n: the auto path's VMEM-worst configs
        # (these are exactly what bench.py's kernel-throughput measurement
        # and match_padded callers execute) — MAX_PALLAS_ROW is sized by
        # these compiling and matching on real hardware
        (131072, 42000, None),
        (524288, 100000, None),
        (524288, 100000, 131072),
    ]
    failures = 0
    for n, lp, pat_cap in cases:
        batch, k = 4, 18
        patterns = np.zeros((batch, n), np.float32)
        windows = np.zeros((batch, n), np.float32)
        pat_lens = np.full(batch, lp, np.int32)
        lags = np.zeros((batch, k), np.int32)
        for b in range(batch):
            win_len = n - 256
            windows[b, :win_len] = rng.rand(win_len)
            patterns[b, :lp] = rng.rand(lp)
            lags[b] = np.concatenate(
                [rng.randint(0, win_len - lp, k - 1), [win_len - lp]]
            )
        args = (
            jnp.asarray(patterns),
            jnp.asarray(pat_lens),
            jnp.asarray(windows),
            jnp.asarray(lags),
        )
        ref_num, ref_energy = jax.jit(_rescore_candidates)(*args)
        pal_num, pal_energy = jax.jit(
            lambda *a: rescore_candidates_pallas(*a, pat_cap, interpret=False)
        )(*args)
        en = np.abs(np.asarray(pal_num) - np.asarray(ref_num)) / (
            np.abs(np.asarray(ref_num)) + 1e-9
        )
        ee = np.abs(np.asarray(pal_energy) - np.asarray(ref_energy)) / (
            np.abs(np.asarray(ref_energy)) + 1e-9
        )
        ok = en.max() < 1e-5 and ee.max() < 1e-5
        failures += 0 if ok else 1
        print(
            "chip_kernel_check: n=%d lp=%d cap=%s rel-err num %.2e energy %.2e %s"
            % (n, lp, pat_cap, en.max(), ee.max(), "ok" if ok else "MISMATCH"),
            file=sys.stderr,
        )

    # the TILED fused coarse-post kernel (pallas_coarse._kernel_tiled) at
    # the wide-window escalation shapes it exists for: compiled on chip,
    # its candidate nominations must yield the XLA formulation's decisions
    # through the exact rescore (the same contract the interpret-mode unit
    # tests pin at small shapes; Mosaic lowering only shows up here)
    from sushi_tpu.ops import pallas_coarse, sqdiff

    for n, pat_cap in ((524288, 65536), (786432, 32768)):
        if not pallas_coarse.coarse_post_supported(n, pat_cap):
            print(
                "chip_kernel_check: coarse-post n=%d cap=%d UNSUPPORTED (budget gate)"
                % (n, pat_cap), file=sys.stderr,
            )
            failures += 1
            continue
        batch = 4
        patterns = np.zeros((batch, n), np.float32)
        windows = np.zeros((batch, n), np.float32)
        pat_lens = np.zeros(batch, np.int32)
        win_lens = np.zeros(batch, np.int32)
        for b in range(batch):
            lp = rng.randint(pat_cap // 2, pat_cap)
            wl = rng.randint(n - n // 4, n)
            base = rng.rand(wl).astype(np.float32)
            true_lag = rng.randint(0, wl - lp)
            patterns[b, :lp] = base[true_lag : true_lag + lp] + rng.randn(lp).astype(np.float32) * 0.01
            windows[b, :wl] = base
            pat_lens[b], win_lens[b] = lp, wl
        args = (
            jnp.asarray(patterns), jnp.asarray(pat_lens),
            jnp.asarray(windows), jnp.asarray(win_lens),
        )
        cands_f = jax.jit(
            lambda p, pl_, w, wl_: sqdiff._coarse_candidates_auto(
                p, pl_, w, wl_, n, 16, pat_cap, force_fused=True
            )
        )(*args)
        cands_x = jax.jit(
            lambda p, pl_, w, wl_: sqdiff._coarse_candidates_auto(
                p, pl_, w, wl_, n, 16, pat_cap, force_fused=False
            )
        )(*args)
        sel = jax.jit(
            lambda p, pl_, w, wl_, c: sqdiff._exact_select(p, pl_, w, wl_, c, pat_cap)
        )
        s_f, l_f = sel(*args, cands_f)
        s_x, l_x = sel(*args, cands_x)
        lags_ok = np.array_equal(np.asarray(l_f), np.asarray(l_x))
        score_gap = float(np.abs(np.asarray(s_f) - np.asarray(s_x)).max())
        ok = lags_ok and score_gap < 1e-6
        failures += 0 if ok else 1
        print(
            "chip_kernel_check: tiled coarse-post n=%d cap=%d lags %s score-gap %.2e %s"
            % (n, pat_cap, [int(v) for v in np.asarray(l_f)], score_gap,
               "ok" if ok else "MISMATCH"),
            file=sys.stderr,
        )

    # end-to-end compiled match (coarse FFT + compensated-cumsum energy +
    # candidate selection + rescore) vs the float64 host oracle, incl. the
    # opt-in pooled coarse mode — catches lowering bugs anywhere in the
    # full kernel, not just the rescore
    from sushi_tpu.ops.sqdiff import match_padded, oracle_match

    for n, pool in ((24576, None), (98304, None), (98304, 8)):
        batch = 4
        patterns = np.zeros((batch, n), np.float32)
        windows = np.zeros((batch, n), np.float32)
        pat_lens = np.zeros(batch, np.int32)
        win_lens = np.zeros(batch, np.int32)
        expected = []
        for b in range(batch):
            lp = rng.randint(6000, min(20000, n // 3))
            wl = rng.randint(lp + 4000, n)
            base = rng.rand(wl).astype(np.float32)
            true_lag = rng.randint(0, wl - lp)
            patterns[b, :lp] = base[true_lag : true_lag + lp] + rng.randn(lp).astype(np.float32) * 0.01
            windows[b, :wl] = base
            pat_lens[b], win_lens[b] = lp, wl
            expected.append(oracle_match(patterns[b, :lp], base)[1])
        scores, lags = match_padded(
            jnp.asarray(patterns), jnp.asarray(pat_lens),
            jnp.asarray(windows), jnp.asarray(win_lens),
            fft_size=n, coarse_pool=pool,
        )
        got = [int(v) for v in np.asarray(lags)]
        ok = all(abs(g - e) <= 1 for g, e in zip(got, expected))
        failures += 0 if ok else 1
        print(
            "chip_kernel_check: match n=%d pool=%s lags %s vs oracle %s %s"
            % (n, pool, got, expected, "ok" if ok else "MISMATCH"),
            file=sys.stderr,
        )

    # the PRODUCTION dispatch entry: uint8 streams resident on device,
    # [4, B] bounds-packed operands, gather + convert + match in one
    # compiled call (exactly what execute_planned dispatches)
    from sushi_tpu.ops.sqdiff import match_from_streams_bounds

    fft_size, batch = 24576, 4
    stream = rng.randint(0, 256, (1 << 21) + fft_size).astype(np.uint8)
    bounds = np.zeros((4, batch), np.int32)
    expected = []
    for b in range(batch):
        lp = rng.randint(4000, 8000)
        wl = rng.randint(lp + 4000, fft_size)
        ws = rng.randint(0, (1 << 21) - wl)
        true_lag = rng.randint(0, wl - lp)
        ps = ws + true_lag  # pattern is a slice of the window region
        bounds[:, b] = (ps, lp, ws, wl)
        expected.append(
            oracle_match(
                stream[ps : ps + lp].astype(np.float32) / 255.0,
                stream[ws : ws + wl].astype(np.float32) / 255.0,
            )[1]
        )
    packed = np.asarray(
        match_from_streams_bounds(
            jnp.asarray(stream), jnp.asarray(stream), jnp.asarray(bounds),
            fft_size=fft_size, slice_len=fft_size, pat_cap=8192,
        )
    )
    got = [int(v) for v in packed[1]]
    ok = all(abs(g - e) <= 1 for g, e in zip(got, expected))
    failures += 0 if ok else 1
    print(
        "chip_kernel_check: bounds-entry lags %s vs oracle %s %s"
        % (got, expected, "ok" if ok else "MISMATCH"),
        file=sys.stderr,
    )
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
