"""Measure whether batch buckets above 128 rows amortize better, on chip.

``_BATCH_BUCKETS`` caps chunk rows at 128 (align/batcher.py) while
``_MAX_BATCH_ELEMENTS`` (1 << 26) would admit 512 rows at fft 131072 —
the season's merged rounds are exactly where bigger chunks could amortize
dispatch and FFT setup.  This probe times the production dispatch entry
(``sqdiff.match_from_streams_bounds``) at the standard bucket shapes for
row counts 64..512 and reports per-search device time, so the bucket
table is set by measurement rather than guess (VERDICT r03 item 3).

Timing discipline matches tools/kernel_ablation.py: N queue-serialized
dispatches amortized over ONE final fetch, min over repeats.

Usage: python tools/batch_probe.py [iterations]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp

from sushi_tpu.ops import sqdiff
from sushi_tpu.utils import compile_cache

PAT_LEN = 30000
PAT_CAP = 32768
MAX_ELEMENTS = 1 << 26  # mirrors batcher._MAX_BATCH_ELEMENTS


def time_entry(stream, bounds, fft_size, iterations, repeats=3):
    def dispatch():
        return sqdiff.match_from_streams_bounds(
            stream, stream, bounds,
            fft_size=fft_size, slice_len=fft_size, pat_cap=PAT_CAP,
        )

    np.asarray(dispatch())  # compile + warm
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = None
        for _ in range(iterations):
            out = dispatch()
        np.asarray(out)
        elapsed = time.time() - t0
        t0 = time.time()
        np.asarray(dispatch())
        single = time.time() - t0
        best = min(best, max((elapsed - single) / (iterations - 1), 1e-9))
    return best


def main():
    iterations = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    compile_cache.enable()
    rng = np.random.RandomState(0)
    stream = jnp.asarray(rng.randint(0, 256, 1 << 25).astype(np.uint8))

    print("backend=%s iters=%d" % (jax.default_backend(), iterations))
    print("%-8s %-6s %12s %14s %12s" % ("fft", "rows", "execute_ms", "us_per_search", "searches/s"))
    for fft_size in (98304, 131072, 524288):
        for rows in (64, 128, 256, 512):
            if rows * fft_size > MAX_ELEMENTS:
                continue
            starts = rng.randint(0, 1 << 24, rows).astype(np.int32)
            bounds = jnp.asarray(np.array(
                [starts, np.full(rows, PAT_LEN, np.int32),
                 starts, np.full(rows, fft_size - 4096, np.int32)], np.int32,
            ))
            execute = time_entry(stream, bounds, fft_size, iterations)
            print("%-8d %-6d %12.2f %14.2f %12.0f" % (
                fft_size, rows, execute * 1e3, execute / rows * 1e6, rows / execute))


if __name__ == "__main__":
    main()
