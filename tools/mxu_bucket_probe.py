"""Probe: full production kernel per bucket, MXU DFT on vs off.

The MXU four-step hybrid (ops/mxu_dft.py) won 2.92 -> 1.58 ms on the raw
correlation at 64x98304, but the packed c2c FFT's win varies by shape
(it measured an outsized 2.88x at [128, 131072]), so the MXU path must be
gated per bucket by measurement, not assumption.  This times the REAL
entry (sqdiff.match_from_streams_bounds — gather + correlation + fused
post + rescore) at every production bucket with the MXU plan forced on
and off, using the (t_N - t_1)/(N-1) amortized-dispatch discipline.

Usage: python tools/mxu_bucket_probe.py [iters]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp

from sushi_tpu.align.batcher import _coarse_pool_for
from sushi_tpu.ops import mxu_dft, sqdiff
from sushi_tpu.utils import compile_cache

# (fft_size, batch): the shapes production compiles (bench buckets plus
# the escalation sizes between them)
SHAPES = [
    (32768, 64),
    (49152, 64),
    (65536, 64),
    (98304, 64),
    (131072, 128),
    (196608, 128),
    (262144, 128),
    (393216, 128),
    (524288, 128),
]


def time_fn(fn, iters, repeats=3):
    np.asarray(fn())
    best = float("inf")
    for _ in range(repeats):
        t0 = time.time()
        out = None
        for _ in range(iters):
            out = fn()
        np.asarray(out)
        elapsed = time.time() - t0
        t0 = time.time()
        np.asarray(fn())
        single = time.time() - t0
        best = min(best, max((elapsed - single) / (iters - 1), 1e-9))
    return best


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    compile_cache.enable()
    import jax

    rng = np.random.RandomState(0)
    stream_np = rng.randint(0, 256, 1 << 25).astype(np.uint8)
    per_shape_bounds = {
        (fft_size, batch): np.array(
            [starts, np.full(batch, 30000, np.int32),
             starts, np.full(batch, fft_size - 4096, np.int32)], np.int32)
        for fft_size, batch in SHAPES
        for starts in [rng.randint(0, 1 << 24, batch).astype(np.int32)]
    }

    # two sweeps: the MXU gate is read at TRACE time, so flipping it
    # requires dropping the jit cache between sweeps (the persistent
    # compile cache keeps the re-trace cheap)
    times = {}
    for label, gate in (("mxu", True), ("fft", False)):
        mxu_dft._MXU_FFT = gate
        jax.clear_caches()
        stream = jnp.asarray(stream_np)
        for fft_size, batch in SHAPES:
            bounds = jnp.asarray(per_shape_bounds[(fft_size, batch)])
            pool = _coarse_pool_for(fft_size, 30000)

            def dispatch():
                return sqdiff.match_from_streams_bounds(
                    stream, stream, bounds, fft_size=fft_size, slice_len=fft_size,
                    pat_cap=32768, coarse_pool=pool)

            try:
                t = time_fn(dispatch, iters)
            except Exception as e:  # noqa: BLE001 - probe reports and moves on
                print("%7d x%-4d %s FAILED: %s" % (fft_size, batch, label, str(e)[:90]))
                t = float("nan")
            times[(fft_size, batch, label)] = t
            print("%7d x%-4d pool=%s %s %7.2f ms"
                  % (fft_size, batch, pool or 1, label, t * 1e3), flush=True)

    for fft_size, batch in SHAPES:
        m = times[(fft_size, batch, "mxu")]
        f = times[(fft_size, batch, "fft")]
        print("%7d x%-4d  mxu %7.2f ms   fft %7.2f ms   mxu/fft %.3f"
              % (fft_size, batch, m * 1e3, f * 1e3, m / f), flush=True)


if __name__ == "__main__":
    main()
