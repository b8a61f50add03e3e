"""MXU four-step DFT correlation parity (ops/mxu_dft.py).

The MXU path replaces the packed-FFT transforms with matmul + batched-FFT
stages; these tests pin its algebra against the classic rfft formulation
(the same oracle tests/test_sqdiff.py uses for the packed path).  On CPU
``plan_for`` declines (the einsum stages only pay on the systolic array),
so tests construct Plans explicitly; the compiled path is chip-verified by
tools/chip_kernel_check.py and the soak.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sushi_tpu.ops import mxu_dft
from sushi_tpu.ops.mxu_dft import Plan, correlate_packed, plan_for


def _classic(patterns, windows, n):
    return jnp.fft.irfft(
        jnp.fft.rfft(windows, n=n) * jnp.conj(jnp.fft.rfft(patterns, n=n)), n=n
    )


@pytest.mark.parametrize("n", [4096, 6144, 16384])
@pytest.mark.parametrize("batch", [2, 6])
def test_correlate_packed_matches_classic(n, batch):
    rng = np.random.RandomState(7)
    pats = jnp.asarray(rng.rand(batch, n).astype(np.float32))
    wins = jnp.asarray(rng.rand(batch, n).astype(np.float32))
    plan = Plan(128, n // 128, jax.lax.Precision.HIGHEST)
    got = np.asarray(correlate_packed(pats, wins, n, plan))
    ref = np.asarray(_classic(pats, wins, n))
    scale = float(np.max(np.abs(ref)))
    assert np.max(np.abs(got - ref)) < 5e-5 * scale


def test_correlate_packed_pads_narrow_rows():
    """Rows narrower than fft_size zero-extend, exactly like rfft(n=)."""
    rng = np.random.RandomState(8)
    n = 4096
    pats = jnp.asarray(rng.rand(4, 1500).astype(np.float32))
    wins = jnp.asarray(rng.rand(4, 3000).astype(np.float32))
    plan = Plan(128, n // 128, jax.lax.Precision.HIGHEST)
    got = np.asarray(correlate_packed(pats, wins, n, plan))
    ref = np.asarray(_classic(pats, wins, n))
    scale = float(np.max(np.abs(ref)))
    assert np.max(np.abs(got - ref)) < 5e-5 * scale


def test_rev_index_is_the_negated_spectral_index():
    """Z[(n-k) mod n] in the [k1, k2] digit-permuted layout, checked
    against the plain negated-index permutation in numpy."""
    n1, n2 = 8, 6
    n = n1 * n2
    rng = np.random.RandomState(9)
    flat_r = rng.randn(2, n).astype(np.float32)
    flat_i = rng.randn(2, n).astype(np.float32)
    # lay flat spectra into the permuted layout: k = k1 + n1*k2 at [k1, k2]
    k1, k2 = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    k = k1 + n1 * k2
    zr = jnp.asarray(flat_r[:, k])
    zi = jnp.asarray(flat_i[:, k])
    rr, ri = mxu_dft._rev_index(zr, zi, n1, n2)
    expect_r = flat_r[:, (n - k) % n]
    expect_i = flat_i[:, (n - k) % n]
    np.testing.assert_array_equal(np.asarray(rr), expect_r)
    np.testing.assert_array_equal(np.asarray(ri), expect_i)


def test_plan_for_declines_unsupported_shapes(monkeypatch):
    monkeypatch.setattr(mxu_dft.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(mxu_dft, "_MIN_FFT", 4096)
    monkeypatch.setattr(mxu_dft, "_REQUIRE_3SMOOTH", False)
    assert plan_for(4096, 64) is not None
    # row-local formulation: any batch >= 1 qualifies (the pre-row-local
    # pairing needed even batches; that constraint died with it)
    assert plan_for(4096, 3) is not None
    assert plan_for(4096, 1) is not None
    assert plan_for(4100, 64) is None  # not a multiple of 128
    assert plan_for(1024, 64) is None  # n2 < 16
    monkeypatch.setattr(mxu_dft, "_REQUIRE_3SMOOTH", True)
    assert plan_for(4096, 64) is None  # pow2: packed FFT measured faster
    assert plan_for(6144, 64) is not None  # 3*2^11
    monkeypatch.setattr(mxu_dft, "_MIN_FFT", 32768)
    assert plan_for(6144, 64) is None  # below the measured-win floor
    assert plan_for(98304, 64) is not None  # the flagship 3-smooth bucket
    assert plan_for(131072, 128) is None  # pow2: measured 1.19x loss
    monkeypatch.setattr(mxu_dft, "_MXU_FFT", False)
    assert plan_for(98304, 64) is None


def test_plan_for_declines_off_tpu():
    if jax.default_backend() == "tpu":  # pragma: no cover - CPU suite
        pytest.skip("CPU-suite test")
    assert plan_for(98304, 64) is None


def test_sqdiff_integration_uses_mxu_plan(monkeypatch):
    """When plan_for offers a plan, _correlate_rows must route to it and
    stay within coarse tolerance of the classic formulation."""
    from sushi_tpu.ops import sqdiff

    n = 6144  # 3-smooth, like the production buckets the plan admits
    monkeypatch.setattr(mxu_dft.jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(mxu_dft, "_MIN_FFT", 4096)
    rng = np.random.RandomState(10)
    pats = jnp.asarray(rng.rand(4, n).astype(np.float32))
    wins = jnp.asarray(rng.rand(4, n).astype(np.float32))
    got = np.asarray(sqdiff._correlate_rows(pats, wins, n))
    ref = np.asarray(_classic(pats, wins, n))
    scale = float(np.max(np.abs(ref)))
    assert np.max(np.abs(got - ref)) < 2e-4 * scale
