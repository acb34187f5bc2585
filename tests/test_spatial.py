"""Spatially-sharded (z-axis, halo-exchange) ops match the single-device
programs exactly — the framework's volume-axis "context parallelism"
(SURVEY §5.7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from platipy_tpu.core import filters as F
from platipy_tpu.parallel.spatial import (
    convolve_separable_sharded,
    demons_level_spatial,
    shard_over_z,
    spatial_mesh,
)
from platipy_tpu.registration.deformable import _demons_level_impl


@pytest.fixture
def mesh(eight_cpu_devices):
    return spatial_mesh(8)


def _gauss(n=7):
    k = np.exp(-0.5 * np.arange(-(n // 2), n // 2 + 1) ** 2)
    return k / k.sum()


def test_convolve_sharded_matches(mesh):
    rng = np.random.RandomState(0)
    arr = jnp.asarray(rng.rand(32, 24, 40).astype(np.float32))
    kernels = [_gauss(7), _gauss(5), _gauss(7)]
    ref = F.convolve_separable(arr, kernels)
    out = convolve_separable_sharded(shard_over_z(arr, mesh), kernels, mesh)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-5


def test_demons_level_spatial_matches(mesh):
    rng = np.random.RandomState(1)
    shape = (96, 24, 24)
    fixed = jnp.asarray(rng.rand(*shape).astype(np.float32) * 1000 - 500)
    moving = jnp.asarray(rng.rand(*shape).astype(np.float32) * 1000 - 500)
    field0 = jnp.zeros(shape + (3,), jnp.float32)
    taps = tuple(
        tuple(float(v) for v in F.discrete_gaussian_kernel1d(1.0, 0.1, 30))
        for _ in range(3)
    )
    ref = _demons_level_impl(
        fixed, moving, field0, iterations=5, spacing=(1.5, 1.5, 1.5),
        std_kernels_key=taps, update_kernels_key=taps,
        max_step_vox=1.25, max_disp_vox=(4, 4, 4),
    )
    out = demons_level_spatial(
        shard_over_z(fixed, mesh), shard_over_z(moving, mesh),
        shard_over_z(field0, mesh), mesh,
        iterations=5, spacing=(1.5, 1.5, 1.5),
        std_kernels_key=taps, update_kernels_key=taps,
        max_step_vox=1.25, max_disp_vox=(4, 4, 4),
    )
    d = float(jnp.max(jnp.abs(ref - jnp.asarray(out))))
    assert d < 1e-4, d


def test_demons_level_spatial_halo_guard(mesh):
    fixed = jnp.zeros((16, 8, 8), jnp.float32)  # 2 slices/shard < halo
    taps = ((0.25, 0.5, 0.25),) * 3
    with pytest.raises(ValueError, match="halo"):
        demons_level_spatial(
            fixed, fixed, jnp.zeros((16, 8, 8, 3), jnp.float32), mesh,
            iterations=1, spacing=(1.0, 1.0, 1.0),
            std_kernels_key=taps, update_kernels_key=taps,
            max_disp_vox=(4, 4, 4),
        )


def test_demons_level_spatial_realistic_long_run(mesh):
    """30 iterations on a smooth pseudo-CT pair: the sharded field must track
    the single-device field to within ~5% of the peak displacement (f32
    reassociation through the discontinuous ESM threshold; see module doc).
    The pre-fix bug this guards against was 38% divergence (the slab warp
    masked samples against the slab extent instead of the global bounds)."""
    zz, yy, xx = np.mgrid[:128, :24, :24].astype(np.float32)

    def sph(c):
        d = np.sqrt((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2)
        return (-500 + 1000 / (1 + np.exp((d - 9) / 1.5))).astype(np.float32)

    fixed = jnp.asarray(sph((64, 12, 12)))
    moving = jnp.asarray(sph((68, 13, 12)))
    f0 = jnp.zeros((128, 24, 24, 3), jnp.float32)
    taps = tuple(
        tuple(float(v) for v in F.discrete_gaussian_kernel1d(1.0, 0.1, 30))
        for _ in range(3)
    )
    kw = dict(iterations=30, spacing=(1.5, 1.5, 1.5), std_kernels_key=taps,
              update_kernels_key=taps, max_step_vox=1.25, max_disp_vox=(4, 4, 4))
    ref = _demons_level_impl(fixed, moving, f0, **kw)
    out = demons_level_spatial(
        shard_over_z(fixed, mesh), shard_over_z(moving, mesh),
        shard_over_z(f0, mesh), mesh, **kw,
    )
    peak = float(jnp.max(jnp.abs(ref)))
    d = float(jnp.max(jnp.abs(jnp.asarray(out) - ref)))
    assert d < 0.05 * peak + 1e-3, (d, peak)


def test_demons_level_spatial_rms_stop(mesh):
    """max_rms_error on the sharded path: threshold 0 matches the fixed-trip
    fori result exactly; a huge threshold stops after one iteration and
    matches the sharded 1-iteration run."""
    rng = np.random.RandomState(2)
    shape = (96, 24, 24)
    fixed = jnp.asarray(rng.rand(*shape).astype(np.float32) * 1000 - 500)
    moving = jnp.asarray(rng.rand(*shape).astype(np.float32) * 1000 - 500)
    field0 = jnp.zeros(shape + (3,), jnp.float32)
    taps = tuple(
        tuple(float(v) for v in F.discrete_gaussian_kernel1d(1.0, 0.1, 30))
        for _ in range(3)
    )
    kw = dict(spacing=(1.5, 1.5, 1.5), std_kernels_key=taps,
              update_kernels_key=taps, max_step_vox=1.25, max_disp_vox=(4, 4, 4))

    def run(**extra):
        return jnp.asarray(demons_level_spatial(
            shard_over_z(fixed, mesh), shard_over_z(moving, mesh),
            shard_over_z(field0, mesh), mesh, **kw, **extra,
        ))

    full = run(iterations=4)
    zero_thresh = run(iterations=4, max_rms_error=0.0)
    np.testing.assert_allclose(np.asarray(zero_thresh), np.asarray(full),
                               atol=1e-6)
    one = run(iterations=1)
    big_thresh = run(iterations=4, max_rms_error=1e6)
    np.testing.assert_allclose(np.asarray(big_thresh), np.asarray(one),
                               atol=1e-6)
