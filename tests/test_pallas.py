"""Parity tests for the Pallas TPU kernels (interpret mode on CPU) and the
MXU banded-matmul convolution path."""

import numpy as np
import jax.numpy as jnp
import scipy.ndimage as ndi

from platipy_tpu.core import filters as F
from platipy_tpu.core.interp import _lerp_shift_axis
from platipy_tpu.core.pallas_ops import (
    conv_axis_pallas,
    gauss3d_pallas,
    lerp_shift_axis_pallas,
    smooth_add_smooth_pallas,
)


def _gauss_taps(n=7):
    k = np.exp(-0.5 * np.arange(-(n // 2), n // 2 + 1) ** 2)
    return tuple((k / k.sum()).tolist())


def test_lerp_shift_pallas_matches_xla():
    rng = np.random.RandomState(0)
    vol = jnp.asarray(rng.rand(18, 22, 35).astype(np.float32))
    off = jnp.asarray((rng.rand(18, 22, 35).astype(np.float32) - 0.5) * 7)
    for ax in range(3):
        ref, _ = _lerp_shift_axis(vol, off, ax, 8)
        out = lerp_shift_axis_pallas(vol, off, ax, 8, interpret=True)
        assert float(jnp.max(jnp.abs(ref - out))) < 1e-6


def test_conv_axis_pallas_matches_filters():
    rng = np.random.RandomState(1)
    taps = _gauss_taps(5)
    for shape in [(16, 20, 30), (12, 14, 18, 3)]:
        vol = jnp.asarray(rng.rand(*shape).astype(np.float32))
        for ax in range(3):
            kernels = [np.asarray(taps) if i == ax else np.ones(1) for i in range(3)]
            ref = F.convolve_separable(vol, kernels)
            out = conv_axis_pallas(vol, taps, ax, interpret=True)
            assert float(jnp.max(jnp.abs(ref - out))) < 1e-6


def test_gauss3d_pallas_fused():
    rng = np.random.RandomState(2)
    taps = _gauss_taps(7)
    vol = jnp.asarray(rng.rand(14, 37, 30, 3).astype(np.float32))
    ref = F.convolve_separable(vol, [np.asarray(taps)] * 3)
    out = gauss3d_pallas(vol, (taps, taps, taps), interpret=True)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-6


def test_smooth_add_smooth_interior():
    # fused double-smooth matches the sequential form in the interior; the
    # global boundary band differs by design (inner smooth evaluated into the
    # halo instead of edge-replicated — both valid Neumann treatments)
    rng = np.random.RandomState(3)
    t7, t5 = _gauss_taps(7), _gauss_taps(5)
    u = jnp.asarray(rng.rand(20, 24, 40, 3).astype(np.float32))
    f = jnp.asarray(rng.rand(20, 24, 40, 3).astype(np.float32))
    ref = F.convolve_separable(
        f + F.convolve_separable(u, [np.asarray(t5)] * 3), [np.asarray(t7)] * 3
    )
    out = smooth_add_smooth_pallas(u, f, (t5,) * 3, (t7,) * 3, interpret=True)
    d = jnp.abs(ref - out)[3:-3, 3:-3, 3:-3]
    assert float(jnp.max(d)) < 1e-6


def test_conv_mm_path_matches_scipy():
    # _conv1d_along_axis picks the banded-matmul (MXU) path at these sizes;
    # edge rows must reproduce scipy's "nearest" (edge-replicate) semantics
    rng = np.random.RandomState(4)
    arr = rng.rand(18, 25, 31).astype(np.float32)
    k = np.exp(-0.5 * np.arange(-3, 4) ** 2)
    k /= k.sum()
    ref = arr
    for ax in range(3):
        ref = ndi.correlate1d(ref, k, axis=ax, mode="nearest")
    out = np.asarray(F.convolve_separable(jnp.asarray(arr), [k, k, k]))
    assert np.abs(ref - out).max() < 1e-5


def test_conv_mm_matches_tap_path_asymmetric():
    # the MXU matmul path must use the same origin convention as the
    # shift-and-add path (r = len//2) for even/asymmetric kernels
    rng = np.random.RandomState(5)
    arr = jnp.asarray(rng.rand(9, 11, 13).astype(np.float32))
    k = (0.1, 0.5, 0.3, 0.1)  # even length, asymmetric
    ref = F._conv1d_jit(arr, kernel_key=k, axis=2)
    out = F._conv1d_mm_jit(arr, kernel_key=k, axis=2, n=13)
    assert float(jnp.max(jnp.abs(ref - out))) < 1e-6
