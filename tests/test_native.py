"""Native C++ fastops tests: parity with scipy oracles and with the JAX paths."""

import numpy as np
import pytest
from scipy import ndimage

from platipy_tpu import native

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_native_cc_matches_scipy():
    rng = np.random.RandomState(0)
    mask = rng.rand(30, 40, 50) > 0.7
    lab = native.cc_label_3d(mask, 26)
    lab_sp, n_sp = ndimage.label(mask, structure=np.ones((3, 3, 3)))
    assert lab.max() == n_sp
    # identical partition (bijective label mapping)
    pairs = set(zip(lab[mask].tolist(), lab_sp[mask].tolist()))
    assert len(pairs) == n_sp

    lab6 = native.cc_label_3d(mask, 6)
    _, n6 = ndimage.label(mask)
    assert lab6.max() == n6


def test_native_edt_matches_scipy():
    rng = np.random.RandomState(1)
    mask = rng.rand(24, 32, 40) > 0.9
    d = np.sqrt(native.edt_sq_3d(mask, (1.0, 2.0, 3.0)))
    d_sp = ndimage.distance_transform_edt(~mask, sampling=(3.0, 2.0, 1.0))
    np.testing.assert_allclose(d, d_sp, atol=1e-4)


def test_native_fill_holes():
    zz, yy, xx = np.mgrid[:24, :24, :24]
    ball = ((zz - 12) ** 2 + (yy - 12) ** 2 + (xx - 12) ** 2) < 81
    hollow = ball & ~(((zz - 12) ** 2 + (yy - 12) ** 2 + (xx - 12) ** 2) < 25)
    filled = native.fill_holes_3d(hollow, 6)
    np.testing.assert_array_equal(filled > 0, ball)


def test_native_region_grow_blocked_by_threshold():
    img = np.full((16, 16, 16), 100.0, np.float32)
    img[4:12, 4:12, 4:12] = -900.0
    img[8, 8, 12] = -900.0  # touching face neighbour grows
    img[8, 8, 14] = -900.0  # isolated: should NOT grow
    grown = native.region_grow_3d(img, [(8, 8, 8)], -1000.0, -800.0, 6)
    assert grown[8, 8, 12] == 1
    assert grown[8, 8, 14] == 0


def test_wired_paths_use_native_consistently():
    """The package-level CC/fill-holes give identical results whichever backend."""
    import jax.numpy as jnp

    from platipy_tpu.core.components import connected_components, relabel_components
    from platipy_tpu.core.morphology import binary_fill_holes

    rng = np.random.RandomState(2)
    mask = rng.rand(16, 20, 24) > 0.75
    lab_native = relabel_components(connected_components(jnp.asarray(mask), 26))
    lab_device = relabel_components(
        connected_components(jnp.asarray(mask), 26, use_native=False)
    )
    np.testing.assert_array_equal(np.asarray(lab_native), np.asarray(lab_device))

    zz, yy, xx = np.mgrid[:20, :20, :20]
    hollow = (((zz - 10) ** 2 + (yy - 10) ** 2 + (xx - 10) ** 2) < 64) & ~(
        ((zz - 10) ** 2 + (yy - 10) ** 2 + (xx - 10) ** 2) < 16
    )
    f_native = binary_fill_holes(jnp.asarray(hollow))
    f_device = binary_fill_holes(jnp.asarray(hollow), use_native=False)
    np.testing.assert_array_equal(np.asarray(f_native), np.asarray(f_device))