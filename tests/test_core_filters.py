"""Filters / distance transform / morphology / components tests vs scipy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from platipy_tpu.core.components import (
    connected_components,
    connected_threshold,
    keep_largest_component,
    label_shape_statistics,
    relabel_components,
)
from platipy_tpu.core.distance import edt, signed_maurer_distance_map, squared_edt
from platipy_tpu.core.filters import (
    box_mean,
    discrete_gaussian,
    gaussian_smooth,
    gradient,
    smoothing_recursive_gaussian,
)
from platipy_tpu.core.image import from_array
from platipy_tpu.core.morphology import (
    binary_closing,
    binary_dilate,
    binary_erode,
    binary_fill_holes,
    label_contour,
)


def _ball_mask(shape=(24, 24, 24), center=(12, 12, 12), r=6):
    zz, yy, xx = np.mgrid[: shape[0], : shape[1], : shape[2]]
    return (
        (zz - center[0]) ** 2 + (yy - center[1]) ** 2 + (xx - center[2]) ** 2
    ) <= r * r


def test_gaussian_smooth_matches_scipy():
    rng = np.random.RandomState(0)
    arr = rng.rand(16, 16, 16).astype(np.float32)
    out = np.asarray(gaussian_smooth(jnp.asarray(arr), (2.0, 1.5, 1.0)))
    expected = ndimage.gaussian_filter(arr, (2.0, 1.5, 1.0), mode="nearest", truncate=4.0)
    np.testing.assert_allclose(out, expected, rtol=1e-3, atol=1e-3)


def test_discrete_gaussian_preserves_mean():
    rng = np.random.RandomState(1)
    arr = rng.rand(12, 12, 12).astype(np.float32)
    img = from_array(arr, spacing=(2.0, 2.0, 2.0))
    out = discrete_gaussian(img, variance=4.0)
    assert np.asarray(out.array).mean() == pytest.approx(arr.mean(), rel=1e-2)
    # smoothing reduces variance
    assert np.asarray(out.array).std() < arr.std()


def test_recursive_gaussian_physical_units():
    arr = np.zeros((21, 21, 21), dtype=np.float32)
    arr[10, 10, 10] = 1.0
    img = from_array(arr, spacing=(2.0, 1.0, 1.0))
    out = np.asarray(smoothing_recursive_gaussian(img, 2.0).array)
    # sigma 2mm -> sigma_vox (x)=1, (y)=2, (z)=2
    expected = ndimage.gaussian_filter(arr, (2.0, 2.0, 1.0), mode="nearest", truncate=4.0)
    np.testing.assert_allclose(out, expected, rtol=2e-2, atol=1e-5)


def test_box_mean():
    arr = np.arange(27, dtype=np.float32).reshape(3, 3, 3)
    img = from_array(arr)
    out = np.asarray(box_mean(img, 1).array)
    expected = ndimage.uniform_filter(arr, 3, mode="nearest")
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_gradient_linear_field():
    zz, yy, xx = np.mgrid[:8, :8, :8].astype(np.float32)
    field = 2 * xx + 3 * yy - zz
    g = np.asarray(gradient(jnp.asarray(field), (1.0, 1.0, 1.0)))
    np.testing.assert_allclose(g[2:-2, 2:-2, 2:-2, 0], 2.0, atol=1e-5)
    np.testing.assert_allclose(g[2:-2, 2:-2, 2:-2, 1], 3.0, atol=1e-5)
    np.testing.assert_allclose(g[2:-2, 2:-2, 2:-2, 2], -1.0, atol=1e-5)


def test_edt_matches_scipy():
    mask = _ball_mask()
    d = np.asarray(edt(jnp.asarray(mask), (1.0, 1.0, 1.0)))
    expected = ndimage.distance_transform_edt(~mask)
    np.testing.assert_allclose(d, expected, atol=1e-3)


def test_edt_anisotropic_spacing():
    mask = np.zeros((10, 12, 14), dtype=bool)
    mask[5, 6, 7] = True
    d = np.asarray(edt(jnp.asarray(mask), (1.0, 2.0, 3.0)))  # (x,y,z) spacing
    expected = ndimage.distance_transform_edt(~mask, sampling=(3.0, 2.0, 1.0))
    np.testing.assert_allclose(d, expected, atol=1e-3)


def test_signed_maurer_convention():
    # ITK convention: magnitude = distance to the mask's inner-boundary voxels
    mask = np.zeros((10, 10, 10), dtype=np.uint8)
    mask[3:7, 3:7, 3:7] = 1
    img = from_array(mask, spacing=(1, 1, 2))
    sm = np.asarray(signed_maurer_distance_map(img).array)
    # outside voxel adjacent in x: distance 1 to the contour
    assert sm[5, 5, 7] == pytest.approx(1.0, abs=1e-4)
    # boundary (contour) voxel itself: 0
    assert sm[5, 5, 3] == pytest.approx(0.0, abs=1e-4)
    # first interior voxel: -1 (to the nearest contour voxel)
    assert sm[5, 5, 4] == pytest.approx(-1.0, abs=1e-4)
    # z-adjacent outside voxel: spacing 2
    assert sm[7, 5, 5] == pytest.approx(2.0, abs=1e-4)


def test_binary_dilate_matches_scipy_ball():
    mask = _ball_mask(r=4)
    out = np.asarray(binary_dilate(jnp.asarray(mask), 2)) > 0
    # scipy equivalent: ellipsoid structuring via distance threshold
    dist = ndimage.distance_transform_edt(~mask)
    expected = dist <= 2.0
    np.testing.assert_array_equal(out, expected)


def test_binary_erode_dilate_duality():
    mask = _ball_mask(r=6)
    er = np.asarray(binary_erode(jnp.asarray(mask), 2)) > 0
    dist_in = ndimage.distance_transform_edt(mask)
    expected = dist_in > 2.0
    # boundary equality: voxels at exactly distance 2 differ by convention;
    # allow tiny disagreement count
    assert (er != expected).sum() <= np.prod(mask.shape) * 0.01


def test_binary_closing_fills_gap():
    mask = np.zeros((16, 16, 16), dtype=bool)
    mask[4:13, 4:13, 4:7] = True
    mask[4:13, 4:13, 9:12] = True
    closed = np.asarray(binary_closing(jnp.asarray(mask), 2)) > 0
    assert closed[8, 8, 7] and closed[8, 8, 8]
    # closing must not grow the outer extent
    assert closed[8, 8, 3] == False and closed[8, 8, 12] == False


def test_fill_holes():
    mask = _ball_mask(r=8).copy()
    hollow = mask & ~_ball_mask(r=4)
    filled = np.asarray(binary_fill_holes(jnp.asarray(hollow))) > 0
    np.testing.assert_array_equal(filled, mask)


def test_label_contour():
    mask = np.zeros((8, 8, 8), dtype=bool)
    mask[2:6, 2:6, 2:6] = True
    contour = np.asarray(label_contour(jnp.asarray(mask))) > 0
    expected = mask & ~ndimage.binary_erosion(mask)
    np.testing.assert_array_equal(contour, expected)


def test_connected_components_and_relabel():
    mask = np.zeros((12, 12, 12), dtype=bool)
    mask[1:3, 1:3, 1:3] = True        # small blob (8)
    mask[5:10, 5:10, 5:10] = True     # big blob (125)
    lab = relabel_components(connected_components(jnp.asarray(mask), connectivity=6))
    lab = np.asarray(lab)
    assert set(np.unique(lab)) == {0, 1, 2}
    assert (lab == 1).sum() == 125  # largest first
    assert (lab == 2).sum() == 8


def test_keep_largest_component():
    mask = np.zeros((12, 12, 12), dtype=bool)
    mask[1:3, 1:3, 1:3] = True
    mask[5:10, 5:10, 5:10] = True
    out = np.asarray(keep_largest_component(jnp.asarray(mask))) > 0
    assert out.sum() == 125
    assert out[7, 7, 7] and not out[1, 1, 1]


def test_connected_threshold_region_growing():
    img = np.full((10, 10, 10), 100.0, dtype=np.float32)
    img[2:8, 2:8, 2:8] = -900.0   # air pocket
    img[5, 5, 0:3] = -900.0       # connected channel to border... blocked
    image = from_array(img)
    grown = np.asarray(
        connected_threshold(image, [(5, 5, 5)], lower=-1000.0, upper=-800.0).array
    )
    assert grown[5, 5, 5] == 1
    assert grown[2, 2, 2] == 1
    assert grown[0, 0, 0] == 0


def test_label_shape_statistics():
    mask = np.zeros((20, 20, 20), dtype=np.uint8)
    mask[5:15, 8:12, 9:11] = 1  # elongated box: extents z=10, y=4, x=2
    img = from_array(mask, spacing=(2.0, 1.0, 1.0))
    stats = label_shape_statistics(img)
    assert stats["count"] == 10 * 4 * 2
    assert stats["physical_size"] == pytest.approx(10 * 4 * 2 * 2.0)
    cx, cy, cz = stats["centroid"]
    assert cx == pytest.approx(9.5 * 2.0)
    assert cy == pytest.approx(9.5)
    assert cz == pytest.approx(9.5)
    assert stats["elongation"] > 1.5  # clearly elongated


def test_label_intensity_statistics():
    from platipy_tpu.core.components import label_intensity_statistics
    from platipy_tpu.core.image import from_array

    lab = np.zeros((8, 8, 8), np.uint8)
    lab[2:5, 2:5, 2:5] = 1
    img_vals = np.arange(8 * 8 * 8, dtype=np.float32).reshape(8, 8, 8)
    stats = label_intensity_statistics(
        from_array(lab, spacing=(1.0, 1.0, 2.0)), from_array(img_vals)
    )
    sel = img_vals[lab == 1].astype(np.float64)
    assert stats["count"] == 27
    assert stats["physical_size"] == 27 * 2.0
    assert abs(stats["mean"] - sel.mean()) < 1e-9
    assert abs(stats["sigma"] - sel.std(ddof=1)) < 1e-9
    assert stats["minimum"] == sel.min() and stats["maximum"] == sel.max()


def test_invert_displacement_field():
    from platipy_tpu.core.image import from_array
    from platipy_tpu.core.resample import (
        identity_dvf,
        invert_displacement_field,
        warp_image,
    )

    ref = from_array(np.zeros((16, 16, 16), np.float32), spacing=(2.0, 2.0, 2.0))
    dvf = identity_dvf(ref)
    # smooth small displacement: constant shift of (3, -2, 1) mm
    u = jnp.zeros_like(dvf.array) + jnp.asarray([3.0, -2.0, 1.0])
    dvf = dvf.with_array(u)
    inv = invert_displacement_field(dvf)
    # interior voxels: v == -u exactly for a constant field
    v = np.asarray(inv.array)[4:-4, 4:-4, 4:-4]
    assert np.allclose(v, [-3.0, 2.0, -1.0], atol=1e-3)
