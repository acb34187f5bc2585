"""Core image model / transform / resample tests.

Oracles: analytic geometry and scipy.ndimage (the same C the reference's ITK
wraps conceptually) — precision bars follow the reference's test style
(platipy/imaging/tests/test_metrics.py asserts ~1e-9 on analytic cases).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy import ndimage

from platipy_tpu.core.image import Image, from_array
from platipy_tpu.core.interp import sample_image, spline_coefficients
from platipy_tpu.core.resample import (
    identity_dvf,
    resample,
    transform_to_displacement_field,
    warp_image,
)
from platipy_tpu.core.transform import (
    AffineTransform,
    CompositeTransform,
    Euler3DTransform,
    TranslationTransform,
    VersorRigid3DTransform,
    centered_transform_initializer,
    versor_to_matrix,
)


def test_image_physical_mapping():
    img = from_array(
        np.zeros((4, 5, 6)), origin=(10.0, 20.0, 30.0), spacing=(2.0, 3.0, 4.0)
    )
    # index (1,2,3) -> physical
    p = img.physical_point((1, 2, 3))
    np.testing.assert_allclose(p, [12.0, 26.0, 42.0])
    assert img.size == (6, 5, 4)


def test_image_direction_mapping():
    # 90 degree rotation about z: direction columns are the axis directions
    d = (0, -1, 0, 1, 0, 0, 0, 0, 1)
    img = from_array(np.zeros((3, 3, 3)), origin=(0, 0, 0), spacing=(1, 1, 1), direction=d)
    p = img.physical_point((1, 0, 0))
    np.testing.assert_allclose(p, [0.0, 1.0, 0.0], atol=1e-12)


def test_image_is_pytree():
    img = from_array(np.ones((2, 2, 2)), spacing=(1, 2, 3))
    doubled = jax.jit(lambda im: im.with_array(im.array * 2))(img)
    assert doubled.spacing == (1.0, 2.0, 3.0)
    np.testing.assert_allclose(np.asarray(doubled.array), 2.0)


def test_trilinear_sample_matches_scipy():
    rng = np.random.RandomState(0)
    arr = rng.rand(8, 9, 10).astype(np.float32)
    img = from_array(arr, origin=(-3.0, 2.0, 1.0), spacing=(1.5, 2.0, 0.8))
    pts_idx = rng.rand(50, 3) * [9.0, 8.0, 7.0]  # (x,y,z) continuous indices
    pts_phys = np.stack([img.physical_point(p) for p in pts_idx])
    vals = np.asarray(
        sample_image(
            img.array, jnp.asarray(pts_phys, jnp.float32),
            origin=img.origin, spacing=img.spacing, direction=img.direction,
        )
    )
    # scipy map_coordinates order=1 on (z,y,x) coords
    coords = pts_idx[:, ::-1].T
    expected = ndimage.map_coordinates(arr, coords, order=1, mode="nearest")
    np.testing.assert_allclose(vals, expected, rtol=1e-4, atol=1e-4)


def test_sample_outside_default_value():
    arr = np.ones((4, 4, 4), dtype=np.float32)
    img = from_array(arr)
    pts = jnp.asarray([[-5.0, 0.0, 0.0], [1.0, 1.0, 1.0]], jnp.float32)
    vals = np.asarray(sample_image(img.array, pts, default_value=-7.0))
    assert vals[0] == -7.0
    assert vals[1] == 1.0


def test_translation_resample():
    arr = np.zeros((8, 8, 8), dtype=np.float32)
    arr[3, 4, 5] = 1.0
    img = from_array(arr)
    # transform maps fixed point -> moving point; shifting by +1 in x means
    # output[i] = input(i_x + 1)
    t = TranslationTransform(jnp.asarray([1.0, 0.0, 0.0]))
    out = resample(img, img, t, interp="linear")
    out_arr = np.asarray(out.array)
    assert out_arr[3, 4, 4] == 1.0
    assert out_arr[3, 4, 5] == 0.0


def test_nearest_resample_binary_exact():
    rng = np.random.RandomState(1)
    arr = (rng.rand(6, 6, 6) > 0.5).astype(np.uint8)
    img = from_array(arr)
    t = TranslationTransform(jnp.zeros(3))
    out = resample(img, img, t, interp="nearest")
    np.testing.assert_array_equal(np.asarray(out.array), arr)
    assert out.array.dtype == jnp.uint8


def test_versor_rotation_matrix():
    # versor for 90 deg about z: (0, 0, sin(45deg))
    v = jnp.asarray([0.0, 0.0, np.sin(np.pi / 4)])
    m = np.asarray(versor_to_matrix(v))
    expected = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 1]], dtype=float)
    np.testing.assert_allclose(m, expected, atol=1e-6)


def test_composite_transform_itk_order():
    # ITK: last added applied first
    a = TranslationTransform(jnp.asarray([1.0, 0.0, 0.0]))
    rot = Euler3DTransform(angles=jnp.asarray([0.0, 0.0, jnp.pi / 2]))
    comp = CompositeTransform([a, rot])
    p = jnp.asarray([[1.0, 0.0, 0.0]])
    # rot first: (1,0,0)->(0,1,0); then a: ->(1,1,0)
    out = np.asarray(comp.apply(p))[0]
    np.testing.assert_allclose(out, [1.0, 1.0, 0.0], atol=1e-5)


def test_composite_as_matrix_matches_apply():
    a = TranslationTransform(jnp.asarray([1.0, 2.0, 3.0]))
    rot = Euler3DTransform(
        angles=jnp.asarray([0.1, -0.2, 0.3]),
        translation=jnp.asarray([0.5, 0.0, -1.0]),
        center=jnp.asarray([2.0, 2.0, 2.0]),
    )
    comp = CompositeTransform([a, rot])
    m = comp.as_matrix()
    pts = np.random.RandomState(3).rand(10, 3).astype(np.float32) * 4
    expected = np.asarray(comp.apply(jnp.asarray(pts)))
    got = pts @ m[:3, :3].T + m[:3, 3]
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-4)


def test_centered_initializer_geometry():
    fixed = from_array(np.zeros((10, 10, 10)), origin=(0, 0, 0), spacing=(1, 1, 1))
    moving = from_array(np.zeros((10, 10, 10)), origin=(5, 0, 0), spacing=(1, 1, 1))
    t = centered_transform_initializer(fixed, moving, "euler", moments=False)
    np.testing.assert_allclose(np.asarray(t.translation), [5.0, 0.0, 0.0], atol=1e-5)


def test_centered_initializer_moments():
    f = np.zeros((10, 10, 10))
    f[5, 5, 5] = 1.0
    m = np.zeros((10, 10, 10))
    m[5, 5, 8] = 1.0
    fixed = from_array(f)
    moving = from_array(m)
    t = centered_transform_initializer(fixed, moving, "euler", moments=True)
    np.testing.assert_allclose(np.asarray(t.translation), [3.0, 0.0, 0.0], atol=1e-5)


def test_resample_between_grids():
    # moving has different origin/spacing; identity transform should align
    # physical content
    arr = np.zeros((10, 10, 10), dtype=np.float32)
    arr[5, 5, 5] = 8.0
    moving = from_array(arr, origin=(0, 0, 0), spacing=(2, 2, 2))
    ref = from_array(np.zeros((20, 20, 20), dtype=np.float32), origin=(0, 0, 0), spacing=(1, 1, 1))
    out = resample(moving, ref, None, interp="linear")
    out_arr = np.asarray(out.array)
    # physical (10,10,10) is index (10,10,10) on ref grid
    assert out_arr[10, 10, 10] == pytest.approx(8.0, abs=1e-4)


def test_warp_image_identity():
    arr = np.random.RandomState(0).rand(6, 7, 8).astype(np.float32)
    img = from_array(arr, spacing=(1.3, 0.7, 2.0))
    dvf = identity_dvf(img)
    out = warp_image(img, dvf)
    np.testing.assert_allclose(np.asarray(out.array), arr, atol=1e-5)


def test_warp_image_constant_shift():
    arr = np.zeros((8, 8, 8), dtype=np.float32)
    arr[4, 4, 4] = 1.0
    img = from_array(arr)
    dvf = identity_dvf(img)
    # displacement +1mm in x: out[i] = in(i + disp) -> peak moves to x=3
    dvf = dvf.with_array(dvf.array.at[..., 0].set(1.0))
    out = np.asarray(warp_image(img, dvf).array)
    assert out[4, 4, 3] == pytest.approx(1.0, abs=1e-5)


def test_transform_to_displacement_field():
    ref = from_array(np.zeros((4, 4, 4)), spacing=(2, 2, 2))
    t = TranslationTransform(jnp.asarray([1.0, -2.0, 0.5]))
    dvf = transform_to_displacement_field(t, ref)
    arr = np.asarray(dvf.array)
    np.testing.assert_allclose(arr[..., 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(arr[..., 1], -2.0, atol=1e-6)
    np.testing.assert_allclose(arr[..., 2], 0.5, atol=1e-6)


def test_bspline_interp_matches_scipy():
    rng = np.random.RandomState(2)
    arr = rng.rand(12, 12, 12).astype(np.float32)
    img = from_array(arr)
    pts_idx = 2.0 + rng.rand(30, 3) * 7.0
    vals = np.asarray(
        sample_image(
            spline_coefficients(img.array),
            jnp.asarray(pts_idx, jnp.float32),
            interp="bspline",
        )
    )
    coords = pts_idx[:, ::-1].T
    expected = ndimage.map_coordinates(arr, coords, order=3, mode="mirror")
    np.testing.assert_allclose(vals, expected, rtol=1e-3, atol=1e-3)
