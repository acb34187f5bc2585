"""Synthetic DVF generation + augmentation tests (SURVEY §2.5; reference
platipy/imaging/generation/dvf.py, augment.py, mask.py — untested upstream)."""

import numpy as np
import pytest

from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere
from platipy_tpu.label.utils import get_com


@pytest.fixture(scope="module")
def sphere_mask():
    arr = insert_sphere(np.zeros((24, 48, 48)), 8, (12, 24, 24))
    return from_array(arr.astype(np.uint8), spacing=(2.0, 2.0, 2.0))


def test_generate_field_shift_moves_com(sphere_mask):
    from platipy_tpu.generation.dvf import generate_field_shift

    shifted, tfm, dvf = generate_field_shift(
        sphere_mask, vector_shift=(0, 0, 10), gaussian_smooth=2
    )
    com0 = np.asarray(get_com(sphere_mask, real_coords=True))
    com1 = np.asarray(get_com(shifted, real_coords=True))
    delta = com1 - com0
    # (z,y,x)=(0,0,10) mm shift: the x COM moves ~10 mm, z/y stay put
    assert abs(abs(delta[0]) - 10) < 3.0, delta
    assert np.all(np.abs(delta[1:]) < 2.0), delta
    assert np.asarray(dvf.array).shape == sphere_mask.spatial_shape + (3,)


def test_generate_field_expand_and_contract(sphere_mask):
    from platipy_tpu.generation.dvf import generate_field_expand

    vol0 = np.asarray(sphere_mask.array).sum()
    grown, _, _ = generate_field_expand(sphere_mask, expand=6, gaussian_smooth=2)
    assert np.asarray(grown.array).sum() > vol0 * 1.2

    shrunk, _, _ = generate_field_expand(sphere_mask, expand=-6, gaussian_smooth=2)
    assert np.asarray(shrunk.array).sum() < vol0 * 0.8


def test_generate_field_asymmetric(sphere_mask):
    from platipy_tpu.generation.dvf import (
        generate_field_asymmetric_contract,
        generate_field_asymmetric_extend,
    )

    vol0 = np.asarray(sphere_mask.array).sum()
    contracted, _, dvf_c = generate_field_asymmetric_contract(
        sphere_mask, vector_asymmetric_contract=(0, 0, 8), gaussian_smooth=2
    )
    extended, _, dvf_e = generate_field_asymmetric_extend(
        sphere_mask, vector_asymmetric_extend=(0, 0, 8), gaussian_smooth=2
    )
    assert np.asarray(contracted.array).sum() < vol0
    assert np.asarray(extended.array).sum() > vol0
    assert float(np.abs(np.asarray(dvf_c.array)).max()) > 0
    assert float(np.abs(np.asarray(dvf_e.array)).max()) > 0


def test_generate_field_radial_bend(sphere_mask):
    from platipy_tpu.generation.dvf import generate_field_radial_bend

    body = sphere_mask.with_array(
        np.ones(sphere_mask.spatial_shape, np.uint8)
    )
    bent, _, dvf = generate_field_radial_bend(
        sphere_mask, body, reference_point=(12, 24, 24),
        axis_of_rotation=(0, 0, -1), scale=0.1,
        mask_bend_from_reference_point=("z", "inf"), gaussian_smooth=2,
    )
    assert np.asarray(bent.array).sum() > 0
    assert float(np.abs(np.asarray(dvf.array)).max()) > 0


def test_apply_augmentation_composes(sphere_mask):
    from platipy_tpu.generation.augment import ShiftAugment, apply_augmentation

    rng = np.random.RandomState(0)
    ct = from_array(
        (np.asarray(sphere_mask.array) * 1040.0 - 1000
         + rng.rand(24, 48, 48).astype(np.float32)).astype(np.float32),
        spacing=(2.0, 2.0, 2.0),
    )
    aug = ShiftAugment(sphere_mask, vector_shift=(0, 0, 12), gaussian_smooth=2)
    image_aug, masks_aug, dvf = apply_augmentation(ct, aug, masks=[sphere_mask])
    com0 = np.asarray(get_com(sphere_mask, real_coords=True))
    com1 = np.asarray(get_com(masks_aug[0], real_coords=True))
    assert abs(abs((com1 - com0)[0]) - 12) < 4.0
    # the image deformed consistently with the mask: bright voxels live
    # where the shifted mask is
    img_arr = np.asarray(image_aug.array)
    m_arr = np.asarray(masks_aug[0].array) > 0
    assert img_arr[m_arr].mean() > -500


def test_generate_random_augmentation_samples(sphere_mask):
    import random

    from platipy_tpu.generation.augment import (
        DeformableAugment, generate_random_augmentation,
    )

    random.seed(3)
    ct = from_array(
        (np.asarray(sphere_mask.array) * 1040.0 - 1000).astype(np.float32),
        spacing=(2.0, 2.0, 2.0),
    )
    augmentations = generate_random_augmentation(ct, [sphere_mask])
    assert len(augmentations) >= 1
    for aug in augmentations:
        assert isinstance(aug, DeformableAugment)


def test_extend_mask_both_directions(sphere_mask):
    from platipy_tpu.generation.mask import extend_mask

    arr0 = np.asarray(sphere_mask.array)
    sup = extend_mask(sphere_mask, direction=("ax", "sup"), extension_mm=10,
                      interior_mm_shape=6)
    inf = extend_mask(sphere_mask, direction=("ax", "inf"), extension_mm=10,
                      interior_mm_shape=6)
    z0 = np.where(arr0.any(axis=(1, 2)))[0]
    z_sup = np.where(np.asarray(sup.array).any(axis=(1, 2)))[0]
    z_inf = np.where(np.asarray(inf.array).any(axis=(1, 2)))[0]
    assert z_sup.max() > z0.max()          # extended superiorly
    # the inf branch was a silent no-op in the reference (mask.py:150-154)
    assert z_inf.min() < z0.min()          # extended inferiorly
    assert z_inf.max() == z0.max()
