"""Deformable augmentation framework
(reference: platipy/imaging/generation/augment.py:33-205)."""

from __future__ import annotations

import random
from abc import ABC, abstractmethod
from collections.abc import Iterable

import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.core.interp import INTERP_LINEAR, INTERP_NEAREST
from platipy_tpu.core.resample import warp_image
from platipy_tpu.generation.dvf import generate_field_expand, generate_field_shift
from platipy_tpu.generation.mask import get_bone_mask

__all__ = [
    "apply_augmentation",
    "generate_random_augmentation",
    "DeformableAugment",
    "ShiftAugment",
    "ExpandAugment",
    "ContractAugment",
]


def apply_augmentation(image: Image, augmentation, masks=[]):
    """Apply one or more deformable augmentations to an image (+masks).

    Mirrors reference augment.py:33-83: transforms are composed by summing the
    displacement fields, the image warped with linear interpolation (default =
    image minimum), masks with nearest neighbour.
    """
    if not isinstance(image, Image):
        raise AttributeError("image should be a platipy_tpu Image")

    if isinstance(augmentation, DeformableAugment):
        augmentation = [augmentation]

    if not isinstance(augmentation, Iterable):
        raise AttributeError(
            "augmentation must be a DeformableAugment or an iterable (such as list) of"
            "DeformableAugment's"
        )

    dvf = None
    for aug in augmentation:
        if not isinstance(aug, DeformableAugment):
            raise AttributeError("Each augmentation must be of type DeformableAugment")
        _, field = aug.augment()
        dvf = field if dvf is None else dvf.with_array(dvf.array + field.array)

    default = float(np.asarray(image.array).min())
    image_deformed = warp_image(
        image.astype(jnp.float32), dvf, reference=image,
        interp=INTERP_LINEAR, default_value=int(default),
    ).astype(image.array.dtype)

    masks_deformed = []
    for mask in masks:
        warped = warp_image(
            mask.astype(jnp.float32), dvf, reference=mask,
            interp=INTERP_NEAREST, default_value=0.0,
        )
        masks_deformed.append(
            mask.with_array(jnp.rint(warped.array).astype(mask.array.dtype))
        )

    if masks:
        return image_deformed, masks_deformed, dvf

    return image_deformed, dvf


def generate_random_augmentation(ct_image: Image, masks):
    """Randomised per-structure augmentation sampler (reference :86-141)."""
    random.shuffle(masks)

    augmentation_types = [
        {
            "class": ShiftAugment,
            # middle range fixed to (-10, 10): the reference's (10, 10)
            # (augment.py:96) pins every sampled y-shift to exactly +10 mm
            "args": {"vector_shift": [(-10, 10), (-10, 10), (-10, 10)],
                     "gaussian_smooth": (3, 5)},
        },
        {
            "class": ContractAugment,
            "args": {"vector_contract": [(0, 10), (0, 10), (0, 10)],
                     "gaussian_smooth": (3, 5), "bone_mask": True},
        },
        {
            "class": ExpandAugment,
            "args": {"vector_expand": [(0, 10), (0, 10), (0, 10)],
                     "gaussian_smooth": (3, 5), "bone_mask": True},
        },
    ]

    augmentation = []
    for mask in masks:
        aug = random.choice(augmentation_types)
        aug_class = aug["class"]
        aug_args = {}
        for arg in aug["args"]:
            value = aug["args"][arg]
            if isinstance(value, list):
                value = [random.randint(rng[0], rng[1]) for rng in value]
            elif isinstance(value, tuple):
                value = random.randint(value[0], value[1])
            if arg == "bone_mask" and aug["args"][arg]:
                value = get_bone_mask(ct_image)
            aug_args[arg] = value
        augmentation.append(aug_class(mask, **aug_args))
    return augmentation


class DeformableAugment(ABC):
    @abstractmethod
    def augment(self):
        pass


class ShiftAugment(DeformableAugment):
    def __init__(self, mask, vector_shift=(10, 10, 10), gaussian_smooth=5):
        self.mask = mask
        self.vector_shift = vector_shift
        self.gaussian_smooth = gaussian_smooth

    def augment(self):
        _, transform, dvf = generate_field_shift(
            self.mask, self.vector_shift, self.gaussian_smooth
        )
        return transform, dvf


class ExpandAugment(DeformableAugment):
    def __init__(self, mask, vector_expand=(10, 10, 10), gaussian_smooth=5, bone_mask=False):
        self.mask = mask
        self.vector_expand = vector_expand
        self.gaussian_smooth = gaussian_smooth
        self.bone_mask = bone_mask

    def augment(self):
        _, transform, dvf = generate_field_expand(
            self.mask, bone_mask=self.bone_mask, expand=self.vector_expand,
            gaussian_smooth=self.gaussian_smooth,
        )
        return transform, dvf


class ContractAugment(DeformableAugment):
    def __init__(self, mask, vector_contract=(10, 10, 10), gaussian_smooth=5, bone_mask=False):
        self.mask = mask
        self.contract = [int(-x / s) for x, s in zip(vector_contract, mask.spacing)]
        self.gaussian_smooth = gaussian_smooth
        self.bone_mask = bone_mask

    def augment(self):
        _, transform, dvf = generate_field_expand(
            self.mask, bone_mask=self.bone_mask, expand=self.contract,
            gaussian_smooth=self.gaussian_smooth,
        )
        return transform, dvf
