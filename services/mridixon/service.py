"""MRI Dixon processing service (reference: services/mridixon/service.py:27).

Computes fat/water images from in-phase/out-of-phase Dixon pairs:
water = (IP + OP) / 2, fat = (IP - OP) / 2.
"""

import logging
import os

import jax.numpy as jnp
import numpy as np

from platipy_tpu.backend.application import app
from platipy_tpu.nifti.io import read_image, write_image

logger = logging.getLogger(__name__)

MRI_DIXON_SETTINGS_DEFAULTS = {}


@app.register("MRI Dixon", default_settings=MRI_DIXON_SETTINGS_DEFAULTS)
def mri_dixon_service(data_objects, working_dir, settings):
    """Inputs: in-phase then out-of-phase images; outputs fat/water volumes."""
    if len(data_objects) < 2:
        raise ValueError("MRI Dixon requires in-phase and out-of-phase images")
    ip = read_image(data_objects[0]["path"]).astype(jnp.float32)
    op = read_image(data_objects[1]["path"]).astype(jnp.float32)

    water = ip.with_array((ip.array + op.array) / 2.0)
    fat = ip.with_array((ip.array - op.array) / 2.0)

    water_path = os.path.join(working_dir, "water.nii.gz")
    fat_path = os.path.join(working_dir, "fat.nii.gz")
    write_image(water, water_path)
    write_image(fat, fat_path)
    return [
        {"path": water_path, "parent_id": data_objects[0]["id"]},
        {"path": fat_path, "parent_id": data_objects[0]["id"]},
    ]
