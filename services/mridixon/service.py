"""MRI Dixon fat/water-fraction service (reference:
services/mridixon/service.py:28-100).

Takes a fat and a water Dixon image (selected via ``meta_data["image_type"]``,
falling back to input order) and computes percentage fraction maps:
``fat_fraction = 100*fat/(fat+water)`` (0 where the divisor is 0), likewise
for water.  Outputs ``fat.nii.gz`` / ``water.nii.gz`` like the reference.
"""

import logging
import os

import jax.numpy as jnp

from platipy_tpu.backend.application import app
from platipy_tpu.nifti.io import read_image, write_image

logger = logging.getLogger(__name__)

MRI_DIXON_SETTINGS_DEFAULTS = {}


@app.register("MRI Dixon", default_settings=MRI_DIXON_SETTINGS_DEFAULTS)
def mri_dixon_analysis(data_objects, working_dir, settings):
    """Calculate fat/water fraction maps for MRI Dixon fat+water images."""
    logger.info("Running Dixon analysis Calculation")
    logger.info("Using settings: %s", settings)

    fat_obj = None
    water_obj = None
    for data_obj in data_objects:
        image_type = (data_obj.get("meta_data") or {}).get("image_type")
        if image_type == "fat":
            fat_obj = data_obj
        if image_type == "water":
            water_obj = data_obj
    if fat_obj is None and water_obj is None and len(data_objects) >= 2:
        fat_obj, water_obj = data_objects[0], data_objects[1]
    if fat_obj is None or water_obj is None:
        logger.error("Both Fat and Water Images are required")
        return []

    fat_img = read_image(fat_obj["path"]).astype(jnp.float32)
    water_img = read_image(water_obj["path"]).astype(jnp.float32)

    divisor = water_img.array + fat_img.array
    safe = jnp.where(divisor == 0, 1.0, divisor)
    fat_fraction = jnp.where(divisor == 0, 0.0, fat_img.array * 100.0 / safe)
    water_fraction = jnp.where(divisor == 0, 0.0, water_img.array * 100.0 / safe)

    fat_fraction_file = os.path.join(working_dir, "fat.nii.gz")
    write_image(fat_img.with_array(fat_fraction), fat_fraction_file)
    water_fraction_file = os.path.join(working_dir, "water.nii.gz")
    write_image(water_img.with_array(water_fraction), water_fraction_file)

    return [
        {"path": fat_fraction_file, "parent_id": fat_obj["id"]},
        {"path": water_fraction_file, "parent_id": water_obj["id"]},
    ]


# short alias kept for earlier deployments of this framework
mri_dixon_service = mri_dixon_analysis
