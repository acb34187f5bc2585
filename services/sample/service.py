"""Sample (bone segmentation) service (reference: services/sample/service.py:27)."""

import logging
import os

from platipy_tpu.backend.application import app
from platipy_tpu.generation.mask import get_bone_mask
from platipy_tpu.nifti.io import read_image, write_image

logger = logging.getLogger(__name__)

SAMPLE_SETTINGS_DEFAULTS = {"lower_threshold": 350, "upper_threshold": 3500}


@app.register("Bone Segmentation (sample)", default_settings=SAMPLE_SETTINGS_DEFAULTS)
def bone_segmentation_service(data_objects, working_dir, settings):
    output_objects = []
    for data_object in data_objects:
        img = read_image(data_object["path"])
        mask = get_bone_mask(
            img,
            lower_threshold=settings["lower_threshold"],
            upper_threshold=settings["upper_threshold"],
        )
        out_path = os.path.join(working_dir, "Auto_Bones.nii.gz")
        write_image(mask, out_path)
        output_objects.append({"path": out_path, "parent_id": data_object["id"]})
    return output_objects
