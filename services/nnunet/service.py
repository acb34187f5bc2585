"""CNN (U-Net) segmentation service (reference: services/nnunet/service.py:87)."""

import logging
import os

from platipy_tpu.backend.application import app
from platipy_tpu.nifti.io import read_image, write_image
from platipy_tpu.projects.nnunet.run import NNUNET_SETTINGS_DEFAULTS, run_segmentation

logger = logging.getLogger(__name__)


@app.register("nnUNet Segmentation", default_settings=NNUNET_SETTINGS_DEFAULTS)
def nnunet_service(data_objects, working_dir, settings):
    output_objects = []
    for data_object in data_objects:
        img = read_image(data_object["path"])
        results = run_segmentation(img, settings)
        for name, mask in results.items():
            out_path = os.path.join(working_dir, f"{name}.nii.gz")
            write_image(mask, out_path)
            output_objects.append({"path": out_path, "parent_id": data_object["id"]})
    return output_objects
