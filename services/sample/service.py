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


PRIMITIVE_SETTINGS_DEFAULTS = {
    "seed": [0, 0, 0],           # (x, y, z) index, reference order
    # the grown region is AIR (then inverted to the body) — the reference's
    # thresholds (sample.py:29-31); tissue thresholds here would invert to
    # everything-but-body
    "lowerThreshold": -5000,
    "upperThreshold": -800,
    "vectorRadius": [1, 1, 1],
    "outputContourName": "primitive_body_contour",
}


@app.register("Primitive Body Segmentation",
              default_settings=PRIMITIVE_SETTINGS_DEFAULTS)
def primitive_body_segmentation(data_objects, working_dir, settings):
    """Seeded connected-threshold body segmentation (reference
    platipy/backend/sample/sample.py:36-82): region grow from the seed,
    morphological closing, then invert."""
    from platipy_tpu.core.components import connected_threshold
    from platipy_tpu.core.morphology import binary_closing

    logger.info("Running Primitive Body Segmentation")
    logger.info("Using settings: %s", settings)

    output_objects = []
    for data_object in data_objects:
        img = read_image(data_object["path"])
        seg = connected_threshold(
            img, [tuple(int(v) for v in settings["seed"])],
            lower=settings["lowerThreshold"], upper=settings["upperThreshold"],
        )
        seg = binary_closing(seg, radius=tuple(settings["vectorRadius"]))
        mask = seg.with_array(1 - seg.array)

        out_path = os.path.join(
            working_dir, "{0}.nii.gz".format(settings["outputContourName"])
        )
        write_image(mask, out_path)
        output_objects.append({"path": out_path, "parent_id": data_object["id"]})
    return output_objects
