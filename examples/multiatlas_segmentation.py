"""Example: 10-atlas segmentation of a synthetic pseudo-CT case.

Run: python examples/multiatlas_segmentation.py
"""

import copy

import numpy as np

from platipy_tpu.label.comparison import compute_metric_dsc
from platipy_tpu.projects.multiatlas.run import (
    MUTLIATLAS_SETTINGS_DEFAULTS,
    run_segmentation,
)
from platipy_tpu.generation.image import insert_sphere
from platipy_tpu.core.image import from_array


def pseudo_case(center, radius, shape=(48, 96, 96), spacing=(1.5, 1.5, 2.0)):
    ct = insert_sphere(np.zeros(shape), radius, center) * 1040 - 1000
    mask = insert_sphere(np.zeros(shape), radius, center).astype(np.uint8)
    return (
        from_array(ct.astype(np.float32), spacing=spacing),
        from_array(mask, spacing=spacing),
    )


def main():
    rng = np.random.RandomState(0)
    target_img, target_mask = pseudo_case((24, 48, 48), 18)

    atlas_set = {}
    for i in range(10):
        j = rng.randint(-3, 4, 3)
        img, mask = pseudo_case((24 + j[0], 48 + j[1], 48 + j[2]), 18 + rng.randint(-2, 3))
        atlas_set[f"{i:02d}"] = {"CT Image": img, "WHOLEHEART": mask}

    settings = copy.deepcopy(MUTLIATLAS_SETTINGS_DEFAULTS)
    settings["atlas_settings"]["atlas_set"] = atlas_set
    settings["atlas_settings"]["atlas_id_list"] = list(atlas_set)
    settings["atlas_settings"]["atlas_structure_list"] = ["WHOLEHEART"]
    settings["deformable_registration_settings"]["resolution_staging"] = [8, 4, 2]
    settings["deformable_registration_settings"]["iteration_staging"] = [20, 15, 10]

    results, probabilities = run_segmentation(target_img, settings)
    dsc = compute_metric_dsc(target_mask, results["WHOLEHEART"])
    print(f"WHOLEHEART DSC vs ground truth: {dsc:.4f}")


if __name__ == "__main__":
    main()
