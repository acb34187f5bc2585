"""Example: register two images and visualise the deformation.

Run: python examples/visualise_registration.py  (writes registration.png)
"""

import numpy as np

from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere
from platipy_tpu.registration.deformable import fast_symmetric_forces_demons_registration
from platipy_tpu.visualisation.visualiser import ImageVisualiser


def main():
    fixed = from_array(
        (insert_sphere(np.zeros((32, 64, 64)), 14, (16, 32, 32)) * 1040 - 1000).astype(np.float32),
        spacing=(1.5, 1.5, 2.0),
    )
    moving = from_array(
        (insert_sphere(np.zeros((32, 64, 64)), 11, (18, 34, 30)) * 1040 - 1000).astype(np.float32),
        spacing=(1.5, 1.5, 2.0),
    )

    registered, tfm, dvf = fast_symmetric_forces_demons_registration(
        fixed, moving, resolution_staging=[4, 2], iteration_staging=[20, 10],
        isotropic_resample=True,
    )

    vis = ImageVisualiser(fixed, axis="z")
    vis.add_comparison_overlay(registered)
    vis.add_vector_overlay(dvf, subsample=8)
    fig = vis.show()
    fig.savefig("registration.png", dpi=120, bbox_inches="tight")
    print("wrote registration.png")


if __name__ == "__main__":
    main()
