"""Example: DVH analysis of a synthetic dose grid.

Run: python examples/dvh_analysis.py
"""

import numpy as np

from platipy_tpu.core.image import from_array
from platipy_tpu.dose.dvh import calculate_d_x, calculate_dvh_for_labels, calculate_v_x


def main():
    shape = (30, 40, 40)
    zz = np.mgrid[: shape[0], : shape[1], : shape[2]][0]
    dose = from_array((zz / (shape[0] - 1) * 60).astype(np.float32), spacing=(2, 2, 2))

    ptv = np.zeros(shape, np.uint8)
    ptv[10:20, 15:25, 15:25] = 1
    labels = {"PTV": from_array(ptv, spacing=(2, 2, 2))}

    dvh = calculate_dvh_for_labels(dose, labels)
    print(calculate_d_x(dvh, [95, 50, 2]))
    print(calculate_v_x(dvh, [20.0, 40.0]))


if __name__ == "__main__":
    main()
