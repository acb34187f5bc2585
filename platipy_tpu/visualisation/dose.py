"""Dose overlay figure (API mirror of platipy/imaging/visualisation/dose.py:50)."""

from __future__ import annotations

import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.label.utils import get_com
from platipy_tpu.visualisation.visualiser import ImageVisualiser

__all__ = ["visualise_dose", "is_color_dark", "roundup"]


def is_color_dark(color) -> bool:
    """Perceptual darkness of an RGB(A) colour (reference dose.py:19-34)."""
    import matplotlib.colors as mcolors

    r, g, b = mcolors.to_rgb(color)
    hsp = np.sqrt(0.299 * r**2 + 0.587 * g**2 + 0.114 * b**2)
    return hsp < 0.5 ** 0.5


def roundup(x, nearest):
    return int(np.ceil(x / nearest)) * nearest


def visualise_dose(
    img: Image,
    dose: Image,
    structures: dict = None,
    dose_threshold: float = 5.0,
    title="Dose",
    contour_cmap="rainbow",
    dose_cmap="inferno",
    **kwargs,
):
    """Dose colourwash over the image with optional structure contours.

    Returns (figure, ImageVisualiser).
    """
    if structures:
        first = structures[list(structures.keys())[0]]
        cut = get_com(first)
    else:
        cut = None

    vis = ImageVisualiser(img, cut=cut, **kwargs)
    vis.add_scalar_overlay(
        dose, name="Dose (Gy)", colormap=dose_cmap,
        min_value=dose_threshold, show_colorbar=True,
    )
    if structures:
        vis.add_contour(structures)
    fig = vis.show()
    if title:
        fig.suptitle(title)
    return fig, vis
