"""Visualisation helper dataclasses and slicing utilities
(API mirror of platipy/imaging/visualisation/utils.py:26-335)."""

from __future__ import annotations

import numpy as np

from platipy_tpu.core.image import Image

__all__ = [
    "VisualiseImage",
    "VisualiseContour",
    "VisualiseScalarOverlay",
    "VisualiseVectorOverlay",
    "VisualiseComparisonOverlay",
    "VisualiseBoundingBox",
    "return_slice",
    "subsample_vector_field",
    "vector_image_grid",
    "reorientate_vector_field",
    "generate_comparison_colormix",
    "project_onto_arbitrary_plane",
    "view_axis",
]

_VIEW_AXIS = {"z": 0, "ax": 0, "axial": 0, "y": 1, "cor": 1, "coronal": 1,
              "x": 2, "sag": 2, "sagittal": 2}


def view_axis(view: str) -> int:
    return _VIEW_AXIS[view]


class VisualiseImage:
    """Base image display options (reference utils.py:26-35)."""

    def __init__(self, image, aspect=None, interpolation=None, origin=None,
                 colormap=None, clim=None):
        self.image = image
        self.aspect = aspect
        self.interpolation = interpolation
        self.origin = origin
        self.colormap = colormap
        self.clim = clim


class VisualiseContour:
    def __init__(self, image, name, color=None, linewidth=2, linestyle="solid"):
        self.image = image
        self.name = name
        self.color = color
        self.linewidth = linewidth
        self.linestyle = linestyle


class VisualiseScalarOverlay:
    def __init__(self, image, name, colormap="magma", alpha=0.75, min_value=False,
                 max_value=False, discrete_levels=False, mid_ticks=False,
                 show_colorbar=True, norm=None, projection=False,
                 show_as_contours=False):
        self.image = image
        self.name = name
        self.colormap = colormap
        self.alpha = alpha
        self.min_value = min_value
        self.max_value = max_value
        self.discrete_levels = discrete_levels
        self.mid_ticks = mid_ticks
        self.show_colorbar = show_colorbar
        self.norm = norm
        self.projection = projection
        self.show_as_contours = show_as_contours


class VisualiseVectorOverlay:
    def __init__(self, image, name, colormap="inferno", alpha=0.75, arrow_scale=0.25,
                 arrow_width=1, subsample=4, color_function="perpendicular",
                 invert_field=True, show_colorbar=True, min_value=False,
                 max_value=False, discrete_levels=False, mid_ticks=False):
        self.image = image
        self.name = name
        self.colormap = colormap
        self.alpha = alpha
        self.arrow_scale = arrow_scale
        self.arrow_width = arrow_width
        self.subsample = subsample
        self.color_function = color_function
        self.invert_field = invert_field
        self.show_colorbar = show_colorbar
        self.min_value = min_value
        self.max_value = max_value
        self.discrete_levels = discrete_levels
        self.mid_ticks = mid_ticks


class VisualiseComparisonOverlay:
    def __init__(self, image, name, color_rotation=0.35):
        self.image = image
        self.name = name
        self.color_rotation = color_rotation


class VisualiseBoundingBox:
    def __init__(self, bounding_box, name, color="r", linewidth=2):
        if isinstance(bounding_box, Image):
            from platipy_tpu.utils.crop import label_to_roi

            bounding_box = label_to_roi(bounding_box, return_as_list=True)
        self.bounding_box = bounding_box
        self.name = name
        self.color = color
        self.linewidth = linewidth


def return_slice(axis: int, index: int):
    """Slicer tuple for a cut along a [z,y,x] axis (reference utils.py:139-157)."""
    if axis == 0:
        return (index, slice(None), slice(None))
    if axis == 1:
        return (slice(None), index, slice(None))
    return (slice(None), slice(None), index)


def subsample_vector_field(axis: int, cut: int, subsample=1):
    """Index arrays for quiver subsampling (reference utils.py:160-194)."""
    if hasattr(subsample, "__iter__"):
        subsample_ax, subsample_cor, subsample_sag = subsample
    else:
        subsample_ax = subsample_cor = subsample_sag = subsample

    if axis == 0:
        return (cut, slice(None, None, subsample_cor), slice(None, None, subsample_sag))
    if axis == 1:
        return (slice(None, None, subsample_ax), cut, slice(None, None, subsample_sag))
    return (slice(None, None, subsample_ax), slice(None, None, subsample_cor), cut)


def vector_image_grid(axis: int, vector_field_array, subsample=1):
    """Coordinate grids for a quiver plot (reference utils.py:197-228)."""
    if hasattr(subsample, "__iter__"):
        subsample_ax, subsample_cor, subsample_sag = subsample
    else:
        subsample_ax = subsample_cor = subsample_sag = subsample

    shape = vector_field_array.shape[:3]
    if axis == 0:
        y, x = np.mgrid[0 : shape[1] : subsample_cor, 0 : shape[2] : subsample_sag]
    elif axis == 1:
        y, x = np.mgrid[0 : shape[0] : subsample_ax, 0 : shape[2] : subsample_sag]
    else:
        y, x = np.mgrid[0 : shape[0] : subsample_ax, 0 : shape[1] : subsample_cor]
    return x, y


def reorientate_vector_field(axis: int, vector_ax, vector_cor, vector_sag,
                             invert_field=True):
    """In-plane vector components per view (reference utils.py:231-257)."""
    if invert_field:
        vector_ax = -vector_ax
        vector_cor = -vector_cor
        vector_sag = -vector_sag
    if axis == 0:   # axial: in-plane = (sag, cor)
        return vector_sag, vector_cor, vector_ax
    if axis == 1:   # coronal
        return vector_sag, vector_ax, vector_cor
    return vector_cor, vector_ax, vector_sag


def generate_comparison_colormix(image_list, arr_slices=None, color_rotation=0.35):
    """Blend two image slices into an RGB comparison (reference utils.py:260-302)."""
    import matplotlib.colors as mcolors

    if arr_slices is None:
        arr_slices = [np.asarray(i.array) if isinstance(i, Image) else np.asarray(i)
                      for i in image_list]
    combined = np.concatenate([a.ravel() for a in arr_slices])
    window_min = np.percentile(combined, 1)
    window_max = np.percentile(combined, 99)
    scale = max(window_max - window_min, 1e-9)
    a0 = np.clip((arr_slices[0] - window_min) / scale, 0, 1)
    a1 = np.clip((arr_slices[1] - window_min) / scale, 0, 1)

    hue = (color_rotation + 0.5 * (a1 - a0)) % 1.0
    sat = np.abs(a1 - a0)
    val = np.maximum(a0, a1)
    hsv = np.stack([hue, sat, val], axis=-1)
    return mcolors.hsv_to_rgb(hsv)


def project_onto_arbitrary_plane(
    image: Image,
    projection_name: str = "mean",
    projection_axis: int = 0,
    rotation_axis=(1, 0, 0),
    rotation_angle: float = 0,
    default_value: float = -1000,
    resample_interpolation=None,
):
    """Rotate the volume about its physical centre, then project along an
    axis (reference utils.py:305-368).  Returns the projected 2-D numpy
    array (the reference returns a 2-D sitk image slice)."""
    import numpy as _np

    from platipy_tpu.core.interp import INTERP_LINEAR
    from platipy_tpu.utils.geometry import rotate_image

    size = image.size  # (x, y, z)
    centre_index = [(s - 1) / 2.0 for s in size]
    centre_phys = image.physical_point(centre_index)

    interp = resample_interpolation if resample_interpolation is not None else INTERP_LINEAR
    rotated = rotate_image(
        image,
        rotation_centre=centre_phys,
        rotation_axis=rotation_axis,
        rotation_angle_radians=rotation_angle,
        interpolation=interp,
        default_value=default_value,
    )

    arr = _np.asarray(rotated.array)
    # projection_axis follows the reference's sitk x/y/z order: 0=x, 1=y, 2=z
    np_axis = {0: 2, 1: 1, 2: 0}[int(projection_axis)]
    reducers = {
        "sum": _np.sum, "mean": _np.mean, "median": _np.median,
        "std": _np.std, "min": _np.min, "max": _np.max,
    }
    return reducers[projection_name](arr, axis=np_axis)
