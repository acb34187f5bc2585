"""ImageVisualiser — declarative medical image figure builder
(behavioural mirror of platipy/imaging/visualisation/visualiser.py:53-1877).

Overlays are registered with ``add_*`` methods and rendered in ``show()``.
Views: 'ortho' (axial / coronal / sagittal in the reference's 2x2 grid with
the top-right cell blank), single-plane 'x'/'y'/'z' (aliases
'sag'/'cor'/'ax'), each optionally as an intensity projection.  Rendering is
host-side matplotlib on numpy copies of the device arrays; the figure layout,
auto-windowing, origin conventions, colorbar placement, view-limit
adjustment and legend placement reproduce the reference
(visualiser.py:458-1877), organised here around per-view panes instead of
per-overlay methods.
"""

from __future__ import annotations

import logging
import warnings

import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.visualisation.utils import (
    VisualiseBoundingBox,
    VisualiseComparisonOverlay,
    VisualiseContour,
    VisualiseScalarOverlay,
    VisualiseVectorOverlay,
    generate_comparison_colormix,
    project_onto_arbitrary_plane,
    reorientate_vector_field,
    return_slice,
    subsample_vector_field,
    vector_image_grid,
    view_axis,
)

logger = logging.getLogger(__name__)

__all__ = ["ImageVisualiser"]

_AXIS_ALIASES = {"ax": "z", "axial": "z", "cor": "y", "coronal": "y",
                 "sag": "x", "sagittal": "x"}

# sitk-order projection axis per view (reference utils.py:305-368 takes the
# axis in x/y/z order: x=0, y=1, z=2)
_PROJECTION_AXIS = {"z": 2, "y": 1, "x": 0}


def _as_colormap(cm):
    import matplotlib

    if isinstance(cm, str):
        return matplotlib.colormaps[cm]
    return cm


class _Pane:
    """One rendered 2-D view: owns the matplotlib axes plus the conventions
    (slice axis, display origin, aspect, extent) every overlay shares."""

    def __init__(self, view, ax, image, origin_mode, cut_index):
        self.view = view                     # 'z' | 'y' | 'x'
        self.ax = ax
        self.axis_index = view_axis(view)    # numpy [z,y,x] axis
        self.cut_index = cut_index
        size_sag, size_cor, size_ax = image.size
        # (left, right, bottom, top) in voxel coordinates (reference
        # visualiser.py:497-503)
        self.extent = {
            "x": (0, size_cor, 0, size_ax),
            "y": (0, size_sag, 0, size_ax),
            "z": (0, size_sag, 0, size_cor),
        }[view]
        sp_plane, _, sp_slice = image.spacing[0], image.spacing[1], image.spacing[2]
        asp = sp_slice / sp_plane
        self.aspect = 1.0 if view == "z" else asp
        # axial view honours the origin convention; the others render
        # feet-down (reference visualiser.py:576-585)
        if view == "z":
            self.origin = {"normal": "upper", "reversed": "lower"}[origin_mode]
        else:
            self.origin = "lower"

    def slice_of(self, image_or_array, projection=False, default_value=0):
        """Cut (or project) a volume into this pane's plane."""
        if projection:
            proj_name = "max" if projection is True else projection
            if isinstance(image_or_array, Image):
                return project_onto_arbitrary_plane(
                    image_or_array,
                    projection_name=proj_name,
                    projection_axis=_PROJECTION_AXIS[self.view],
                    default_value=default_value,
                )
            arr = np.asarray(image_or_array)
            reducer = {"sum": np.sum, "mean": np.mean, "median": np.median,
                       "std": np.std, "min": np.min, "max": np.max}[proj_name]
            return reducer(arr, axis=self.axis_index)
        arr = (np.asarray(image_or_array.array)
               if isinstance(image_or_array, Image) else np.asarray(image_or_array))
        return arr[return_slice(self.axis_index, self.cut_index)]

    def imshow(self, arr2d, **kwargs):
        kwargs.setdefault("origin", self.origin)
        kwargs.setdefault("extent", self.extent)
        kwargs.setdefault("aspect", self.aspect)
        kwargs.setdefault("interpolation", "none")
        return self.ax.imshow(arr2d, **kwargs)

    def contour(self, arr2d, **kwargs):
        kwargs.setdefault("origin", self.origin)
        kwargs.setdefault("extent", self.extent)
        return self.ax.contour(arr2d, **kwargs)


class ImageVisualiser:
    """Build figures of images + contours + scalar/vector/comparison overlays."""

    def __init__(self, image: Image, cut=None, axis="ortho", window=None,
                 figure_size_in=10, limits=None, colormap="Greys_r",
                 origin="normal", projection=False):
        self.__image = image
        self.__cut = cut
        self.__axis = _AXIS_ALIASES.get(axis, axis)
        self.__window = window
        self.__figure_size = figure_size_in
        self.__limits = limits
        self.__colormap = _as_colormap(colormap)
        self.__origin = origin
        self.__projection = projection

        self.__contours = []
        self.__scalar_overlays = []
        self.__vector_overlays = []
        self.__comparison_overlays = []
        self.__bounding_boxes = []
        self.__show_legend = False
        self.__contour_colormap = _as_colormap("rainbow")
        self.__figure = None
        self.__panes = []

    # -- declarative API -------------------------------------------------------
    def clear(self):
        self.__contours = []
        self.__scalar_overlays = []
        self.__vector_overlays = []
        self.__comparison_overlays = []
        self.__bounding_boxes = []

    def set_limits_from_label(self, label: Image, expansion=2):
        """Restrict display to the label extent (+expansion mm), matching the
        reference's limit layout per axis (visualiser.py:113-142)."""
        from platipy_tpu.utils.crop import label_to_roi

        (sag_size, cor_size, ax_size), (sag_0, cor_0, ax_0) = label_to_roi(
            label, expansion_mm=expansion
        )
        if self.__axis == "ortho":
            self.__limits = [ax_0, ax_0 + ax_size, cor_0, cor_0 + cor_size,
                             sag_0, sag_0 + sag_size]
        elif self.__axis == "x":
            self.__limits = [cor_0, cor_0 + cor_size, ax_0, ax_0 + ax_size]
        elif self.__axis == "y":
            self.__limits = [sag_0, sag_0 + sag_size, ax_0, ax_0 + ax_size]
        elif self.__axis == "z":
            self.__limits = [sag_0, sag_0 + sag_size, cor_0, cor_0 + cor_size]

    def add_contour(self, contour, name=None, color=None, colormap=None,
                    linewidth=2, linestyle="solid", show_legend=True):
        """Add contour(s): a binary Image, or a dict of name -> Image.

        ``color`` may be a single color (applied to all), a dict of
        name -> color, or None (cycled from ``colormap``, default rainbow) —
        reference visualiser.py:143-210.
        """
        if colormap is not None:
            self.__contour_colormap = _as_colormap(colormap)
        if isinstance(contour, dict):
            for cname, img in contour.items():
                if isinstance(color, dict):
                    contour_color = color.get(cname)
                else:
                    contour_color = color
                self.__contours.append(
                    VisualiseContour(img, cname, color=contour_color,
                                     linewidth=linewidth, linestyle=linestyle)
                )
        else:
            self.__contours.append(
                VisualiseContour(contour, name or "contour", color=color,
                                 linewidth=linewidth, linestyle=linestyle)
            )
        self.__show_legend = show_legend

    def add_scalar_overlay(self, image, name=None, colormap="magma", alpha=0.75,
                           min_value=False, max_value=False, discrete_levels=False,
                           mid_ticks=False, show_colorbar=True, norm=None,
                           projection=False, show_as_contours=False):
        self.__scalar_overlays.append(
            VisualiseScalarOverlay(image, name or "scalar", _as_colormap(colormap),
                                   alpha, min_value, max_value, discrete_levels,
                                   mid_ticks, show_colorbar, norm, projection,
                                   show_as_contours)
        )

    def add_vector_overlay(self, vector_image, name=None, colormap="inferno",
                           alpha=0.75, arrow_scale=0.25, arrow_width=1, subsample=4,
                           color_function="perpendicular", invert_field=True,
                           show_colorbar=True, min_value=False, max_value=False,
                           discrete_levels=False, mid_ticks=False):
        self.__vector_overlays.append(
            VisualiseVectorOverlay(vector_image, name or "vector",
                                   _as_colormap(colormap), alpha, arrow_scale,
                                   arrow_width, subsample, color_function,
                                   invert_field, show_colorbar, min_value,
                                   max_value, discrete_levels, mid_ticks)
        )

    def add_comparison_overlay(self, image, name=None, color_rotation=0.35):
        self.__comparison_overlays.append(
            VisualiseComparisonOverlay(image, name or "comparison", color_rotation)
        )

    def add_bounding_box(self, bounding_box, name=None, color="r", linewidth=2):
        self.__bounding_boxes.append(
            VisualiseBoundingBox(bounding_box, name or "bounding box", color,
                                 linewidth)
        )

    # -- windowing / layout ----------------------------------------------------
    def _auto_window(self, arr):
        """(level_min, range) window; CTs get a soft-tissue default
        (reference visualiser.py:465-481)."""
        if self.__window is not None:
            return self.__window
        lower = float(arr.min())
        if lower < -900:  # probably a CT
            return (-250, 600)
        upper = float(np.percentile(arr, 99))
        return (lower, upper - lower)

    def _resolve_cut(self, shape_zyx):
        ax_size, cor_size, sag_size = shape_zyx
        if self.__axis == "ortho":
            if self.__cut is None:
                self.__cut = [ax_size // 2, cor_size // 2, sag_size // 2]
            elif not hasattr(self.__cut, "__iter__"):
                self.__cut = [self.__cut] * 3
            else:
                self.__cut = list(self.__cut)
        else:
            if hasattr(self.__cut, "__iter__"):
                warnings.warn(
                    "You have selected a single axis and multiple slice "
                    "locations, attempting to match."
                )
                self.__cut = self.__cut[view_axis(self.__axis)]
            if self.__cut is None:
                self.__cut = {
                    "z": ax_size // 2, "y": cor_size // 2, "x": sag_size // 2,
                }[self.__axis]

    def _build_panes(self):
        """Create the figure + per-view panes with the reference layout."""
        import matplotlib.pyplot as plt

        arr = np.asarray(self.__image.array)
        ax_size, cor_size, sag_size = arr.shape[:3]
        sp_plane, _, sp_slice = self.__image.spacing
        asp = sp_slice / sp_plane
        fsize = self.__figure_size

        if self.__axis == "ortho":
            figure_size = (
                fsize,
                fsize * (asp * ax_size + cor_size) / (sag_size + cor_size),
            )
            self.__figure, ((ax_ax, blank), (ax_cor, ax_sag)) = plt.subplots(
                2, 2, figsize=figure_size,
                gridspec_kw={
                    "height_ratios": [cor_size / (asp * ax_size), 1],
                    "width_ratios": [sag_size, cor_size],
                },
            )
            blank.axis("off")
            panes = [
                _Pane("z", ax_ax, self.__image, self.__origin, self.__cut[0]),
                _Pane("y", ax_cor, self.__image, self.__origin, self.__cut[1]),
                _Pane("x", ax_sag, self.__image, self.__origin, self.__cut[2]),
            ]
            self.__figure.subplots_adjust(
                left=0, right=1, wspace=0.01, hspace=0.01, top=1, bottom=0
            )
        else:
            view = self.__axis
            if view == "x":
                figure_size = (fsize, fsize * (asp * ax_size) / cor_size)
            elif view == "y":
                figure_size = (fsize, fsize * (asp * ax_size) / sag_size)
            else:
                figure_size = (fsize, fsize * cor_size / sag_size)
            self.__figure, ax = plt.subplots(1, 1, figsize=figure_size)
            panes = [_Pane(view, ax, self.__image, self.__origin, self.__cut)]
            self.__figure.subplots_adjust(left=0, right=1, bottom=0, top=1)

        self.__panes = panes
        return panes

    # -- rendering -------------------------------------------------------------
    def show(self, interact=False):
        arr = np.asarray(self.__image.array).astype(np.float32)
        self._resolve_cut(arr.shape[:3])
        window = self._auto_window(arr)
        panes = self._build_panes()

        if self.__comparison_overlays:
            self._render_comparison(panes, arr)
        else:
            for pane in panes:
                base = pane.slice_of(self.__image, projection=self.__projection,
                                     default_value=int(arr.min()))
                pane.imshow(base, cmap=self.__colormap,
                            clim=(window[0], window[0] + window[1]))
        for pane in panes:
            pane.ax.axis("off")

        self._render_contours(panes)
        self._render_scalars(panes)
        self._render_vectors(panes)
        self._render_bounding_boxes(panes)
        self._adjust_view()
        self._add_legend()
        return self.__figure

    def _render_comparison(self, panes, arr):
        comp = self.__comparison_overlays[0]
        for pane in panes:
            base = pane.slice_of(self.__image)
            other = pane.slice_of(comp.image)
            rgb = generate_comparison_colormix(
                [self.__image, comp.image], arr_slices=[base, other],
                color_rotation=comp.color_rotation,
            )
            pane.imshow(rgb)

    def _contours_on_grid(self):
        """Contour images resampled onto the base grid when they differ
        (the reference resamples unconditionally, visualiser.py:1012)."""
        from platipy_tpu.core.interp import INTERP_NEAREST
        from platipy_tpu.registration.utils import apply_transform

        base = self.__image
        out = []
        for contour in self.__contours:
            img = contour.image
            if (img.spatial_shape != base.spatial_shape
                    or not np.allclose(img.origin, base.origin)
                    or not np.allclose(img.spacing, base.spacing)):
                img = apply_transform(img, reference_image=base,
                                      interpolator=INTERP_NEAREST)
            out.append((contour, img))
        return out

    def _render_contours(self, panes):
        if not self.__contours:
            return
        color_cycle = self.__contour_colormap(
            np.linspace(0, 1, max(len(self.__contours), 1))
        )
        color_index = 0
        resolved = []
        for contour, img in self._contours_on_grid():
            color = contour.color
            if color is None:
                color = color_cycle[color_index % len(color_cycle)]
                color_index += 1
            resolved.append((contour, img, color))

        with warnings.catch_warnings():
            warnings.filterwarnings(
                "ignore",
                message="No contour levels were found within the data range.",
            )
            for pane in panes:
                for contour, img, color in resolved:
                    c_slice = np.array(
                        pane.slice_of(img, projection=self.__projection,
                                      default_value=0),
                        copy=True,
                    )
                    if c_slice.sum() == 0:
                        # force a pixel so every structure appears in the
                        # legend even off-slice (reference visualiser.py:1052)
                        c_slice[0, 0] = 1
                    pane.contour(
                        c_slice, colors=[color], levels=[0.5],
                        linewidths=contour.linewidth,
                        linestyles=contour.linestyle, zorder=0,
                    )
                if pane is panes[0]:
                    for contour, _img, color in resolved:
                        pane.ax.plot([0], [0], lw=contour.linewidth,
                                     ls=contour.linestyle, c=color,
                                     label=contour.name)

    def _render_scalars(self, panes):
        for scalar_index, scalar in enumerate(self.__scalar_overlays):
            nda = np.asarray(scalar.image.array)
            s_max = scalar.max_value if scalar.max_value is not False else float(nda.max())
            s_min = scalar.min_value if scalar.min_value is not False else float(nda.min())
            colormap = _as_colormap(scalar.colormap)
            contour_levels = None
            if scalar.discrete_levels:
                colormap = colormap.resampled(scalar.discrete_levels)
            if scalar.show_as_contours:
                contour_levels = scalar.discrete_levels or 10
            projection = scalar.projection or self.__projection

            mappable = None
            for pane in panes:
                s_slice = pane.slice_of(scalar.image, projection=projection,
                                        default_value=int(nda.min()))
                s_slice = np.ma.masked_less_equal(s_slice, s_min)
                if scalar.show_as_contours:
                    cs = pane.contour(
                        s_slice, levels=contour_levels, cmap=colormap,
                        linewidths=[1], vmin=s_min, vmax=s_max,
                        alpha=scalar.alpha, norm=scalar.norm,
                    )
                    if mappable is None:
                        import matplotlib.cm
                        import matplotlib.colors as mcolors

                        norm = (scalar.norm if scalar.norm
                                else mcolors.Normalize(vmin=s_min, vmax=s_max))
                        mappable = matplotlib.cm.ScalarMappable(
                            norm=norm, cmap=colormap
                        )
                        mappable.set_array([])
                else:
                    view = pane.imshow(
                        s_slice, cmap=colormap, clim=(s_min, s_max),
                        vmin=s_min, vmax=s_max, alpha=scalar.alpha,
                        norm=scalar.norm,
                    )
                    if mappable is None:
                        mappable = view

            if scalar.show_colorbar and mappable is not None:
                self._draw_colorbar(mappable, scalar.name, scalar_index,
                                    s_min, s_max, scalar.discrete_levels,
                                    scalar.mid_ticks)

    def _draw_colorbar(self, mappable, label, index, v_min, v_max,
                       discrete_levels, mid_ticks):
        """Dedicated colorbar axes: right of the axial view in ortho mode,
        inset on the right in single-view mode with dark-background-aware
        tick colors (reference visualiser.py:1452-1516)."""
        ax = self.__panes[0].ax
        ax_box = ax.get_position(original=False)
        cbar_width = ax_box.width * 0.05
        cbar_color = "black"
        if self.__axis == "ortho":
            cax = self.__figure.add_axes((
                ax_box.x1 + 0.02 + (cbar_width + 0.1) * index,
                ax_box.y0 * 1.025, cbar_width,
                ax_box.height - ax_box.y0 * 0.05,
            ))
        else:
            cax = self.__figure.add_axes((
                ax_box.x1 - 0.02 - (cbar_width + 0.1) * (index + 1),
                0.025, cbar_width, ax_box.height - ax_box.y1 * 0.05,
            ))
            if np.linalg.norm(np.asarray(self.__colormap(0))[:3]) < 0.1:
                cbar_color = "white"

        cbar = self.__figure.colorbar(mappable, cax=cax, orientation="vertical")
        cbar.outline.set_edgecolor(color=cbar_color)
        cbar.ax.tick_params(color=cbar_color)
        cax.tick_params(axis="x", colors=cbar_color)
        cax.tick_params(axis="y", colors=cbar_color)
        cbar.set_label(label, color=cbar_color)
        cbar.solids.set_alpha(1)

        if discrete_levels:
            if mid_ticks:
                delta = (v_max - v_min) / discrete_levels
                cbar.set_ticks(np.linspace(v_min + delta / 2, v_max - delta / 2,
                                           discrete_levels))
                cbar.set_ticklabels(
                    [f"{v:g}" for v in np.linspace(v_min, v_max, discrete_levels)]
                )
            else:
                cbar.set_ticks(np.linspace(v_min, v_max, discrete_levels + 1))

    def _render_vectors(self, panes):
        if self.__projection and self.__vector_overlays:
            # warn and skip the layer — raising here would abort show() with
            # the base panes already rendered and a dangling half-built figure
            warnings.warn("Vector overlay is not implemented in projection "
                          "mode; skipping vector layers.")
            return
        spacing_zyx = self.__image.spacing_zyx
        for vector_index, vector in enumerate(self.__vector_overlays):
            v_arr = np.asarray(vector.image.array)  # [z,y,x,3], (x,y,z) comps
            colormap = _as_colormap(vector.colormap)
            if vector.discrete_levels:
                colormap = colormap.resampled(vector.discrete_levels)
            subsample = vector.subsample
            if not hasattr(subsample, "__iter__"):
                subsample = (subsample,) * 3
            # subsample is physical (mm): convert to voxel strides
            # (reference visualiser.py:1594-1597)
            subsample_vox = [
                max(int(np.ceil(s / sp)), 1)
                for s, sp in zip(subsample, spacing_zyx)
            ]
            min_value, max_value = vector.min_value, vector.max_value

            sp_vector = None
            for pane in panes:
                slicer = subsample_vector_field(pane.axis_index, pane.cut_index,
                                                subsample_vox)
                # NOTE: the reference transposes these slices
                # (visualiser.py:1559-1561), which only type-checks on square
                # in-plane grids; the untransposed form is correct for any
                # rectangle and identical display-wise on symmetric fields
                v_slice = v_arr[slicer]
                vec_ax = v_slice[..., 2]
                vec_cor = v_slice[..., 1]
                vec_sag = v_slice[..., 0]
                plot_u, plot_v, plot_c = reorientate_vector_field(
                    pane.axis_index, vec_ax, vec_cor, vec_sag,
                    invert_field=vector.invert_field,
                )
                plot_x_loc, plot_y_loc = vector_image_grid(
                    pane.axis_index, v_arr, subsample_vox
                )
                if self.__origin == "normal" and pane.view == "z":
                    plot_y_loc = np.flip(plot_y_loc, 1)
                    plot_u = -1.0 * plot_u
                if vector.color_function == "magnitude":
                    vector_color = np.sqrt(plot_u**2 + plot_v**2 + plot_c**2)
                else:  # 'perpendicular': signed out-of-plane component
                    vector_color = plot_c
                if max_value is False:
                    max_value = vector_color.max()
                if min_value is False:
                    min_value = vector_color.min()
                sp_vector = pane.ax.quiver(
                    plot_x_loc, plot_y_loc, plot_u, plot_v, vector_color,
                    cmap=colormap, units="xy",
                    scale=1.0 / max(vector.arrow_scale, 1e-9),
                    width=vector.arrow_width, minlength=0, linewidth=1,
                    alpha=vector.alpha, clim=[min_value, max_value],
                )

            if vector.show_colorbar and sp_vector is not None:
                self._draw_colorbar(sp_vector, vector.name, vector_index,
                                    min_value, max_value,
                                    vector.discrete_levels, vector.mid_ticks)

    def draw_bounding_box_on_axes(self, ax, view, box, add_label=True):
        """Draw one box on one axes; box = (sag_0, cor_0, ax_0, sag_d,
        cor_d, ax_d) in voxels (reference visualiser.py:1758-1787)."""
        view = _AXIS_ALIASES.get(view, view)
        if isinstance(view, int):
            view = {0: "z", 1: "y", 2: "x"}[view]
        sag_0, cor_0, ax_0, sag_d, cor_d, ax_d = box.bounding_box
        if view == "z":
            from_points = [sag_0, sag_0, sag_0 + sag_d, sag_0 + sag_d, sag_0]
            to_points = [cor_0, cor_0 + cor_d, cor_0 + cor_d, cor_0, cor_0]
        elif view == "y":
            from_points = [sag_0, sag_0 + sag_d, sag_0 + sag_d, sag_0, sag_0]
            to_points = [ax_0, ax_0, ax_0 + ax_d, ax_0 + ax_d, ax_0]
        elif view == "x":
            from_points = [cor_0, cor_0 + cor_d, cor_0 + cor_d, cor_0, cor_0]
            to_points = [ax_0, ax_0, ax_0 + ax_d, ax_0 + ax_d, ax_0]
        else:
            logger.error("Invalid view %r", view)
            return
        ax.plot(from_points, to_points, lw=box.linewidth, c=box.color,
                label=box.name if add_label else None)

    def _render_bounding_boxes(self, panes):
        for box in self.__bounding_boxes:
            for i, pane in enumerate(panes):
                self.draw_bounding_box_on_axes(pane.ax, pane.view, box,
                                               add_label=(i == 0))

    def _adjust_view(self):
        """Apply the limits: set axis ranges, re-ratio the ortho grid, and
        rescale the figure so panes stay proportionate (reference
        visualiser.py:877-996)."""
        if self.__limits is None:
            return
        import matplotlib.gridspec as gridspec

        figure = self.__figure
        if self.__axis == "ortho":
            ax_ax, ax_blank, ax_cor, ax_sag = figure.axes[:4]
            cax_list = figure.axes[4:]

            ax_orig_0, ax_orig_1 = sorted(ax_cor.get_ylim())
            cor_orig_0, cor_orig_1 = sorted(ax_ax.get_ylim())
            sag_orig_0, sag_orig_1 = sorted(ax_ax.get_xlim())

            ax_0, ax_1, cor_0, cor_1, sag_0, sag_1 = self.__limits
            ax_0, ax_1 = sorted([ax_0, ax_1])
            cor_0, cor_1 = sorted([cor_0, cor_1])
            sag_0, sag_1 = sorted([sag_0, sag_1])

            asp = ax_cor.get_aspect()
            ratio_x = ((cor_1 - cor_0) + (sag_1 - sag_0)) / (
                (cor_orig_1 - cor_orig_0) + (sag_orig_1 - sag_orig_0)
            )
            ratio_y = (1 / asp * (cor_1 - cor_0) + (ax_1 - ax_0)) / (
                1 / asp * (cor_orig_1 - cor_orig_0) + (ax_orig_1 - ax_orig_0)
            )

            ax_ax.set_xlim(sag_0, sag_1)
            if self.__origin == "reversed":
                ax_ax.set_ylim(cor_0, cor_1)
            else:
                # axial renders row 0 at the top, so the y-window mirrors
                ax_ax.set_ylim(cor_orig_1 - cor_1, cor_orig_1 - cor_0)
            ax_cor.set_xlim(sag_0, sag_1)
            ax_cor.set_ylim(ax_0, ax_1)
            ax_sag.set_xlim(cor_0, cor_1)
            ax_sag.set_ylim(ax_0, ax_1)

            gs = gridspec.GridSpec(
                2, 2,
                height_ratios=[(cor_1 - cor_0) / (asp * (ax_1 - ax_0)), 1],
                width_ratios=[sag_1 - sag_0, cor_1 - cor_0],
            )
            for spec_index, axes_obj in enumerate(
                (ax_ax, ax_blank, ax_cor, ax_sag)
            ):
                axes_obj.set_position(gs[spec_index].get_position(figure))
                axes_obj.set_subplotspec(gs[spec_index])

            ax_ax_bbox = gs[0].get_position(figure)
            for cax_index, cax in enumerate(cax_list):
                cbar_width = ax_ax_bbox.width * 0.05
                cax.set_position((
                    ax_ax_bbox.x1 + 0.02 + (cbar_width + 0.1) * cax_index,
                    ax_ax_bbox.y0 + 0.01, 0.05, ax_ax_bbox.height - 0.02,
                ))

            fig_size_x, fig_size_y = figure.get_size_inches()
            figure.set_size_inches(fig_size_x, fig_size_y * ratio_y / ratio_x)

        elif self.__axis in ("x", "y", "z"):
            ax = figure.axes[0]
            x_orig_0, x_orig_1 = ax.get_xlim()
            y_orig_0, y_orig_1 = ax.get_ylim()
            x_0, x_1, y_0, y_1 = self.__limits
            x_0, x_1 = sorted([x_0, x_1])
            y_0, y_1 = sorted([y_0, y_1])
            if self.__axis == "z" and self.__origin == "normal":
                cor_size = self.__image.size[1]
                y_1, y_0 = cor_size - y_0, cor_size - y_1
            ratio_x = np.abs(x_1 - x_0) / np.abs(x_orig_1 - x_orig_0)
            ratio_y = np.abs(y_1 - y_0) / np.abs(y_orig_1 - y_orig_0)
            ax.set_xlim(x_0, x_1)
            ax.set_ylim(y_0, y_1)
            fig_size_x, fig_size_y = figure.get_size_inches()
            figure.set_size_inches(fig_size_x, fig_size_y * ratio_y / ratio_x)

    def _add_legend(self):
        """Place a figure-level legend beside the axial view (ortho) or in
        the top-left corner (single view) with colorbar-aware right
        alignment (reference visualiser.py:1808-1877)."""
        if not self.__show_legend:
            return
        n_items = len(self.__contours) + len(self.__bounding_boxes)
        if n_items == 0:
            return
        approx_font_scaling = self.__figure_size / n_items
        fontsize = min(10, 16 * approx_font_scaling)

        # detect the ortho layout by the configured axis, NOT by axes count —
        # a single-view figure with 3+ colorbars also has >= 4 axes
        if self.__axis == "ortho":
            ax_ax = self.__figure.axes[0]
            pos = ax_ax.get_position()
            y_pos = (pos.ymax + pos.ymin) / 2
            if len(self.__figure.axes) >= 5:
                # colorbars exist: right-align past the rightmost label
                cbar_axes = self.__figure.axes[4:]
                label_positions = [
                    self.__figure.transFigure.inverted().transform(
                        cax.yaxis.get_label().get_position()
                    )[0]
                    for cax in cbar_axes
                ]
                x_pos = max(label_positions) + 0.025
            else:
                x_pos = pos.xmax + 0.05
            self.__figure.legend(loc="center left",
                                 bbox_to_anchor=(x_pos, y_pos),
                                 fontsize=fontsize, ncol=1)
        else:
            ax = self.__figure.axes[0]
            pos = ax.get_position()
            self.__figure.legend(
                loc="upper left",
                bbox_to_anchor=(0.025 * pos.xmax, 0.975 * pos.ymax),
                fontsize=fontsize,
            )
