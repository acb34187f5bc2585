"""ImageVisualiser — declarative medical image figure builder
(API mirror of platipy/imaging/visualisation/visualiser.py:53-1836).

Overlays are registered with ``add_*`` methods and rendered in ``show()``.
Views: 'ortho' (axial+coronal+sagittal around a cut point), 'z'/'x'/'y'
single-plane views, or projections.  All rendering is host-side matplotlib on
numpy copies of the device arrays.
"""

from __future__ import annotations


import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.visualisation.utils import (
    VisualiseBoundingBox,
    VisualiseComparisonOverlay,
    VisualiseContour,
    VisualiseScalarOverlay,
    VisualiseVectorOverlay,
    generate_comparison_colormix,
    reorientate_vector_field,
    return_slice,
    subsample_vector_field,
    vector_image_grid,
    view_axis,
)

__all__ = ["ImageVisualiser"]


class ImageVisualiser:
    """Build figures of images + contours + scalar/vector/comparison overlays."""

    def __init__(self, image: Image, cut=None, axis="ortho", window=None,
                 figure_size_in=10, limits=None, colormap="Greys_r", origin="normal",
                 projection=False):
        self.__image = image
        self.__cut = cut
        self.__axis = axis
        self.__window = window
        self.__figure_size = figure_size_in
        self.__limits = limits
        self.__colormap = colormap
        self.__origin = origin
        self.__projection = projection

        self.__contours = []
        self.__scalar_overlays = []
        self.__vector_overlays = []
        self.__comparison_overlays = []
        self.__bounding_boxes = []
        self.__show_legend = False
        self.__contour_colormap = "rainbow"

    # -- declarative API -------------------------------------------------------
    def clear(self):
        self.__contours = []
        self.__scalar_overlays = []
        self.__vector_overlays = []
        self.__comparison_overlays = []
        self.__bounding_boxes = []

    def set_limits_from_label(self, label: Image, expansion=2):
        """Restrict display to the label extent (+expansion mm)."""
        from platipy_tpu.utils.crop import label_to_roi

        (sx, sy, sz), (ix, iy, iz) = label_to_roi(label, expansion_mm=expansion)
        self.__limits = ((iz, iz + sz), (iy, iy + sy), (ix, ix + sx))

    def add_contour(self, contour, name=None, color=None, colorbase=None,
                    linewidth=2, linestyle="solid", show_legend=True):
        """Add contour(s): a binary Image, or a dict of name->Image."""
        if isinstance(contour, dict):
            for cname, img in contour.items():
                self.__contours.append(
                    VisualiseContour(img, cname, color=None, linewidth=linewidth,
                                     linestyle=linestyle)
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
                           projection=False):
        self.__scalar_overlays.append(
            VisualiseScalarOverlay(image, name or "scalar", colormap, alpha,
                                   min_value, max_value, discrete_levels, mid_ticks,
                                   show_colorbar, norm, projection)
        )

    def add_vector_overlay(self, vector_image, name=None, colormap="inferno",
                           alpha=0.75, arrow_scale=0.25, arrow_width=1, subsample=4,
                           color_function="perpendicular", invert_field=True,
                           show_colorbar=True):
        self.__vector_overlays.append(
            VisualiseVectorOverlay(vector_image, name or "vector", colormap, alpha,
                                   arrow_scale, arrow_width, subsample, color_function,
                                   invert_field, show_colorbar)
        )

    def add_comparison_overlay(self, image, name=None, color_rotation=0.35):
        self.__comparison_overlays.append(
            VisualiseComparisonOverlay(image, name or "comparison", color_rotation)
        )

    def add_bounding_box(self, bounding_box, name=None, color="r", linewidth=2):
        self.__bounding_boxes.append(
            VisualiseBoundingBox(bounding_box, name or "bounding box", color, linewidth)
        )

    # -- rendering --------------------------------------------------------------
    def _window_limits(self, arr):
        if self.__window is not None:
            return self.__window[0], self.__window[0] + self.__window[1]
        lo, hi = np.percentile(arr, 1), np.percentile(arr, 99)
        return lo, max(hi, lo + 1e-6)

    def _cut_point(self):
        if self.__cut is not None:
            cut = self.__cut
            if not hasattr(cut, "__iter__"):
                cut = [cut] * 3
            return list(cut)
        arr = np.asarray(self.__image.array)
        return [s // 2 for s in arr.shape[:3]]

    def show(self, interact=False):
        import matplotlib.figure
        import matplotlib.pyplot as plt

        arr = np.asarray(self.__image.array).astype(np.float32)
        spacing_zyx = self.__image.spacing_zyx
        cut = self._cut_point()
        vmin, vmax = self._window_limits(arr)

        if self.__axis == "ortho":
            views = [0, 1, 2]
            fig, axes = plt.subplots(
                1, 3, figsize=(self.__figure_size * 1.6, self.__figure_size * 0.6)
            )
        else:
            views = [view_axis(self.__axis)]
            fig, ax0 = plt.subplots(
                1, 1, figsize=(self.__figure_size, self.__figure_size)
            )
            axes = [ax0]

        aspect_for = {
            0: spacing_zyx[1] / spacing_zyx[2],
            1: spacing_zyx[0] / spacing_zyx[2],
            2: spacing_zyx[0] / spacing_zyx[1],
        }

        legend_handles = {}

        for ax, axis in zip(np.atleast_1d(axes), views):
            sl = return_slice(axis, cut[axis])
            if self.__projection:
                base = arr.max(axis=axis)
            else:
                base = arr[sl]

            if self.__comparison_overlays:
                comp = self.__comparison_overlays[0]
                other = np.asarray(comp.image.array).astype(np.float32)[sl]
                rgb = generate_comparison_colormix(
                    [self.__image, comp.image], arr_slices=[base, other],
                    color_rotation=comp.color_rotation,
                )
                ax.imshow(rgb, aspect=aspect_for[axis], origin="lower")
            else:
                ax.imshow(base, cmap=self.__colormap, vmin=vmin, vmax=vmax,
                          aspect=aspect_for[axis], origin="lower")

            for so in self.__scalar_overlays:
                s_arr = np.asarray(so.image.array).astype(np.float32)
                s_slice = s_arr.max(axis=axis) if (so.projection or self.__projection) \
                    else s_arr[sl]
                smin = so.min_value if so.min_value is not False else np.min(s_slice)
                smax = so.max_value if so.max_value is not False else np.max(s_slice)
                masked = np.ma.masked_where(s_slice <= smin, s_slice)
                im = ax.imshow(masked, cmap=so.colormap, alpha=so.alpha,
                               vmin=smin, vmax=smax if smax > smin else smin + 1e-6,
                               aspect=aspect_for[axis], origin="lower")
                if so.show_colorbar and axis == views[-1]:
                    fig.colorbar(im, ax=ax, label=so.name, shrink=0.7)

            import matplotlib

            cmap = matplotlib.colormaps[self.__contour_colormap]
            for idx, vc in enumerate(self.__contours):
                c_arr = np.asarray(vc.image.array)
                c_slice = (c_arr.max(axis=axis) if self.__projection else c_arr[sl])
                if c_slice.max() == 0:
                    continue
                color = vc.color
                if color is None:
                    color = cmap(idx / max(len(self.__contours) - 1, 1))
                cs = ax.contour(c_slice, levels=[0.5], colors=[color],
                                linewidths=vc.linewidth, linestyles=vc.linestyle)
                if vc.name not in legend_handles:
                    import matplotlib.lines as mlines

                    legend_handles[vc.name] = mlines.Line2D(
                        [], [], color=color, label=vc.name, linewidth=vc.linewidth
                    )

            for vo in self.__vector_overlays:
                v_arr = np.asarray(vo.image.array)  # [z,y,x,3], (x,y,z) comps
                ss = subsample_vector_field(axis, cut[axis], vo.subsample)
                vx = v_arr[..., 0][ss]
                vy = v_arr[..., 1][ss]
                vz = v_arr[..., 2][ss]
                grid_x, grid_y = vector_image_grid(axis, v_arr, vo.subsample)
                plot_u, plot_v, plot_c = reorientate_vector_field(
                    axis, vz, vy, vx, invert_field=vo.invert_field
                )
                # reference semantics (visualiser.py:1583-1588): 'perpendicular'
                # colours by the signed out-of-plane component, 'magnitude' by
                # the full 3-D vector magnitude
                if vo.color_function == "magnitude":
                    vector_color = np.sqrt(plot_u**2 + plot_v**2 + plot_c**2)
                else:
                    vector_color = plot_c
                ax.quiver(grid_x, grid_y, plot_u, plot_v,
                          vector_color,
                          cmap=vo.colormap, alpha=vo.alpha,
                          scale=1.0 / max(vo.arrow_scale, 1e-6),
                          scale_units="xy", angles="xy",
                          width=0.002 * vo.arrow_width)

            for bb in self.__bounding_boxes:
                self.draw_bounding_box_on_axes(ax, axis, bb)

            if self.__limits is not None:
                (z0, z1), (y0, y1), (x0, x1) = self.__limits
                if axis == 0:
                    ax.set_xlim(x0, x1)
                    ax.set_ylim(y0, y1)
                elif axis == 1:
                    ax.set_xlim(x0, x1)
                    ax.set_ylim(z0, z1)
                else:
                    ax.set_xlim(y0, y1)
                    ax.set_ylim(z0, z1)

            ax.set_title({0: "Axial", 1: "Coronal", 2: "Sagittal"}[axis])
            ax.axis("off")

        if self.__show_legend and legend_handles:
            np.atleast_1d(axes)[0].legend(
                handles=list(legend_handles.values()), loc="lower left", fontsize=8
            )

        fig.tight_layout()
        return fig

    def draw_bounding_box_on_axes(self, ax, view, vbb, add_label=True):
        import matplotlib.patches as mpatches

        ix, iy, iz, sx, sy, sz = vbb.bounding_box
        if view == 0:
            rect = mpatches.Rectangle((ix, iy), sx, sy, fill=False,
                                      edgecolor=vbb.color, linewidth=vbb.linewidth,
                                      label=vbb.name if add_label else None)
        elif view == 1:
            rect = mpatches.Rectangle((ix, iz), sx, sz, fill=False,
                                      edgecolor=vbb.color, linewidth=vbb.linewidth)
        else:
            rect = mpatches.Rectangle((iy, iz), sy, sz, fill=False,
                                      edgecolor=vbb.color, linewidth=vbb.linewidth)
        ax.add_patch(rect)
