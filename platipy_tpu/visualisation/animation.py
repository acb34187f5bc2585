"""Image-sequence animation writer
(API mirror of platipy/imaging/visualisation/animation.py:57-200)."""

from __future__ import annotations

import numpy as np

from platipy_tpu.core.image import Image

__all__ = ["FileWriter", "generate_animation_from_image_sequence"]


def _file_writer_cls():
    from matplotlib.animation import FileMovieWriter

    class FileWriter(FileMovieWriter):
        """PNG frame-sequence writer: saves each animation frame as
        ``<outfile-stem><n>.png`` instead of encoding a movie (reference
        animation.py:38-54 — used when no ffmpeg is available)."""

        supported_formats = ["png"]

        def setup(self, fig, outfile, dpi=None, frame_prefix=None):
            stem, _, fmt = str(outfile).rpartition(".")
            super().setup(fig, outfile, dpi=dpi,
                          frame_prefix=frame_prefix or stem or str(outfile))
            self.fname_format_str = "%s%%d.%s"
            self.frame_format = fmt or "png"

        def finish(self):
            pass  # the numbered frame files ARE the output; nothing to stitch

    return FileWriter


def __getattr__(name):
    # matplotlib import deferred until FileWriter is actually requested
    if name == "FileWriter":
        return _file_writer_cls()
    raise AttributeError(name)


def generate_animation_from_image_sequence(
    image_list,
    output_file="animation.gif",
    fps=10,
    contour_list=None,
    scalar_list=None,
    figure_size_in=6,
    image_cmap="Greys_r",
    contour_cmap="jet",
    scalar_cmap="magma",
    image_window=None,
    scalar_min=False,
    scalar_max=False,
    scalar_alpha=0.5,
    image_origin="lower",
):
    """Animate a sequence of (axial mid-slice) images to a GIF/MP4 via
    matplotlib.animation."""
    import matplotlib.pyplot as plt
    from matplotlib import animation

    arrs = [np.asarray(i.array if isinstance(i, Image) else i) for i in image_list]
    mid = arrs[0].shape[0] // 2

    if image_window is not None:
        vmin, vmax = image_window[0], image_window[0] + image_window[1]
    else:
        vmin, vmax = np.percentile(arrs[0], (1, 99))

    fig, ax = plt.subplots(figsize=(figure_size_in, figure_size_in))
    ax.axis("off")
    im = ax.imshow(arrs[0][mid], cmap=image_cmap, vmin=vmin, vmax=vmax,
                   origin=image_origin)

    scalar_arrs = None
    scalar_im = None
    if scalar_list is not None:
        scalar_arrs = [np.asarray(s.array if isinstance(s, Image) else s)
                       for s in scalar_list]
        smin = scalar_min if scalar_min is not False else np.min(scalar_arrs[0])
        smax = scalar_max if scalar_max is not False else np.max(scalar_arrs[0])
        scalar_im = ax.imshow(
            np.ma.masked_where(scalar_arrs[0][mid] <= smin, scalar_arrs[0][mid]),
            cmap=scalar_cmap, alpha=scalar_alpha, vmin=smin, vmax=smax,
            origin=image_origin,
        )

    contour_arrs = None
    if contour_list is not None:
        contour_arrs = [np.asarray(c.array if isinstance(c, Image) else c)
                        for c in contour_list]

    contour_artists = []

    def animate(i):
        im.set_array(arrs[i][mid])
        artists = [im]
        if scalar_im is not None:
            s = scalar_arrs[i][mid]
            scalar_im.set_array(np.ma.masked_where(s <= smin, s))
            artists.append(scalar_im)
        for ca in contour_artists:
            # matplotlib >= 3.10: ContourSet is itself a removable artist
            # (the .collections attribute is gone; silently skipping removal
            # would stack every prior frame's contours into frame N)
            ca.remove()
        contour_artists.clear()
        if contour_arrs is not None:
            cs = ax.contour(contour_arrs[i][mid], levels=[0.5], cmap=contour_cmap)
            contour_artists.append(cs)
        return artists

    anim = animation.FuncAnimation(fig, animate, frames=len(arrs), blit=False)
    writer = animation.PillowWriter(fps=fps) if str(output_file).endswith(".gif") else None
    anim.save(str(output_file), writer=writer, fps=None if writer else fps)
    plt.close(fig)
    return anim
