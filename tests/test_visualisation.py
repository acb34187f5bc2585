"""Visualisation + LV 17-segment tests (reference test_visualiser.py style:
assert collection counts / legend texts on the rendered figure)."""

import matplotlib

matplotlib.use("Agg")

import numpy as np
import pytest

from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere


@pytest.fixture(scope="module")
def img_and_mask():
    arr = insert_sphere(np.zeros((24, 48, 48)), 10, (12, 24, 24)) * 1040 - 1000
    img = from_array(arr.astype(np.float32), spacing=(1.5, 1.5, 2.5))
    mask = img.with_array((np.asarray(img.array) > -500).astype(np.uint8))
    return img, mask


def test_visualiser_ortho_with_overlays(img_and_mask):
    from platipy_tpu.visualisation.visualiser import ImageVisualiser

    img, mask = img_and_mask
    vis = ImageVisualiser(img)
    vis.add_contour(mask, name="HEART")
    vis.add_scalar_overlay(mask, name="prob", colormap="magma")
    vis.add_bounding_box(mask, name="box")
    fig = vis.show()
    # reference ortho layout: axial, blank, coronal, sagittal + colorbar axes
    assert len(fig.axes) >= 5
    # contour drawn on at least one axis
    total_artists = sum(len(ax.collections) + len(ax.patches) for ax in fig.axes)
    assert total_artists > 0
    # figure-level legend beside the axial view (reference visualiser.py:1808)
    assert len(fig.legends) == 1
    texts = [t.get_text() for t in fig.legends[0].get_texts()]
    assert any("HEART" in t for t in texts)
    assert any("box" in t for t in texts)


def test_visualiser_vector_overlay(img_and_mask):
    from platipy_tpu.visualisation.visualiser import ImageVisualiser

    img, _ = img_and_mask
    dvf = img.with_array(
        np.ones(img.spatial_shape + (3,), np.float32) * np.array([3.0, 0.0, 0.0])
    )
    vis = ImageVisualiser(img, axis="z")
    vis.add_vector_overlay(dvf, subsample=8)
    fig = vis.show()
    # quiver present
    import matplotlib.quiver

    quivers = [a for ax in fig.axes for a in ax.collections
               if isinstance(a, matplotlib.quiver.Quiver)]
    assert len(quivers) == 1


def test_visualiser_ortho_layout_and_window(img_and_mask):
    """Reference figure conventions (visualiser.py:458-640): 2x2 ortho grid
    with a blank top-right cell, CT auto-window (-250, 600), axial rendered
    with origin='upper' under the 'normal' convention."""
    from platipy_tpu.visualisation.visualiser import ImageVisualiser

    img, _ = img_and_mask
    fig = ImageVisualiser(img).show()
    assert len(fig.axes) == 4
    ax_ax, blank, ax_cor, ax_sag = fig.axes
    assert not blank.get_images()  # blank cell
    im = ax_ax.get_images()[0]
    assert im.get_clim() == (-250, -250 + 600)  # CT window
    assert im.origin == "upper"
    assert ax_cor.get_images()[0].origin == "lower"
    # extent in voxel coordinates
    assert tuple(im.get_extent()) == (0, 48, 0, 48)

    # 'reversed' origin flips the axial view
    fig2 = ImageVisualiser(img, origin="reversed").show()
    assert fig2.axes[0].get_images()[0].origin == "lower"


def test_visualiser_scalar_options(img_and_mask):
    """Scalar overlay depth (reference visualiser.py:1183-1516): discrete
    levels with mid-ticks, contour mode, and single-view colorbars."""
    import numpy as np

    from platipy_tpu.visualisation.visualiser import ImageVisualiser

    img, mask = img_and_mask
    prob = img.with_array(np.asarray(mask.array).astype(np.float32) * 0.9)

    vis = ImageVisualiser(img, axis="z")
    vis.add_scalar_overlay(prob, name="prob", discrete_levels=4, mid_ticks=True,
                           min_value=0.0, max_value=1.0)
    fig = vis.show()
    assert len(fig.axes) == 2  # view + colorbar
    cbar_ax = fig.axes[1]
    assert len(cbar_ax.get_yticks()) == 4  # mid_ticks: one per level

    vis2 = ImageVisualiser(img, axis="z")
    vis2.add_scalar_overlay(prob, name="prob", discrete_levels=4,
                            min_value=0.0, max_value=1.0)
    fig2 = vis2.show()
    assert len(fig2.axes[1].get_yticks()) == 5  # boundary ticks: levels + 1

    vis3 = ImageVisualiser(img)
    vis3.add_scalar_overlay(prob, name="prob", show_as_contours=True,
                            min_value=0.0)
    fig3 = vis3.show()
    # contour sets drawn on all three ortho views + a colorbar axes
    assert len(fig3.axes) == 5


def test_visualiser_limits_adjust_view(img_and_mask):
    """set_limits_from_label + _adjust_view (reference visualiser.py:877-996):
    axis ranges restrict to the label extent; the axial y-limits mirror under
    the 'normal' origin convention."""
    from platipy_tpu.visualisation.visualiser import ImageVisualiser

    img, mask = img_and_mask
    vis = ImageVisualiser(img)
    vis.add_contour(mask, name="HEART")
    vis.set_limits_from_label(mask, expansion=0)
    fig = vis.show()
    ax_ax, _, ax_cor, ax_sag = fig.axes[:4]
    # sphere radius 10 at (24, 24) with 48-wide axes: x-range within [13, 35]
    x0, x1 = ax_ax.get_xlim()
    assert 10 <= x0 < 16 and 32 < x1 <= 38
    # axial y mirrored: cor_size - cor_1 .. cor_size - cor_0
    y0, y1 = sorted(ax_ax.get_ylim())
    assert 10 <= y0 < 16 and 32 < y1 <= 38
    z0, z1 = sorted(ax_cor.get_ylim())
    assert 0 <= z0 < 5 and 20 < z1 <= 24  # sphere spans ~[2, 22] axially

    # single view takes 4-element limits
    vis2 = ImageVisualiser(img, axis="y")
    vis2.set_limits_from_label(mask, expansion=0)
    fig2 = vis2.show()
    x0, x1 = fig2.axes[0].get_xlim()
    assert 10 <= x0 < 16 and 32 < x1 <= 38


def test_visualiser_projection_and_contour_resample(img_and_mask):
    """Projection views (reference visualiser.py:506-568) and contours given
    on a different grid resample onto the base image before drawing
    (reference visualiser.py:1012)."""
    import numpy as np

    from platipy_tpu.registration.utils import smooth_and_resample
    from platipy_tpu.visualisation.visualiser import ImageVisualiser

    img, mask = img_and_mask
    fig = ImageVisualiser(img, projection=True).show()
    assert len(fig.axes) == 4  # projections render in the same ortho layout

    # half-resolution mask still lands on the full-res sphere outline
    small = smooth_and_resample(mask, shrink_factor=2, smoothing_sigma=None)
    vis = ImageVisualiser(img, axis="z")
    vis.add_contour(small, name="small")
    fig2 = vis.show()
    paths = [c for c in fig2.axes[0].collections]
    assert len(paths) >= 1
    verts = np.concatenate([
        p.vertices for c in paths for p in c.get_paths()
    ])
    # contour sits near the sphere boundary (centre 24, radius ~10 voxels)
    radii = np.linalg.norm(verts - np.array([24.0, 24.0]), axis=1)
    assert 6 < np.median(radii) < 14


def test_visualiser_contour_color_cycle_and_dict_color(img_and_mask):
    """Contour colors: explicit single color applies to all entries of a
    dict; unset colors cycle the rainbow colormap (reference
    visualiser.py:143-210, 1009-1024)."""
    import numpy as np

    from platipy_tpu.visualisation.visualiser import ImageVisualiser

    img, mask = img_and_mask
    m2 = img.with_array(np.roll(np.asarray(mask.array), 5, axis=1))
    vis = ImageVisualiser(img, axis="z")
    vis.add_contour({"A": mask, "B": m2}, color="red")
    fig = vis.show()
    lines = fig.axes[0].get_lines()
    labelled = {ln.get_label(): ln.get_color() for ln in lines}
    assert labelled["A"] == "red" and labelled["B"] == "red"

    vis2 = ImageVisualiser(img, axis="z")
    vis2.add_contour({"A": mask, "B": m2})
    fig2 = vis2.show()
    from matplotlib.colors import to_hex

    colors = [to_hex(ln.get_color()) for ln in fig2.axes[0].get_lines()]
    assert colors[0] != colors[1]  # cycled, distinct


def test_comparison_overlay_and_figure(img_and_mask):
    from platipy_tpu.visualisation.comparison import contour_comparison

    img, mask = img_and_mask
    shifted = img.with_array(np.roll(np.asarray(mask.array), 2, axis=2))
    fig = contour_comparison(
        img, {"HEART": mask}, {"HEART": shifted},
        contour_label_a="Manual", contour_label_b="Auto",
    )
    assert fig is not None
    # metrics table rendered as an extra axes
    assert len(fig.axes) >= 4


def test_dose_figure(img_and_mask):
    from platipy_tpu.visualisation.dose import visualise_dose

    img, mask = img_and_mask
    zz = np.mgrid[: img.spatial_shape[0], : img.spatial_shape[1],
                  : img.spatial_shape[2]][0]
    dose = img.with_array((zz * 2.0).astype(np.float32))
    fig, vis = visualise_dose(img, dose, {"HEART": mask}, dose_threshold=5)
    assert fig is not None


def test_lv_17_segments():
    """Geometric plausibility of the AHA 17-segment model on synthetic chambers."""
    from platipy_tpu.utils.ventricle import generate_left_ventricle_segments

    shape = (48, 64, 64)
    spacing = (2.0, 2.0, 2.0)
    # LV: large sphere; LA above it; RV to the side; heart = union dilated
    lv = insert_sphere(np.zeros(shape), 12, (20, 32, 36))
    la = insert_sphere(np.zeros(shape), 7, (36, 32, 36))
    rv = insert_sphere(np.zeros(shape), 9, (20, 32, 18))
    heart = ((lv + la + rv) > 0).astype(np.uint8)
    from scipy import ndimage

    heart = ndimage.binary_dilation(heart, iterations=3).astype(np.uint8)

    contours = {
        "Ventricle_L": from_array(lv.astype(np.uint8), spacing=spacing),
        "Atrium_L": from_array(la.astype(np.uint8), spacing=spacing),
        "Ventricle_R": from_array(rv.astype(np.uint8), spacing=spacing),
        "Heart": from_array(heart, spacing=spacing),
    }
    segments = generate_left_ventricle_segments(contours, verbose=False)
    assert len(segments) == 17
    total = sum(int(np.asarray(s.array).sum()) for s in segments.values())
    assert total > 0
    # apex (17) should exist and not overlap the basal segment 1 much
    s17 = np.asarray(segments["Ventricle_L_Segment17"].array)
    assert s17.sum() > 0