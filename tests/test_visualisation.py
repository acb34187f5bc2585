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
    assert len(fig.axes) >= 3  # ortho views (+ colorbar)
    # contour drawn on at least one axis
    total_artists = sum(len(ax.collections) + len(ax.patches) for ax in fig.axes)
    assert total_artists > 0
    legend = fig.axes[0].get_legend()
    assert legend is not None
    assert any("HEART" in t.get_text() for t in legend.get_texts())


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