"""Side-by-side contour comparison figure with a metrics table
(API mirror of platipy/imaging/visualisation/comparison.py:39)."""

from __future__ import annotations


from platipy_tpu.core.image import Image
from platipy_tpu.label.comparison import (
    compute_metric_dsc,
    compute_metric_hd,
    compute_metric_masd,
    compute_volume,
)
from platipy_tpu.label.utils import get_com
from platipy_tpu.visualisation.visualiser import ImageVisualiser

__all__ = ["contour_comparison"]


def contour_comparison(
    img: Image,
    contour_dict_a: dict,
    contour_dict_b: dict,
    contour_label_a: str = "Set A",
    contour_label_b: str = "Set B",
    structure_for_com=None,
    structure_for_limits=None,
    title="",
    subtitle="",
    subsubtitle="",
    contour_cmap="rainbow",
    structure_name_dict=None,
    img_vis_kw=None,
):
    """Two contour sets overlaid on an image with DSC/MASD/HD/volume table."""

    if img_vis_kw is None:
        img_vis_kw = {}

    shared = [s for s in contour_dict_a if s in contour_dict_b]

    if structure_for_com is None:
        structure_for_com = shared[0]
    cut = get_com(contour_dict_a[structure_for_com])

    vis = ImageVisualiser(img, cut=cut, **img_vis_kw)
    vis.add_contour({f"{k} ({contour_label_a})": v for k, v in contour_dict_a.items()},
                    linestyle="solid")
    vis.add_contour({f"{k} ({contour_label_b})": v for k, v in contour_dict_b.items()},
                    linestyle="dashed")
    if structure_for_limits is not None:
        vis.set_limits_from_label(contour_dict_a[structure_for_limits], expansion=20)

    fig = vis.show()

    rows = []
    for s in shared:
        name = structure_name_dict.get(s, s) if structure_name_dict else s
        rows.append([
            name,
            f"{compute_metric_dsc(contour_dict_a[s], contour_dict_b[s]):.3f}",
            f"{compute_metric_masd(contour_dict_a[s], contour_dict_b[s]):.2f}",
            f"{compute_metric_hd(contour_dict_a[s], contour_dict_b[s]):.2f}",
            f"{compute_volume(contour_dict_a[s]):.1f}",
            f"{compute_volume(contour_dict_b[s]):.1f}",
        ])

    if rows:
        table_ax = fig.add_axes((0.1, -0.25, 0.8, 0.22))
        table_ax.axis("off")
        table_ax.table(
            cellText=rows,
            colLabels=["Structure", "DSC", "MASD (mm)", "HD (mm)",
                       f"Vol {contour_label_a} (cc)", f"Vol {contour_label_b} (cc)"],
            loc="center",
        )

    if title:
        fig.suptitle(f"{title}\n{subtitle}\n{subsubtitle}".strip())
    return fig
