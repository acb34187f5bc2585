"""Generate the example notebooks (counterparts of /root/reference/examples/*.ipynb).

Each notebook is defined as (markdown | code) cells; run this script to
(re)emit the .ipynb files next to it.  Cells use small synthetic volumes so
every notebook runs on the CPU backend in minutes.
"""

import json
from pathlib import Path

HERE = Path(__file__).parent

PREAMBLE = """\
import os
os.environ.setdefault("JAX_PLATFORMS", "cpu")   # small demo volumes: CPU is fine
import numpy as np
import platipy_tpu  # applies JAX_PLATFORMS through the config API
import jax
"""


def md(text):
    return {"cell_type": "markdown", "metadata": {}, "source": text.splitlines(keepends=True)}


def code(text):
    return {
        "cell_type": "code", "metadata": {}, "execution_count": None,
        "outputs": [], "source": text.splitlines(keepends=True),
    }


def notebook(cells):
    return {
        "cells": cells,
        "metadata": {
            "kernelspec": {"display_name": "Python 3", "language": "python",
                           "name": "python3"},
            "language_info": {"name": "python", "version": "3.12"},
        },
        "nbformat": 4,
        "nbformat_minor": 5,
    }


NOTEBOOKS = {}

NOTEBOOKS["atlas_segmentation"] = [
    md("""# Multi-atlas segmentation

TPU-native counterpart of the reference `atlas_segmentation.ipynb`: register a
set of atlas images to a target with batched linear + demons registration and
fuse the propagated structures.

On real hardware the 10-atlas pipeline runs in ~7 s per case on one TPU v5e
chip; here we use small synthetic spheres so the notebook runs anywhere."""),
    code(PREAMBLE),
    code("""\
import copy
from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere
from platipy_tpu.projects.multiatlas.run import (
    MUTLIATLAS_SETTINGS_DEFAULTS, run_segmentation,
)

def pseudo_case(center, radius, shape=(32, 64, 64), spacing=(1.5, 1.5, 2.0)):
    ct = insert_sphere(np.zeros(shape), radius, center) * 1040 - 1000
    mask = insert_sphere(np.zeros(shape), radius, center).astype(np.uint8)
    return (from_array(ct.astype(np.float32), spacing=spacing),
            from_array(mask, spacing=spacing))

rng = np.random.RandomState(0)
target_img, target_mask = pseudo_case((16, 32, 32), 12)
atlas_set = {}
for i in range(5):
    j = rng.randint(-2, 3, 3)
    img, mask = pseudo_case((16 + j[0], 32 + j[1], 32 + j[2]), 12 + rng.randint(-1, 2))
    atlas_set[f"{i:02d}"] = {"CT Image": img, "WHOLEHEART": mask}"""),
    code("""\
settings = copy.deepcopy(MUTLIATLAS_SETTINGS_DEFAULTS)
settings["atlas_settings"]["atlas_set"] = atlas_set
settings["atlas_settings"]["atlas_id_list"] = list(atlas_set)
settings["atlas_settings"]["atlas_structure_list"] = ["WHOLEHEART"]
settings["deformable_registration_settings"]["resolution_staging"] = [6, 3]
settings["deformable_registration_settings"]["iteration_staging"] = [20, 10]

results, probs = run_segmentation(target_img, settings)
results"""),
    code("""\
from platipy_tpu.label.comparison import compute_metric_dsc
print("DSC vs ground truth:", float(compute_metric_dsc(target_mask, results["WHOLEHEART"])))"""),
    md("""## Visualise the result"""),
    code("""\
from platipy_tpu.visualisation.visualiser import ImageVisualiser
vis = ImageVisualiser(target_img)
vis.add_contour({"auto": results["WHOLEHEART"], "truth": target_mask})
fig = vis.show()"""),
]

NOTEBOOKS["cardiac_segmentation"] = [
    md("""# Cardiac segmentation

Counterpart of the reference `cardiac_segmentation.ipynb`: the full hybrid
cardiac pipeline (atlas selection, linear + deformable registration, IAR,
label fusion, vessel splining, geometric substructures).  The atlas here is
the same synthetic 5-sphere set the reference uses in its own test suite."""),
    code(PREAMBLE),
    code("""\
import copy, tempfile
from pathlib import Path
from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere
from platipy_tpu.nifti.io import write_image
from platipy_tpu.projects.cardiac.run import (
    CARDIAC_SETTINGS_DEFAULTS, run_cardiac_segmentation,
)

working_path = Path(tempfile.mkdtemp())
data = {}
for i in range(5):
    case = str(i + 1).zfill(3)
    sphere = insert_sphere(np.zeros((32, 64, 64)), 12, (16 + i, 32 + i, 32))
    ct = from_array(np.where(sphere > 0, 1.0, -1000.0).astype(np.float32),
                    spacing=(0.9 + i * 0.01, 0.9 + i * 0.01, 2.5))
    mask = ct.with_array(sphere.astype(np.uint8))
    p = working_path / f"Case_{case}" / "Images" / f"Case_{case}_CROP.nii.gz"
    p.parent.mkdir(parents=True); write_image(ct, str(p))
    p = working_path / f"Case_{case}" / "Structures" / f"Case_{case}_WHOLEHEART_CROP.nii.gz"
    p.parent.mkdir(parents=True); write_image(mask, str(p))
    data[case] = {"CT": ct, "WHOLEHEART": mask}"""),
    code("""\
settings = copy.deepcopy(CARDIAC_SETTINGS_DEFAULTS)
settings["atlas_settings"]["atlas_id_list"] = list(data)[:-1]
settings["atlas_settings"]["atlas_path"] = str(working_path)
settings["atlas_settings"]["atlas_structure_list"] = ["WHOLEHEART"]
settings["deformable_registration_settings"]["resolution_staging"] = [8, 4]
settings["deformable_registration_settings"]["iteration_staging"] = [5, 5]
settings["iar_settings"]["reference_structure"] = None
settings["label_fusion_settings"]["optimal_threshold"] = {"WHOLEHEART": 0.5}
settings["vessel_spline_settings"]["vessel_name_list"] = []
settings["postprocessing_settings"]["run_postprocessing"] = False
settings["geometric_segmentation_settings"]["run_geometric_algorithms"] = False

output, _ = run_cardiac_segmentation(data["005"]["CT"], settings=settings)
output"""),
    code("""\
from platipy_tpu.label.comparison import compute_metric_dsc
print("DSC:", float(compute_metric_dsc(data["005"]["WHOLEHEART"], output["WHOLEHEART"])))"""),
]

NOTEBOOKS["bronchus_segmentation"] = [
    md("""# Bronchus segmentation

Counterpart of the reference `bronchus_segmentation.ipynb`: lung mask,
trachea seeding, HU-threshold-sweep region growing and carina detection on a
synthetic thorax phantom."""),
    code(PREAMBLE),
    code("""\
from platipy_tpu.core.image import from_array
from platipy_tpu.projects.bronchus.bronchus import generate_lung_mask, generate_airway_mask

# synthetic thorax: two air ellipsoids (lungs) + an air tube (airway) in tissue
shape = (48, 96, 96)
zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]].astype(np.float32)
ct = np.full(shape, 40.0, np.float32)                     # soft tissue
for cx in (30, 66):
    r = np.sqrt(((zz - 22) / 18)**2 + ((yy - 48) / 26)**2 + ((xx - cx) / 14)**2)
    ct[r < 1] = -800                                       # lung parenchyma
tube = (np.sqrt((yy - 48)**2 + (xx - 48)**2) < 4) & (zz > 8)
ct[tube] = -950                                            # airway lumen
img = from_array(ct, spacing=(1.0, 1.0, 2.0))"""),
    code("""\
lung_mask = generate_lung_mask(img)
airway = generate_airway_mask(".", img, lung_mask)
print("airway voxels:", int(np.asarray(airway.array).sum()) if airway else 0)"""),
]

NOTEBOOKS["contour_comparison"] = [
    md("""# Contour comparison

Counterpart of the reference `contour_comparison.ipynb`: compare two structure
sets visually and numerically (DSC, Hausdorff, mean surface distance)."""),
    code(PREAMBLE),
    code("""\
from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere

arr = insert_sphere(np.zeros((24, 48, 48)), 10, (12, 24, 24)) * 1040 - 1000
img = from_array(arr.astype(np.float32), spacing=(1.5, 1.5, 2.5))
manual = img.with_array((np.asarray(img.array) > -500).astype(np.uint8))
auto = img.with_array(np.roll(np.asarray(manual.array), 2, axis=2))"""),
    code("""\
from platipy_tpu.visualisation.comparison import contour_comparison
fig = contour_comparison(img, {"HEART": manual}, {"HEART": auto},
                         contour_label_a="Manual", contour_label_b="Auto")"""),
    code("""\
from platipy_tpu.label.comparison import compute_surface_metrics, compute_metric_dsc
print("DSC :", float(compute_metric_dsc(manual, auto)))
compute_surface_metrics(manual, auto)"""),
]

NOTEBOOKS["dvh_analysis"] = [
    md("""# DVH analysis

Counterpart of the reference `dvh_analysis.ipynb`: compute dose-volume
histograms and dose metrics (D95, V20, Dcc) from a dose grid + structures."""),
    code(PREAMBLE),
    code("""\
from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere

shape, spacing = (24, 48, 48), (2.0, 2.0, 2.0)
target = insert_sphere(np.zeros(shape), 8, (12, 24, 24)).astype(np.uint8)
oar = insert_sphere(np.zeros(shape), 6, (12, 24, 36)).astype(np.uint8)
zz, yy, xx = np.mgrid[:shape[0], :shape[1], :shape[2]]
r = np.sqrt((zz - 12.)**2 + (yy - 24.)**2 + (xx - 24.)**2)
dose_arr = 60.0 * np.exp(-np.maximum(r - 8, 0) / 6.0)
dose = from_array(dose_arr.astype(np.float32), spacing=spacing)
structures = {"PTV": from_array(target, spacing=spacing),
              "OAR": from_array(oar, spacing=spacing)}"""),
    code("""\
from platipy_tpu.dose.dvh import calculate_dvh_for_labels, calculate_d_x, calculate_v_x
dvh = calculate_dvh_for_labels(dose, structures)
dvh"""),
    code("""\
print(calculate_d_x(dvh, 95))
print(calculate_v_x(dvh, 20))"""),
    code("""\
from platipy_tpu.visualisation.dose import visualise_dose
fig, vis = visualise_dose(dose, dose, structures, dose_threshold=5)"""),
]

NOTEBOOKS["generate_synthetic_deformation"] = [
    md("""# Synthetic deformations

Counterpart of the reference `generate_synthetic_head_neck_deformation.ipynb`:
generate structure-guided synthetic displacement fields (shift / expand /
contract / bend) and apply them as augmentations."""),
    code(PREAMBLE),
    code("""\
from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere
from platipy_tpu.generation.dvf import (
    generate_field_shift, generate_field_expand, generate_field_radial_bend,
)

arr = insert_sphere(np.zeros((24, 48, 48)), 10, (12, 24, 24))
mask = from_array(arr.astype(np.uint8), spacing=(2.0, 2.0, 2.0))

shifted, t_shift, dvf_shift = generate_field_shift(mask, vector_shift=(6, 0, 0))
expanded, t_exp, dvf_exp = generate_field_expand(mask, expand=4)
print("shifted volume:", int(np.asarray(shifted.array).sum()),
      "expanded volume:", int(np.asarray(expanded.array).sum()))"""),
    code("""\
from platipy_tpu.visualisation.visualiser import ImageVisualiser
vis = ImageVisualiser(mask.astype(np.float32), axis="z", window=(0, 1))
vis.add_contour({"original": mask, "expanded": expanded})
vis.add_vector_overlay(dvf_exp, subsample=6, arrow_scale=1.0, name="DVF (mm)")
fig = vis.show()"""),
]

NOTEBOOKS["left_ventricle_17_segments"] = [
    md("""# AHA 17-segment left-ventricle model

Counterpart of the reference `left_ventricle_17_segments.ipynb`: derive the
17 AHA myocardial segments from cardiac chamber contours."""),
    code(PREAMBLE),
    code("""\
from scipy import ndimage
from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere
from platipy_tpu.utils.ventricle import generate_left_ventricle_segments

shape, spacing = (48, 64, 64), (2.0, 2.0, 2.0)
lv = insert_sphere(np.zeros(shape), 12, (20, 32, 36))
la = insert_sphere(np.zeros(shape), 7, (36, 32, 36))
rv = insert_sphere(np.zeros(shape), 9, (20, 32, 18))
heart = ndimage.binary_dilation((lv + la + rv) > 0, iterations=3)
contours = {
    "Ventricle_L": from_array(lv.astype(np.uint8), spacing=spacing),
    "Atrium_L": from_array(la.astype(np.uint8), spacing=spacing),
    "Ventricle_R": from_array(rv.astype(np.uint8), spacing=spacing),
    "Heart": from_array(heart.astype(np.uint8), spacing=spacing),
}
segments = generate_left_ventricle_segments(contours)
sorted(segments)"""),
    code("""\
from platipy_tpu.visualisation.visualiser import ImageVisualiser
vis = ImageVisualiser(contours["Heart"].astype(np.float32), axis="z",
                      window=(0, 1))
vis.add_contour({k: v for k, v in list(segments.items())[:6]})
fig = vis.show()"""),
]

NOTEBOOKS["rtstruct_to_nifti"] = [
    md("""# DICOM RTSTRUCT ↔ NIfTI conversion

Counterpart of the reference `rtstruct_to_nifti.ipynb` (plus the reverse
direction): write a DICOM series, convert masks to RTSTRUCT, convert back,
and crawl a DICOM directory into organised NIfTI."""),
    code(PREAMBLE),
    code("""\
import tempfile
from pathlib import Path
from platipy_tpu.core.image import from_array
from platipy_tpu.generation.image import insert_sphere
from platipy_tpu.dicom.io.series import write_dicom_series

tmp = Path(tempfile.mkdtemp())
arr = insert_sphere(np.zeros((12, 32, 32)), 6, (6, 16, 16)) * 1040 - 1000
ct = from_array(arr.astype(np.float32), spacing=(1.5, 1.5, 3.0))
mask = ct.with_array((np.asarray(ct.array) > -500).astype(np.uint8))
paths = write_dicom_series(ct, tmp / "series", patient_id="Demo")
len(paths)"""),
    code("""\
from platipy_tpu.dicom.io.nifti_to_rtstruct import convert_nifti
convert_nifti(str(tmp / "series"), {"HEART": mask}, str(tmp / "rtstruct.dcm"))"""),
    code("""\
from platipy_tpu.dicom.io.rtstruct_to_nifti import convert_rtstruct
convert_rtstruct(str(tmp / "series"), str(tmp / "rtstruct.dcm"),
                 prefix="Struct_", output_dir=str(tmp / "masks"))
sorted(p.name for p in (tmp / "masks").iterdir())"""),
    code("""\
from platipy_tpu.dicom.io.crawl import process_dicom_directory
out = process_dicom_directory(str(tmp / "series"),
                              output_directory=str(tmp / "crawled"))
out"""),
]

NOTEBOOKS["tcia"] = [
    md("""# TCIA data download

Counterpart of the reference `tcia.ipynb`: fetch public imaging collections
from The Cancer Imaging Archive and convert them to NIfTI.

> Requires network access to `services.cancerimagingarchive.net` — in an
> offline environment the cells below raise a connection error."""),
    code(PREAMBLE),
    code("""\
from platipy_tpu.dicom.download.tcia import (
    get_collections, get_patients_in_collection, fetch_data, get_lung_data,
)
# collections = get_collections()
# patients = get_patients_in_collection("LCTSC")
# data = get_lung_data(number_of_patients=1)"""),
]

NOTEBOOKS["multichip_scaling"] = [
    md("""# Multi-chip scaling on a TPU mesh

No reference counterpart — this is the TPU-native layer: shard the atlas
axis of the multi-atlas pipeline over a `jax.sharding.Mesh`, with fusion as
a cross-atlas reduction riding ICI collectives.

This notebook provisions 8 *virtual* CPU devices so it runs anywhere; on a
real v5e pod slice, drop the virtual-device lines and the same code runs on
real chips."""),
    code("""\
import os
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import numpy as np
import platipy_tpu
import jax
jax.devices()"""),
    code("""\
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
import jax.numpy as jnp

mesh = Mesh(np.array(jax.devices()).reshape(4, 2), ("atlas", "spatial"))
x = jnp.zeros((8, 16, 32, 32))
x = jax.device_put(x, NamedSharding(mesh, P("atlas", "spatial")))
x.sharding"""),
    code("""\
# z-sharded demons with per-iteration halo exchange (parallel/spatial.py)
from platipy_tpu.core import filters
from platipy_tpu.parallel.spatial import demons_level_spatial, shard_over_z

zmesh = Mesh(np.array(jax.devices()), ("spatial",))
rng = np.random.RandomState(0)
shape = (128, 32, 32)  # slab per device (128/8=16) must exceed the halo (10)
fixed = jnp.asarray(rng.rand(*shape).astype(np.float32))
moving = jnp.asarray(rng.rand(*shape).astype(np.float32))
taps = tuple(tuple(float(v) for v in filters.discrete_gaussian_kernel1d(1.0, 0.1, 30))
             for _ in range(3))
out = demons_level_spatial(
    shard_over_z(fixed, zmesh), shard_over_z(moving, zmesh),
    shard_over_z(jnp.zeros(shape + (3,), jnp.float32), zmesh), zmesh,
    iterations=2, spacing=(1.0, 1.0, 1.0),
    std_kernels_key=taps, update_kernels_key=taps, max_disp_vox=(4, 4, 4),
)
out.sharding"""),
]


def main():
    for name, cells in NOTEBOOKS.items():
        path = HERE / f"{name}.ipynb"
        path.write_text(json.dumps(notebook(cells), indent=1))
        print("wrote", path)


if __name__ == "__main__":
    main()
