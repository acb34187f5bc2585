"""Cardiac segmentation pipeline — drop-in mirror of
platipy/imaging/projects/cardiac/run.py (reference lines 75-1148), rebuilt
atlas-parallel.

Stages (reference semantics preserved):
  1. guide-structure crop + registration-structure conversion (:609-615), or
     auto-crop via quick registrations (:617-656)
  2. per-atlas linear registration (+ expanded guide masks) (:674-745)
  3. structure-guided demons DIR_STRUCT (:751-799) — BATCHED over atlases
  4. intensity demons with HU gating at -400 (:806-869) — BATCHED, with
     per-atlas masked fixed images
  5. iterative atlas removal (:876-891)
  6. vessel splining (:894-905)
  7. fusion + per-structure optimal thresholds (:908-1006)
  8. vessels binary-encoded as "probability" output (:1008-1042)
  9. geometric valves / conduction nodes (:1044-1108)
 10. post-processing (:1110-1140)
"""

from __future__ import annotations

import logging
import os
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.core.interp import INTERP_LINEAR, INTERP_NEAREST
from platipy_tpu.generation.mask import extend_mask
from platipy_tpu.label.fusion import (
    combine_labels,
    compute_weight_map,
    process_probability_image,
)
from platipy_tpu.label.iar import run_iar
from platipy_tpu.label.utils import binary_encode_structure_list, correct_volume_overlap
from platipy_tpu.parallel.atlas import (
    atlas_mesh,
    batched_multiscale_demons,
    pad_atlas_axis,
    batched_warp_by_dvf,
    shard_over_atlases,
)
from platipy_tpu.registration.linear import linear_registration_batched
from platipy_tpu.registration.utils import convert_mask_to_reg_structure
from platipy_tpu.utils.conduction import (
    geometric_atrioventricularnode,
    geometric_sinoatrialnode,
)
from platipy_tpu.utils.crop import (
    crop_to_roi,
    label_to_roi,
    pad_roi_to_multiple,
    paste,
    snap_roi_to_seen_bucket,
)
from platipy_tpu.utils.valve import (
    generate_valve_from_great_vessel,
    generate_valve_using_cylinder,
)
from platipy_tpu.utils.vessel import vessel_spline_generation

logger = logging.getLogger(__name__)

ATLAS_PATH = os.environ.get(
    "ATLAS_PATH", str(Path.home().joinpath(".platipy_tpu", "cardiac", "test_atlas"))
)

CARDIAC_SETTINGS_DEFAULTS = {
    "atlas_settings": {
        "atlas_id_list": ["03", "05", "08", "10", "11", "12", "13", "16", "24", "35"],
        "atlas_structure_list": [
            "AORTICVALVE", "ASCENDINGAORTA", "LANTDESCARTERY", "LCIRCUMFLEXARTERY",
            "LCORONARYARTERY", "LEFTATRIUM", "LEFTVENTRICLE", "MITRALVALVE",
            "PULMONARYARTERY", "PULMONICVALVE", "RCORONARYARTERY", "RIGHTATRIUM",
            "RIGHTVENTRICLE", "SVC", "TRICUSPIDVALVE", "WHOLEHEART",
        ],
        "atlas_path": ATLAS_PATH,
        "atlas_image_format": "Case_{0}/Images/Case_{0}_CROP.nii.gz",
        "atlas_label_format": "Case_{0}/Structures/Case_{0}_{1}_CROP.nii.gz",
        "crop_atlas_to_structures": False,
        "crop_atlas_expansion_mm": (20, 20, 40),
        "guide_structure_name": "WHOLEHEART",
        "superior_extension": 30,
    },
    "auto_crop_target_image_settings": {
        "expansion_mm": [20, 20, 40],
    },
    "linear_registration_settings": {
        "reg_method": "affine",
        "shrink_factors": [16, 8, 4],
        "smooth_sigmas": [0, 0, 0],
        "sampling_rate": 0.75,
        "default_value": -1000,
        "number_of_iterations": 50,
        "metric": "mean_squares",
        "optimiser": "gradient_descent_line_search",
        "verbose": False,
        # TPU extension: stop a level once every atlas's relative metric
        # improvement stays < 1e-6 for this many iterations (ITK v4-style
        # convergence; number_of_iterations remains the hard cap)
        "convergence_window": 5,
    },
    "structure_guided_registration_settings": {
        "isotropic_resample": True,
        "resolution_staging": [16, 8, 2],
        "iteration_staging": [50, 50, 50],
        "smoothing_sigmas": [0, 0, 0],
        "ncores": 8,
        "default_value": 0,
        "verbose": False,
        # TPU extension: ITK PDE per-level RMS-change stop (mm); the
        # reference's ITK filter inherits default 0.99.  None = fixed trips.
        "maximum_rms_error": None,
    },
    "deformable_registration_settings": {
        "isotropic_resample": True,
        "resolution_staging": [6, 3, 1.5],
        "iteration_staging": [200, 150, 100],
        "smoothing_sigmas": [0, 0, 0],
        "ncores": 8,
        "default_value": 0,
        "verbose": False,
        "maximum_rms_error": None,
    },
    "iar_settings": {
        "reference_structure": False,
        "smooth_distance_maps": True,
        "smooth_sigma": 1,
        "z_score_statistic": "mad",
        "outlier_method": "iqr",
        "outlier_factor": 1.5,
        "min_best_atlases": 5,
        "project_on_sphere": False,
    },
    "label_fusion_settings": {
        "vote_type": "unweighted",
        "vote_params": None,
        "optimal_threshold": {
            "AORTICVALVE": 0.5,
            "ASCENDINGAORTA": 0.44,
            "LEFTATRIUM": 0.40,
            "LEFTVENTRICLE": 0.45,
            "MITRALVALVE": 0.5,
            "PULMONARYARTERY": 0.46,
            "PULMONICVALVE": 0.5,
            "RIGHTATRIUM": 0.38,
            "RIGHTVENTRICLE": 0.42,
            "SVC": 0.44,
            "TRICUSPIDVALVE": 0.5,
            "WHOLEHEART": 0.5,
        },
    },
    "vessel_spline_settings": {
        "vessel_name_list": [
            "LANTDESCARTERY", "LCIRCUMFLEXARTERY", "LCORONARYARTERY", "RCORONARYARTERY",
        ],
        "vessel_radius_mm_dict": {
            "LANTDESCARTERY": 2, "LCIRCUMFLEXARTERY": 2,
            "LCORONARYARTERY": 2, "RCORONARYARTERY": 2,
        },
        "scan_direction_dict": {
            "LANTDESCARTERY": "z", "LCIRCUMFLEXARTERY": "z",
            "LCORONARYARTERY": "x", "RCORONARYARTERY": "z",
        },
        "stop_condition_type_dict": {
            "LANTDESCARTERY": "count", "LCIRCUMFLEXARTERY": "count",
            "LCORONARYARTERY": "count", "RCORONARYARTERY": "count",
        },
        "stop_condition_value_dict": {
            "LANTDESCARTERY": 2, "LCIRCUMFLEXARTERY": 2,
            "LCORONARYARTERY": 2, "RCORONARYARTERY": 2,
        },
    },
    "geometric_segmentation_settings": {
        "run_geometric_algorithms": True,
        "geometric_name_suffix": "_GEOMETRIC",
        "atlas_structure_names": {
            "atlas_left_ventricle": "LEFTVENTRICLE",
            "atlas_right_ventricle": "RIGHTVENTRICLE",
            "atlas_left_atrium": "LEFTATRIUM",
            "atlas_right_atrium": "RIGHTATRIUM",
            "atlas_ascending_aorta": "ASCENDINGAORTA",
            "atlas_pulmonary_artery": "PULMONARYARTERY",
            "atlas_superior_vena_cava": "SVC",
            "atlas_whole_heart": "WHOLEHEART",
        },
        "valve_definitions": {
            "mitral_valve_thickness_mm": 10,
            "mitral_valve_radius_mm": 15,
            "tricuspid_valve_thickness_mm": 10,
            "tricuspid_valve_radius_mm": 15,
            "pulmonic_valve_thickness_mm": 10,
            "aortic_valve_thickness_mm": 10,
        },
        "conduction_system_definitions": {
            "sinoatrial_node_radius_mm": 10,
            "atrioventricular_node_radius_mm": 10,
        },
    },
    "postprocessing_settings": {
        "run_postprocessing": True,
        "binaryfillhole_mm": 3,
        "structures_for_binaryfillhole": [
            "ASCENDINGAORTA", "LEFTATRIUM", "LEFTVENTRICLE", "RIGHTATRIUM",
            "RIGHTVENTRICLE", "SVC", "AORTICVALVE", "MITRALVALVE", "PULMONICVALVE",
            "TRICUSPIDVALVE", "WHOLEHEART",
        ],
        "structures_for_overlap_correction": [
            "ASCENDINGAORTA", "LEFTATRIUM", "LEFTVENTRICLE", "RIGHTATRIUM",
            "RIGHTVENTRICLE", "PULMONARYARTERY", "SVC",
        ],
    },
    "return_atlas_guide_structure": False,
    "return_as_cropped": False,
    "return_proba_as_contours": False,
}

OPEN_ATLAS_URL = "https://zenodo.org/record/6592437/files/open_atlas.zip?download=1"

import copy as _copy

OPEN_ATLAS_SETTINGS = _copy.deepcopy(CARDIAC_SETTINGS_DEFAULTS)
OPEN_ATLAS_SETTINGS["atlas_settings"] = {
    "atlas_id_list": [
        "LCTSC-Test-S2-201", "LCTSC-Test-S2-203", "LCTSC-Test-S3-201",
        "LUNG1-002", "LUNG1-009", "LUNG1-021", "LUNG1-067", "LUNG1-226",
    ],
    "atlas_structure_list": [
        "Atrium_L", "Ventricle_L", "Atrium_R", "Ventricle_R", "A_Aorta",
        "A_Pulmonary", "V_Venacava_S", "A_LAD", "A_Coronary_L", "A_Cflx",
        "A_Coronary_R", "Heart",
    ],
    "atlas_path": ATLAS_PATH,
    "atlas_image_format": "{0}/IMAGES/CT.nii.gz",
    "atlas_label_format": "{0}/STRUCTURES/{1}.nii.gz",
    "crop_atlas_to_structures": True,
    "crop_atlas_expansion_mm": (50, 50, 50),
    "guide_structure_name": "Heart",
    "superior_extension": 30,
}
OPEN_ATLAS_SETTINGS["label_fusion_settings"] = {
    "vote_type": "unweighted",
    "vote_params": None,
    "optimal_threshold": {
        "Atrium_L": 0.5, "Ventricle_L": 0.5, "Atrium_R": 0.5, "Ventricle_R": 0.5,
        "A_Aorta": 0.5, "A_Pulmonary": 0.5, "V_Venacava_S": 0.5, "Heart": 0.5,
    },
}
OPEN_ATLAS_SETTINGS["vessel_spline_settings"] = {
    "vessel_name_list": ["A_LAD", "A_Cflx", "A_Coronary_L", "A_Coronary_R"],
    "vessel_radius_mm_dict": {
        "A_LAD": 2, "A_Cflx": 2, "A_Coronary_L": 2, "A_Coronary_R": 2,
    },
    "scan_direction_dict": {
        "A_LAD": "z", "A_Cflx": "z", "A_Coronary_L": "x", "A_Coronary_R": "z",
    },
    "stop_condition_type_dict": {
        "A_LAD": "count", "A_Cflx": "count", "A_Coronary_L": "count",
        "A_Coronary_R": "count",
    },
    "stop_condition_value_dict": {
        "A_LAD": 2, "A_Cflx": 2, "A_Coronary_L": 2, "A_Coronary_R": 2,
    },
}
OPEN_ATLAS_SETTINGS["geometric_segmentation_settings"]["atlas_structure_names"] = {
    "atlas_left_ventricle": "Ventricle_L",
    "atlas_right_ventricle": "Ventricle_R",
    "atlas_left_atrium": "Atrium_L",
    "atlas_right_atrium": "Atrium_R",
    "atlas_ascending_aorta": "A_Aorta",
    "atlas_pulmonary_artery": "A_Pulmonary",
    "atlas_superior_vena_cava": "V_Venacava_S",
    "atlas_whole_heart": "Heart",
}
OPEN_ATLAS_SETTINGS["postprocessing_settings"]["structures_for_binaryfillhole"] = [
    "Atrium_L", "Ventricle_L", "Atrium_R", "Ventricle_R", "A_Aorta",
    "A_Pulmonary", "V_Venacava_S", "Heart",
]
OPEN_ATLAS_SETTINGS["postprocessing_settings"]["structures_for_overlap_correction"] = [
    "Atrium_L", "Ventricle_L", "Atrium_R", "Ventricle_R", "A_Aorta",
    "A_Pulmonary", "V_Venacava_S",
]
OPEN_ATLAS_SETTINGS["return_proba_as_contours"] = True

HYBRID_SETTINGS_DEFAULTS = {
    "fetch_open_atlas": True,
    "nnunet_settings": None,  # populated lazily from projects.nnunet
    "cardiac_settings": OPEN_ATLAS_SETTINGS,
}


def install_open_atlas(atlas_path):
    """Fetch the open atlas from Zenodo into atlas_path (requires network)."""
    import shutil
    import tempfile

    from platipy_tpu.utils.download import download_and_extract_zip_file

    logger.info("Fetching and installing open cardiac atlas to %s", atlas_path)
    temp_dir = tempfile.mkdtemp()
    download_and_extract_zip_file(OPEN_ATLAS_URL, temp_dir)
    temp_atlas_path = Path(temp_dir).joinpath("test_atlas")
    atlas_path = Path(atlas_path)
    if not atlas_path.parent.exists():
        atlas_path.parent.mkdir(parents=True)
    shutil.copytree(temp_atlas_path, atlas_path)
    shutil.rmtree(temp_dir)


def install_atlas_from_zipfile(zip_file_path, atlas_path):
    """Install an atlas from a local zip (reference cardiac/run.py:428-441).

    Handles both zip layouts: cases at the archive root AND cases inside a
    single wrapper directory (the Zenodo open-atlas zip wraps everything in
    ``test_atlas/`` — blindly copying the extract root would double-nest the
    install so ``_load_atlas_set`` finds no cases)."""
    import shutil
    import tempfile
    import zipfile

    atlas_path = Path(atlas_path)
    with tempfile.TemporaryDirectory() as temp_dir:
        temp_atlas_path = Path(temp_dir).joinpath("test_atlas")
        with zipfile.ZipFile(str(zip_file_path), "r") as zip_ref:
            zip_ref.extractall(temp_atlas_path)
        entries = list(temp_atlas_path.iterdir())
        if len(entries) == 1 and entries[0].is_dir():
            sole = entries[0]
            is_case = any((sole / sub).exists() for sub in ("Images", "Structures"))
            if not is_case:
                temp_atlas_path = sole  # descend into the wrapper directory
        if not atlas_path.parent.exists():
            atlas_path.parent.mkdir(parents=True)
        shutil.copytree(temp_atlas_path, atlas_path)


def display_open_cardiac_zip_url_locations():
    """Print the zip URLs needed for an offline hybrid-cardiac install
    (reference cardiac/run.py:443-456)."""
    from platipy_tpu.projects.nnunet.run import available_nnunet_models

    nnunet_zip_url = available_nnunet_models()["Task400_OPEN_HEART_1FOLD"]["url"]
    print("Please download the following two zip files:")
    print(nnunet_zip_url)
    print(OPEN_ATLAS_URL)
    print()
    print(
        "Once downloaded, pass where these are located on your filesystem to "
        "the install_hybrid_cardiac_from_zip function."
    )


def install_hybrid_cardiac_from_zip(path_to_nnunet_zip, path_to_atlas_zip):
    """Offline install of the hybrid pipeline's model + atlas
    (reference cardiac/run.py:459-470; the nnU-Net zip is converted to
    native parameters rather than a torch results folder)."""
    from platipy_tpu.projects.nnunet.run import install_nnunet_model_from_zip

    install_nnunet_model_from_zip(path_to_nnunet_zip, "Task400_OPEN_HEART_1FOLD")
    install_atlas_from_zipfile(
        path_to_atlas_zip,
        Path(OPEN_ATLAS_SETTINGS["atlas_settings"]["atlas_path"]),
    )


def run_hybrid_segmentation(img: Image, settings=HYBRID_SETTINGS_DEFAULTS):
    """CNN whole-heart + atlas substructures (reference run.py:473-504)."""
    from platipy_tpu.projects.nnunet.run import NNUNET_SETTINGS_DEFAULTS
    from platipy_tpu.projects.nnunet.run import run_segmentation as run_nnunet

    atlas_path = Path(settings["cardiac_settings"]["atlas_settings"]["atlas_path"])
    if not atlas_path.exists() or len(list(atlas_path.glob("*"))) == 0:
        if settings["fetch_open_atlas"]:
            install_open_atlas(atlas_path)
        else:
            raise SystemError(f"No atlas exists at {atlas_path}")

    nnunet_settings = settings["nnunet_settings"] or NNUNET_SETTINGS_DEFAULTS
    mask_wh = run_nnunet(img, nnunet_settings)

    if "Struct_0" not in mask_wh.keys():
        logger.warning("Whole Heart segmentation failed. Unable to proceed.")
        # same (results, results_prob) shape as the success path — callers
        # unpack a tuple (services/cardiac/service.py)
        return {}, {}

    return run_cardiac_segmentation(
        img, guide_structure=mask_wh["Struct_0"], settings=settings["cardiac_settings"]
    )


def _load_atlas_set(settings):
    from platipy_tpu.nifti.io import read_image

    atlas_settings = settings["atlas_settings"]
    atlas_set = {}

    in_memory = atlas_settings.get("atlas_set")
    if in_memory is not None:
        for atlas_id, case in in_memory.items():
            atlas_set[atlas_id] = {"Original": dict(case)}
        return atlas_set

    atlas_path = atlas_settings["atlas_path"]
    for atlas_id in atlas_settings["atlas_id_list"]:
        image = read_image(
            f"{atlas_path}/{atlas_settings['atlas_image_format'].format(atlas_id)}"
        )
        structures = {
            struct: read_image(
                f"{atlas_path}/{atlas_settings['atlas_label_format'].format(atlas_id, struct)}"
            )
            for struct in atlas_settings["atlas_structure_list"]
        }
        atlas_set[atlas_id] = {"Original": {"CT Image": image, **structures}}
    return atlas_set


def run_cardiac_segmentation(img: Image, guide_structure: Image = None,
                             settings=CARDIAC_SETTINGS_DEFAULTS):
    """Run the atlas-based cardiac segmentation (reference run.py:507-1148).

    Returns (results, results_prob).
    """

    # opt-in stage profiling (PLATIPY_TPU_PROFILE=1), mirroring the
    # multiatlas pipeline's laps — syncs remove overlap, use for attribution
    timer = None
    if os.environ.get("PLATIPY_TPU_PROFILE") == "1":
        from platipy_tpu.utils.profiling import StageTimer

        timer = StageTimer()
    results = {}
    results_prob = {}

    return_as_cropped = settings["return_as_cropped"]

    atlas_settings = settings["atlas_settings"]
    atlas_structure_list = atlas_settings["atlas_structure_list"]
    guide_structure_name = atlas_settings.get("guide_structure_name")

    atlas_set = _load_atlas_set(settings)
    atlas_id_list = list(atlas_set.keys())

    if atlas_settings["crop_atlas_to_structures"]:
        for atlas_id in atlas_id_list:
            case = atlas_set[atlas_id]["Original"]
            cb_size, cb_index = label_to_roi(
                [case[s] for s in atlas_structure_list],
                expansion_mm=atlas_settings["crop_atlas_expansion_mm"],
            )
            case["CT Image"] = crop_to_roi(case["CT Image"], cb_size, cb_index)
            for struct in atlas_structure_list:
                case[struct] = crop_to_roi(case[struct], cb_size, cb_index)

    # --- step 1: cropping -----------------------------------------------------
    expansion_mm = settings["auto_crop_target_image_settings"]["expansion_mm"]

    if guide_structure:
        crop_box_size, crop_box_index = label_to_roi(guide_structure, expansion_mm=expansion_mm)
        crop_box_size, crop_box_index = pad_roi_to_multiple(
            crop_box_size, crop_box_index, img.size, 32
        )
        crop_box_size, crop_box_index = snap_roi_to_seen_bucket(
            crop_box_size, crop_box_index, img.size
        )
        img_crop = crop_to_roi(img, crop_box_size, crop_box_index)
        guide_structure = crop_to_roi(guide_structure, crop_box_size, crop_box_index)
        target_reg_structure = convert_mask_to_reg_structure(guide_structure, expansion=2)
    else:
        quick_reg_settings = {
            "reg_method": "similarity",
            "shrink_factors": [8],
            "smooth_sigmas": [0],
            "sampling_rate": 0.75,
            "default_value": -1000,
            "number_of_iterations": 25,
            "convergence_window": 5,
            "final_interp": INTERP_LINEAR,
            "metric": "mean_squares",
            "optimiser": "gradient_descent_line_search",
        }
        logger.info("Running initial similarity transform to crop image volume")
        crop_ids = atlas_id_list[: min(8, len(atlas_id_list))]
        crop_movings = [atlas_set[i]["Original"]["CT Image"] for i in crop_ids]
        reg_stack, _ = linear_registration_batched(
            img, crop_movings, as_stack=True,
            **{k: v for k, v in quick_reg_settings.items() if k != "verbose"},
        )
        # combine on device: one program + one uint8 fetch inside label_to_roi
        # instead of eight full float32 volume pulls over the device link
        from platipy_tpu.parallel.atlas import combine_for_crop

        combined_image = img.with_array(combine_for_crop(reg_stack))
        crop_box_size, crop_box_index = label_to_roi(combined_image, expansion_mm=expansion_mm)
        crop_box_size, crop_box_index = pad_roi_to_multiple(
            crop_box_size, crop_box_index, img.size, 32
        )
        crop_box_size, crop_box_index = snap_roi_to_seen_bucket(
            crop_box_size, crop_box_index, img.size
        )
        img_crop = crop_to_roi(img, crop_box_size, crop_box_index)

        # TPU extension (default off = reference parity): sample the affine
        # metric only on the tight box where the quick-registered atlases
        # actually carry data.  On full-FOV targets the crop box's margin is
        # mostly target-only anatomy mapping out of every atlas; a
        # valid-point-excluded mean metric then REWARDS scale distortions
        # that swap hard in-bounds points for easy margin points (measured
        # r5: per-atlas affine scale factors 0.80-1.14 on the full-grid
        # bench, ~2-8 mm of mid-volume structure displacement).  Transforms
        # are physical-space, so registering on the tight grid and warping
        # onto the full crop grid compose exactly.
        linear_target = None
        if settings["linear_registration_settings"].get(
            "metric_box", "crop"
        ) == "atlas_extent":
            # engage ONLY on genuinely full-FOV inputs (the auto-crop
            # actually cropped): that is the regime whose tissue-filled
            # margins feed the metric gaming.  On already-tight inputs the
            # crop-box margins are the atlas's own air surroundings — no
            # gaming reward exists, and the tight box costs a second
            # registration call per case (+2 s warm, measured r5) with no
            # DSC change
            dilution = (max(float(np.prod(np.asarray(crop_box_size))), 1.0)
                        / float(np.prod(np.asarray(img.size))))
            # the POINT is dropping the crop's 20-40 mm dilution margins;
            # a NEGATIVE margin shrinks the box inside the atlas extent so
            # every sampled fixed point stays in-bounds for any plausible
            # transform — leaving the metric's valid-point normalisation
            # nothing to game at the box faces
            mb_exp = settings["linear_registration_settings"].get(
                "metric_box_expansion_mm", [10, 10, 10]
            )
            reg_size, reg_index = label_to_roi(combined_image,
                                               expansion_mm=mb_exp)
            reg_size, reg_index = pad_roi_to_multiple(
                reg_size, reg_index, img.size, 32
            )
            reg_size, reg_index = snap_roi_to_seen_bucket(
                reg_size, reg_index, img.size, max_overhead=1.2
            )
            # guard: quick-reg extents of air-dominated atlases can collapse
            # to the structures alone (combine_for_crop keeps voxels above
            # air) — a degenerate sliver is a worse metric domain than the
            # crop, so require a substantial box before engaging
            substantial = all(
                r >= 0.5 * c for r, c in zip(reg_size, crop_box_size)
            )
            if (dilution < 0.5 and substantial
                    and tuple(reg_size) != tuple(crop_box_size)):
                linear_target = crop_to_roi(img, reg_size, reg_index)

    logger.info("Calculated crop box: %s %s", crop_box_index, crop_box_size)
    if timer:
        timer.lap("load_and_crop", sync=img_crop)
    # sub-stage attribution timer (profiled runs only): its laps SYNC, which
    # serializes the async pipeline — that is exactly why stage profiling is
    # a separate bench run, never the timed one
    dtimer = None
    if timer:
        from platipy_tpu.utils.profiling import StageTimer as _ST

        dtimer = _ST()
        dtimer.lap("_align")  # align the lap origin with the stage boundary

    # --- step 2: linear registration (batched over atlases) ---------------------
    # The reference loops per atlas (run.py:674-745); here ONE fused program
    # registers every atlas (and already returns the registered volumes on the
    # target grid — the serial form re-warped them in a second dispatch), and
    # every remaining structure/CT/guide-mask warp runs as ONE batched
    # dispatch through the STACKED transform pytree (per-atlas pytree slicing
    # + re-stacking paid ~40 small device programs per pipeline call)
    from platipy_tpu.generation.mask import _extend_sup_arr
    from platipy_tpu.registration.linear import apply_transforms_batched

    linear_registration_settings = settings["linear_registration_settings"]
    logger.info("Running %s transform to align atlas images (batched)",
                linear_registration_settings["reg_method"])

    originals = [atlas_set[i]["Original"] for i in atlas_id_list]
    n_atlases = len(atlas_id_list)
    reg_kwargs = {k: v for k, v in linear_registration_settings.items()
                  if k not in ("verbose", "metric_box", "metric_box_expansion_mm")}
    if guide_structure:
        from platipy_tpu.registration.utils import convert_masks_to_reg_structures

        atlas_reg_images = convert_masks_to_reg_structures(
            [o[guide_structure_name] for o in originals], expansion=2
        )
        # reg structures live in [0,1]: the CT default of -1000 would become
        # the PAD FILL for mixed-shape atlases and (0-(-1000))^2 pad terms
        # would dominate the metric — use background 0 for the registration
        reg_kwargs["default_value"] = 0
        # the fused program's final warp IS the linearly-registered reg mask
        reg_mask_rir, batched_tfms, stacked_tfm = linear_registration_batched(
            target_reg_structure, atlas_reg_images, as_stack=True,
            return_stacked_transform=True, **reg_kwargs
        )
    else:
        # ...and here it IS the linearly-registered CT stack (same interp and
        # default value the dedicated CT warp used)
        if linear_target is not None:
            # tight-metric-box extension: optimise on the atlas-data box,
            # then warp onto the pipeline crop grid (transforms compose in
            # physical space, so the grids interchange exactly)
            _, batched_tfms, stacked_tfm = linear_registration_batched(
                linear_target, [o["CT Image"] for o in originals],
                as_stack=True, return_stacked_transform=True, **reg_kwargs
            )
            dv = reg_kwargs.get("default_value")
            if dv is None:  # the serial path's CT auto-detect (linear.py);
                # scalar device fetch, not a full-volume pull
                dv = -1000 if float(
                    jnp.min(jnp.asarray(originals[0]["CT Image"].array))
                ) <= -1000 else 0
            ct_rir = apply_transforms_batched(
                stacked_tfm, [o["CT Image"] for o in originals], img_crop,
                interpolator=reg_kwargs.get("final_interp", INTERP_LINEAR),
                default_value=dv, as_stack=True,
            )
        else:
            ct_rir, batched_tfms, stacked_tfm = linear_registration_batched(
                img_crop, [o["CT Image"] for o in originals], as_stack=True,
                return_stacked_transform=True, **reg_kwargs
            )
    if dtimer:
        dtimer.lap("linear_reg",
                   sync=jax.tree_util.tree_leaves(stacked_tfm)[0])

    # every structure (plus the expanded guide mask) is BIT-PACKED per atlas
    # into one f32 integer volume: nearest-neighbour sampling selects whole
    # source voxels, so every NN warp downstream (linear here, the demons
    # DVFs at steps 3a/3b) moves ONE volume per atlas instead of one per
    # (structure, atlas) pair — bitwise-identical results at ~1/S the gather
    # traffic (linear_warps 1.47 s -> ~0.2 s on the 3-structure bench, more
    # on the 16-structure reference set).  Unpacked once, after the LAST warp.
    from platipy_tpu.parallel.atlas import extract_packed_bit, pack_binary_masks

    n_bit_groups = len(atlas_structure_list)
    expanded_images = []
    if guide_structure:
        # superior guide-mask extension entirely on device, packed as the
        # highest bit
        for o in originals:
            g = o[guide_structure_name]
            n_ext = int(atlas_settings["superior_extension"] / g.spacing[2])
            n_est = int((atlas_settings["superior_extension"] / 2) / g.spacing[2])
            expanded_images.append(
                _extend_sup_arr(g.array.astype(jnp.float32), n_ext, n_est)
            )
        n_bit_groups += 1
    else:
        # everywhere-1 highest bit: its NN warp IS the in-bounds mask of the
        # linear transform, consumed by the intensity demons' OOB gating
        n_bit_groups += 1
    # structure lists beyond one f32 volume's 24 exact bits chunk into
    # multiple packed volumes (the reference cardiac set is 16+1 = one
    # group; each extra group re-runs the same compiled warp program)
    _GROUP_BITS = 24
    n_pack_groups = max(1, -(-n_bit_groups // _GROUP_BITS))
    guide_bit_group = (n_bit_groups - 1) // _GROUP_BITS
    guide_bit_local = (n_bit_groups - 1) % _GROUP_BITS

    if len(atlas_structure_list) or guide_structure:
        packed_rir = []
        for g in range(n_pack_groups):
            bits = range(g * _GROUP_BITS, min((g + 1) * _GROUP_BITS, n_bit_groups))
            pack_inputs = []
            for k, o in enumerate(originals):
                arrs, validity = [], False
                for b in bits:
                    if b < len(atlas_structure_list):
                        arrs.append(o[atlas_structure_list[b]].array)
                    elif guide_structure:
                        arrs.append(expanded_images[k])
                    else:
                        validity = True  # appended as all-ones by the packer
                if arrs:
                    packed = pack_binary_masks(arrs, append_validity=validity)
                else:
                    # validity-only group: the packed volume IS the ones plane
                    packed = jnp.ones(tuple(o["CT Image"].spatial_shape),
                                      jnp.float32)
                pack_inputs.append(o["CT Image"].with_array(packed))
            packed_rir.append(apply_transforms_batched(
                stacked_tfm, pack_inputs, img_crop,
                interpolator=INTERP_NEAREST, default_value=0, as_stack=True,
            ))
            del pack_inputs
    else:  # no structures and no guide masks to propagate
        packed_rir = [jnp.zeros(
            (n_atlases,) + tuple(img_crop.spatial_shape), jnp.float32
        )]
    if guide_structure:
        ct_rir = apply_transforms_batched(
            stacked_tfm, [o["CT Image"] for o in originals], img_crop,
            interpolator=INTERP_LINEAR, default_value=-1000, as_stack=True,
        )
    if dtimer:
        dtimer.lap("linear_warps", sync=packed_rir[-1])

    for k, atlas_id in enumerate(atlas_id_list):
        # per-atlas RIR volumes are never read individually (steps 3a/3b
        # consume the stacks directly); keep the reference-parity Transform
        atlas_set[atlas_id]["RIR"] = {"Transform": batched_tfms[k]}
        atlas_set[atlas_id]["Original"] = None

    # release the originals before the memory-peak demons stages — as
    # function-scoped locals they would pin a second full copy of every atlas
    # volume that atlas_set[...]["Original"] = None just dropped
    del originals, expanded_images
    if guide_structure:
        del atlas_reg_images

    spacing = img_crop.spacing
    from platipy_tpu.parallel.atlas import sharding_enabled

    mesh = atlas_mesh() if (len(jax.devices()) > 1 and sharding_enabled()) else None

    def _maybe_shard(stack):
        # pad the atlas axis to a device-count multiple (fusion and IAR
        # consume per-atlas dict entries indexed < n_atlases, so padded
        # lanes never reach a reduction)
        if mesh is not None:
            stack, _ = pad_atlas_axis(stack, len(jax.devices()))
            return shard_over_atlases(stack, mesh)
        return stack

    if timer:
        # sync on a step-2 product so async registration/warp work is
        # attributed here, not to the next synced lap
        sync_on = packed_rir[-1] if atlas_structure_list else ct_rir
        if dtimer:
            dtimer.lap("linear_store", sync=sync_on)
        timer.lap("linear_registration", sync=sync_on)

    # --- step 3a: structure-guided demons (batched) -----------------------------
    if guide_structure:
        sgr = settings["structure_guided_registration_settings"]
        logger.info("Running structure-guided deformable registration (batched)")

        reg_mask_stack = _maybe_shard(reg_mask_rir)
        dvf_struct = batched_multiscale_demons(
            target_reg_structure.array.astype(jnp.float32),
            reg_mask_stack,
            spacing_xyz=spacing,
            resolution_staging=sgr["resolution_staging"],
            iteration_staging=sgr["iteration_staging"],
            smoothing_sigmas=sgr.get("smoothing_sigmas") or sgr["resolution_staging"],
            isotropic_resample=sgr["isotropic_resample"],
            maximum_rms_error=sgr.get("maximum_rms_error"),
            field_dtype=sgr.get("field_dtype"),
        )

        ct_stack = batched_warp_by_dvf(_maybe_shard(ct_rir), dvf_struct, spacing,
                                       interp=INTERP_LINEAR, default_value=-1000.0)
        # the packed structure volume (all structures + the expanded guide
        # masks) through the struct DVFs in ONE [N, z, y, x] dispatch per group
        packed_stack = [
            batched_warp_by_dvf(
                _maybe_shard(p), dvf_struct, spacing,
                interp=INTERP_NEAREST, default_value=0.0,
            )
            for p in packed_rir
        ]
        # only the guide bit is needed before the final unpack (HU gating)
        expanded_stack = extract_packed_bit(
            packed_stack[guide_bit_group], guide_bit_local
        )
        del reg_mask_rir, ct_rir, packed_rir
    else:
        ct_stack = _maybe_shard(ct_rir)
        packed_stack = [_maybe_shard(p) for p in packed_rir]
        del ct_rir, packed_rir
    if dtimer:
        dtimer.lap("demons_restack", sync=ct_stack)

    # --- step 3b: intensity demons (batched) ------------------------------------
    deformable_registration_settings = settings["deformable_registration_settings"]
    logger.info("Running batched DIR to refine atlas image registration")

    target_arr = img_crop.array.astype(jnp.float32)
    if guide_structure:
        # HU gating (reference :821-842): mask both images to the combined
        # expanded guide masks and to atlas HU > -400
        expanded_target_mask = extend_mask(
            guide_structure,
            direction=("ax", "sup"),
            extension_mm=atlas_settings["superior_extension"],
            interior_mm_shape=atlas_settings["superior_extension"] / 2,
        )
        combined_mask = jnp.maximum(
            expanded_stack, (expanded_target_mask.array > 0).astype(jnp.float32)[None]
        )
        atlas_fixed = jnp.where(combined_mask > 0, target_arr[None], -1000.0)
        moving_gated = jnp.where(combined_mask > 0, ct_stack, -1000.0)
        moving_gated = jnp.where(moving_gated > -400, moving_gated, -1000.0)
        atlas_fixed = jnp.where(moving_gated > -400, atlas_fixed, -1000.0)
        demons_fixed = atlas_fixed          # [N, z, y, x] per-atlas fixed
        demons_moving = moving_gated
    else:
        demons_fixed = target_arr
        demons_moving = ct_stack
        if (deformable_registration_settings.get("oob_inherit_fixed")
                and atlas_structure_list):
            # TPU extension (no ITK equivalent): out-of-bounds regions of the
            # linearly-registered atlas inherit the FIXED image's intensity,
            # so the atlas's crop faces (its -1000 fill against whatever the
            # target holds there) generate no demons forces.  On full-FOV
            # targets those boundary steps otherwise destabilise the whole
            # field: measured r4, per-atlas vessel centreline error 0.7-4.2
            # voxels on a torso-slab-extended crop vs 0.5-0.8 on the tight
            # crop.  The in-bounds mask is the packed stack's validity bit
            # (free: an everywhere-1 plane NN-warped with default 0).
            valid = extract_packed_bit(
                packed_stack[guide_bit_group], guide_bit_local
            )
            demons_moving = jnp.where(valid > 0, ct_stack, target_arr[None])

    dvf_stack = batched_multiscale_demons(
        demons_fixed,
        demons_moving,
        spacing_xyz=spacing,
        resolution_staging=deformable_registration_settings["resolution_staging"],
        iteration_staging=deformable_registration_settings["iteration_staging"],
        smoothing_sigmas=deformable_registration_settings.get("smoothing_sigmas")
        or deformable_registration_settings["resolution_staging"],
        isotropic_resample=deformable_registration_settings["isotropic_resample"],
        maximum_rms_error=deformable_registration_settings.get("maximum_rms_error"),
        # "bfloat16" stores the field/update chain in bf16 (HBM-bound loop:
        # ~1.9x modelled; sub-0.01 mm field deltas measured) — f32 default
        field_dtype=deformable_registration_settings.get("field_dtype"),
    )
    if dtimer:
        dtimer.lap("demons_core", sync=dvf_stack)

    dir_images = batched_warp_by_dvf(ct_stack, dvf_stack, spacing,
                                     interp=INTERP_LINEAR, default_value=-1000.0)
    # every structure through the refined DVFs as ONE packed [N, z, y, x]
    # dispatch per group, then ONE unpack per group to the [S, N, z, y, x] stack
    dir_structs = {}
    if atlas_structure_list:
        from platipy_tpu.parallel.atlas import unpack_binary_masks

        unpacked_groups = []
        for g, p in enumerate(packed_stack):
            packed_dir = batched_warp_by_dvf(
                p, dvf_stack, spacing,
                interp=INTERP_NEAREST, default_value=0.0,
            )
            n_bits_g = min((g + 1) * _GROUP_BITS, n_bit_groups) - g * _GROUP_BITS
            unpacked_groups.append(unpack_binary_masks(packed_dir, n_bits_g))
        # concatenating the groups and slicing to S drops the guide bit (if any)
        dir_struct_stack = (
            unpacked_groups[0] if len(unpacked_groups) == 1
            else jnp.concatenate(unpacked_groups, axis=0)
        )[: len(atlas_structure_list)]
        dir_structs = {s: dir_struct_stack[i]
                       for i, s in enumerate(atlas_structure_list)}

    for k, atlas_id in enumerate(atlas_id_list):
        atlas_set[atlas_id]["DIR"] = {"CT Image": img_crop.with_array(dir_images[k])}
        for s in atlas_structure_list:
            atlas_set[atlas_id]["DIR"][s] = img_crop.with_array(dir_structs[s][k])

    if timer:
        if dtimer:
            dtimer.lap("demons_warp_structs", sync=dir_images)
        timer.lap("demons_stages", sync=dir_images)

    if os.environ.get("PLATIPY_TPU_DEBUG_ATLAS_SET") == "1":
        # diagnostic hook (pre-IAR): the FULL post-DIR atlas set plus the crop
        # grid/box, so accuracy probes can replay IAR / vessel splining /
        # fusion offline without re-running registration
        import sys

        sys.modules[__name__].LAST_ATLAS_SET_PRE_IAR = {
            i: dict(atlas_set[i]) for i in atlas_id_list
        }
        sys.modules[__name__].LAST_IMG_CROP = img_crop
        sys.modules[__name__].LAST_CROP_BOX = (crop_box_size, crop_box_index)

    # --- step 4: iterative atlas removal ----------------------------------------
    # the FULL registered set survives IAR pruning (run_iar returns a subset
    # view; the per-atlas dicts are shared, not copied) so vessel splining
    # can optionally use every registered atlas (see step 5)
    atlas_set_all = dict(atlas_set)
    iar_settings = settings["iar_settings"]
    if iar_settings["reference_structure"]:
        for atlas_id in atlas_id_list:
            atlas_image = atlas_set[atlas_id]["DIR"]["CT Image"]
            weight_map = compute_weight_map(img_crop, atlas_image, vote_type="global")
            atlas_set[atlas_id]["DIR"]["Weight Map"] = weight_map
        atlas_set = run_iar(atlas_set=atlas_set, **iar_settings)
        atlas_id_list = list(atlas_set.keys())
    else:
        logger.info("IAR: No reference structure, skipping iterative atlas removal.")

    if timer:
        timer.lap("iar")

    # --- step 5: vessel splining -------------------------------------------------
    vessel_spline_settings = dict(settings["vessel_spline_settings"])
    # EXTENSION (default False = reference parity, which splines the
    # IAR-pruned set): estimate vessel COM statistics from EVERY registered
    # atlas — per-slice centroid statistics benefit from the larger sample,
    # and the intensity weighting of com_source="fused_probability" already
    # suppresses poorly registered atlases voxel-by-voxel
    vessel_use_all = vessel_spline_settings.pop("use_all_registered_atlases", False)
    segmented_vessel_dict = {}
    if len(vessel_spline_settings["vessel_name_list"]) > 0:
        segmented_vessel_dict = vessel_spline_generation(
            img_crop, atlas_set_all if vessel_use_all else atlas_set,
            **vessel_spline_settings
        )

    if timer:
        timer.lap("vessel_splining")
    if os.environ.get("PLATIPY_TPU_DEBUG_ATLAS_SET") == "1":
        # diagnostic hook: expose the post-DIR atlas set (propagated
        # structures, weight maps) so accuracy probes can dissect the
        # splining inputs without re-running registration
        import sys

        sys.modules[__name__].LAST_ATLAS_SET = atlas_set

    # --- step 6: fusion ------------------------------------------------------------
    vote_type = settings["label_fusion_settings"]["vote_type"]
    vote_params = settings["label_fusion_settings"]["vote_params"]

    for atlas_id in atlas_id_list:
        atlas_image = atlas_set[atlas_id]["DIR"]["CT Image"]
        weight_map = compute_weight_map(img_crop, atlas_image, vote_type=vote_type,
                                        vote_params=vote_params)
        atlas_set[atlas_id]["DIR"]["Weight Map"] = weight_map

    combined_label_dict = combine_labels(atlas_set, atlas_structure_list)

    # --- step 7: binary segmentations (CROP space) -------------------------------
    # EVERYTHING through step 9 stays on the crop grid; the paste into the
    # original space happens ONCE at the end.  The reference pastes here and
    # post-processes full-grid images (run.py:908-1140) — on a 512x512x192
    # input that costs tens of seconds of full-grid traffic (measured r4:
    # fusion_and_paste 43.8 s + postprocessing 15.9 s, dominated by per-atlas
    # full-grid vessel pastes, host-side bit-encoding and full-grid CC pulls)
    # for bitwise-identical results: every op below is local to the crop box.
    logger.info("Generating binary segmentations.")

    vote_structures = settings["label_fusion_settings"]["optimal_threshold"].keys()
    vote_structures = [i for i in vote_structures if i in atlas_structure_list]

    # threshold + fill + largest-component for ALL vote structures in one
    # batched pass (one stacked device pull/push instead of a latency-bound
    # round-trip set per structure; see label/fusion.py)
    from platipy_tpu.label.fusion import process_probability_stack
    from platipy_tpu.utils.crop import paste_stack

    if vote_structures:
        proc_stack = process_probability_stack(
            jnp.stack([combined_label_dict[s].array for s in vote_structures]),
            [settings["label_fusion_settings"]["optimal_threshold"][s]
             for s in vote_structures],
        )
        for k, structure_name in enumerate(vote_structures):
            results[structure_name] = img_crop.with_array(proc_stack[k])
            if settings["return_proba_as_contours"]:
                atlas_contours = [
                    process_probability_image(atlas_set[a]["DIR"][structure_name], 0.5)
                    for a in atlas_id_list
                ]
                results_prob[structure_name] = binary_encode_structure_list(atlas_contours)
            else:
                results_prob[structure_name] = combined_label_dict[structure_name]

    if vote_structures and (not settings["return_atlas_guide_structure"]) and (
        guide_structure is not None
    ):
        results[guide_structure_name] = guide_structure
        results_prob[guide_structure_name] = guide_structure

    for structure_name in vessel_spline_settings["vessel_name_list"]:
        if structure_name not in segmented_vessel_dict:
            continue
        results[structure_name] = segmented_vessel_dict[structure_name]
        results_prob[structure_name] = binary_encode_structure_list(
            [atlas_set[a]["DIR"][structure_name] for a in atlas_id_list]
        )

    if timer:
        timer.lap("fusion_and_paste")

    # --- step 8: geometric valves / conduction nodes ------------------------------
    geometric_segmentation_settings = settings["geometric_segmentation_settings"]
    if geometric_segmentation_settings["run_geometric_algorithms"]:
        logger.info("Computing geometric definitions for valves and conduction system.")
        geom_atlas_names = geometric_segmentation_settings["atlas_structure_names"]
        geom_valve_defs = geometric_segmentation_settings["valve_definitions"]
        geom_conduction_defs = geometric_segmentation_settings[
            "conduction_system_definitions"
        ]

        results["Valve_Mitral"] = generate_valve_using_cylinder(
            label_atrium=results[geom_atlas_names["atlas_left_atrium"]],
            label_ventricle=results[geom_atlas_names["atlas_left_ventricle"]],
            radius_mm=geom_valve_defs["mitral_valve_radius_mm"],
            height_mm=geom_valve_defs["mitral_valve_thickness_mm"],
        )
        results["Valve_Tricuspid"] = generate_valve_using_cylinder(
            label_atrium=results[geom_atlas_names["atlas_right_atrium"]],
            label_ventricle=results[geom_atlas_names["atlas_right_ventricle"]],
            radius_mm=geom_valve_defs["tricuspid_valve_radius_mm"],
            height_mm=geom_valve_defs["tricuspid_valve_thickness_mm"],
        )
        results["Valve_Aortic"] = generate_valve_from_great_vessel(
            label_great_vessel=results[geom_atlas_names["atlas_ascending_aorta"]],
            label_ventricle=results[geom_atlas_names["atlas_left_ventricle"]],
            valve_thickness_mm=geom_valve_defs["aortic_valve_thickness_mm"],
        )
        results["Valve_Pulmonic"] = generate_valve_from_great_vessel(
            label_great_vessel=results[geom_atlas_names["atlas_pulmonary_artery"]],
            label_ventricle=results[geom_atlas_names["atlas_right_ventricle"]],
            valve_thickness_mm=geom_valve_defs["pulmonic_valve_thickness_mm"],
        )
        results["CN_Sinoatrial"] = geometric_sinoatrialnode(
            label_svc=results[geom_atlas_names["atlas_superior_vena_cava"]],
            label_ra=results[geom_atlas_names["atlas_right_atrium"]],
            label_wholeheart=results[geom_atlas_names["atlas_whole_heart"]],
            radius_mm=geom_conduction_defs["sinoatrial_node_radius_mm"],
        )
        results["CN_Atrioventricular"] = geometric_atrioventricularnode(
            label_la=results[geom_atlas_names["atlas_left_atrium"]],
            label_lv=results[geom_atlas_names["atlas_left_ventricle"]],
            label_ra=results[geom_atlas_names["atlas_right_atrium"]],
            label_rv=results[geom_atlas_names["atlas_right_ventricle"]],
            radius_mm=geom_conduction_defs["atrioventricular_node_radius_mm"],
        )

    # --- step 9: post-processing ----------------------------------------------
    postprocessing_settings = settings["postprocessing_settings"]
    if postprocessing_settings["run_postprocessing"]:
        logger.info("Running post-processing.")
        binaryfillhole_img = [
            int(postprocessing_settings["binaryfillhole_mm"] / sp) for sp in img.spacing
        ]

        # keep-largest + closing for every structure in two batched passes
        # (one stacked pull/push for the host CC, one closing program) —
        # unlike multiatlas, largest-component is NOT a no-op here: vessel
        # and geometric structures did not pass through the fusion fill
        fillhole_structs = [
            s for s in postprocessing_settings["structures_for_binaryfillhole"]
            if s in results
        ]
        if fillhole_structs:
            from platipy_tpu.core.components import (
                keep_largest_component_stack_device,
            )
            from platipy_tpu.core.morphology import binary_closing_batched

            largest_stack = keep_largest_component_stack_device(
                jnp.stack([results[s].array for s in fillhole_structs])
            )
            closed = binary_closing_batched(largest_stack, binaryfillhole_img)
            for k, s in enumerate(fillhole_structs):
                results[s] = results[s].with_array(closed[k].astype(jnp.uint8))

        input_overlap = {
            s: results[s]
            for s in postprocessing_settings["structures_for_overlap_correction"]
            if s in results
        }
        if len(input_overlap) >= 2:
            output_overlap = correct_volume_overlap(input_overlap)
            for s in input_overlap:
                results[s] = output_overlap[s]

    # --- step 10: ONE paste of everything into the original space ---------------
    if return_as_cropped:
        results["CROP_IMAGE"] = img_crop
    else:
        binary_names = list(results.keys())
        if binary_names:
            full_stack = paste_stack(
                jnp.stack([results[n].array for n in binary_names]),
                img.spatial_shape, crop_box_index, dtype=jnp.uint8,
            )
            results = {n: img.with_array(full_stack[k])
                       for k, n in enumerate(binary_names)}
        # probability outputs: group by dtype so each group is one paste
        prob_f32 = [n for n, v in results_prob.items()
                    if jnp.issubdtype(v.array.dtype, jnp.floating)]
        prob_enc = [n for n, v in results_prob.items()
                    if v.array.dtype == jnp.uint32]
        # 32-structure encodings are uint64 (bit layout starts at bit 1, so
        # structure 32 occupies bit 32) — a uint32 device paste would drop
        # that bit; this rare shape pastes on host at full width
        prob_u64 = []
        for n, v in list(results_prob.items()):
            if v.array.dtype == jnp.uint64:
                full = np.zeros(img.spatial_shape, np.uint64)
                ix, iy, iz = (int(c) for c in crop_box_index)
                az, ay, ax = v.array.shape
                full[iz:iz + az, iy:iy + ay, ix:ix + ax] = np.asarray(v.array)
                results_prob[n] = img.with_array(full)
                prob_u64.append(n)
        if prob_f32:
            f32_stack = paste_stack(
                jnp.stack([results_prob[n].array.astype(jnp.float32)
                           for n in prob_f32]),
                img.spatial_shape, crop_box_index, dtype=jnp.float32,
            )
            for k, n in enumerate(prob_f32):
                results_prob[n] = img.with_array(f32_stack[k])
        if prob_enc:
            enc_stack = paste_stack(
                jnp.stack([results_prob[n].array.astype(jnp.uint32)
                           for n in prob_enc]),
                img.spatial_shape, crop_box_index, dtype=jnp.uint32,
            )
            for k, n in enumerate(prob_enc):
                results_prob[n] = img.with_array(enc_stack[k])
        # binary prob entries (the guide structure mirrors its binary result)
        for n in list(results_prob.keys()):
            if n not in prob_f32 and n not in prob_enc and n not in prob_u64:
                results_prob[n] = results[n] if n in results else results_prob[n]

    if timer:
        timer.lap("geometric_and_postprocessing")
        timer.report()
        # expose per-stage seconds for bench.py-style reporting
        import sys

        sys.modules[__name__].LAST_STAGE_TIMES = dict(timer.times)
        if dtimer:
            sys.modules[__name__].LAST_STAGE_DETAIL = {
                k: v for k, v in dtimer.times.items() if not k.startswith("_")
            }

    logger.info("Done!")
    return results, results_prob
