"""Multi-atlas segmentation pipeline — drop-in mirror of
platipy/imaging/projects/multiatlas/run.py (reference lines 47-441), rebuilt
atlas-parallel.

Pipeline stages (reference semantics preserved):
  1. auto-crop the target via <=8 quick similarity registrations (:203-248)
  2. per-atlas linear registration + label propagation (:255-300)
  3. per-atlas demons DIR (:306-347) — here BATCHED: atlases stacked on a
     leading axis, one jit-compiled multiscale demons over all of them,
     sharded over the device mesh's 'atlas' axis when multiple chips exist
  4. weight maps + label fusion (:352-364) — a batched cross-atlas reduction
  5. paste binary/probability results into the original space (:366-404)
  6. post-processing: largest component, closing, overlap correction (:406-437)
"""

from __future__ import annotations

import logging
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from platipy_tpu.core.image import Image
from platipy_tpu.core.interp import INTERP_LINEAR, INTERP_NEAREST
from platipy_tpu.core.morphology import binary_closing_batched
from platipy_tpu.label.fusion import weighted_voting_batched
from platipy_tpu.label.utils import correct_volume_overlap
from platipy_tpu.parallel.atlas import (
    atlas_mesh,
    atlas_validity_mask,
    batched_multiscale_demons,
    batched_warp_by_dvf,
    batched_weight_maps,
    pad_atlas_axis,
    shard_over_atlases,
)
from platipy_tpu.registration.linear import (
    apply_transforms_batched,
    linear_registration,
    linear_registration_batched,
)
from platipy_tpu.utils.crop import (
    crop_to_roi,
    label_to_roi,
    pad_roi_to_multiple,
    snap_roi_to_seen_bucket,
)

logger = logging.getLogger(__name__)

ATLAS_PATH = os.environ.get("ATLAS_PATH", "/atlas")

MUTLIATLAS_SETTINGS_DEFAULTS = {
    "atlas_settings": {
        "atlas_id_list": ["03"],
        "atlas_structure_list": ["WHOLEHEART"],
        "atlas_path": ATLAS_PATH,
        "atlas_image_format": "Case_{0}/Images/Case_{0}_CROP.nii.gz",
        "atlas_label_format": "Case_{0}/Structures/Case_{0}_{1}_CROP.nii.gz",
        "crop_atlas_to_structures": False,
        "crop_atlas_expansion_mm": (20, 20, 40),
    },
    "auto_crop_target_image_settings": {
        "expansion_mm": [20, 20, 40],
    },
    "linear_registration_settings": {
        "reg_method": "affine",
        "shrink_factors": [16, 8, 4],
        "smooth_sigmas": [0, 0, 0],
        "sampling_rate": 0.75,
        "default_value": None,
        "number_of_iterations": 50,
        "metric": "mean_squares",
        "optimiser": "gradient_descent_line_search",
        "verbose": False,
        # TPU extension: stop a level once every atlas's relative metric
        # improvement stays < 1e-6 for this many iterations (ITK v4-style
        # convergence; number_of_iterations remains the hard cap)
        "convergence_window": 5,
    },
    "deformable_registration_settings": {
        "isotropic_resample": True,
        "resolution_staging": [6, 3, 1.5],
        "iteration_staging": [150, 125, 100],
        "smoothing_sigmas": [0, 0, 0],
        "ncores": 8,
        "default_value": None,
        "verbose": False,
        # TPU extension: ITK PDE-framework per-level convergence — stop a
        # demons level once every atlas's RMS field change per iteration
        # drops below this (mm).  The reference's ITK filter inherits this
        # stop with default 0.99 mm; None keeps exact fixed trip counts.
        "maximum_rms_error": None,
    },
    "label_fusion_settings": {
        "vote_type": "unweighted",
        "vote_params": None,
        "optimal_threshold": {},
    },
    "postprocessing_settings": {
        "run_postprocessing": True,
        "binaryfillhole_mm": 3,
        "structures_for_binaryfillhole": [],
        "structures_for_overlap_correction": [],
    },
    # optional per-stage checkpointing (the reference restarts failed runs
    # from scratch): set to a directory path to persist/resume crop box and
    # DVF-stack stages
    "checkpoint_directory": None,
}

# keep the reference's misspelled name as the canonical one (API parity);
# provide the corrected alias as well
MULTIATLAS_SETTINGS_DEFAULTS = MUTLIATLAS_SETTINGS_DEFAULTS


def _load_atlas_set(settings) -> Dict:
    """Read atlas images/structures from disk or from an in-memory dict."""
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


from platipy_tpu.parallel.atlas import combine_for_crop as _combine_for_crop


# --- batched stage programs (one dispatch for all structures) ---------------
# Over a remote-device link each dispatch/sync costs tens of ms; the
# per-structure loops of reference run.py:352-437 pay that 3-4x per structure.
# These module-level jitted programs process the whole structure stack at once
# and persist in the compile cache across cases.

import functools as _functools

from platipy_tpu.core import filters as _filters


@_functools.partial(jax.jit, static_argnames=("kernel_key",))
def _fuse_structures_stack(weight_stack, struct_stack, kernel_key):
    """Vote + smooth + rescale + floor for every structure in one program.

    ``weight_stack``: [N,z,y,x]; ``struct_stack``: [S,N,z,y,x] ->
    [S,z,y,x] probability maps (reference fusion semantics, run.py:352-364).
    """
    kernels = [np.asarray(k) for k in kernel_key]

    def one(sstack):
        combined = weighted_voting_batched(weight_stack, sstack)
        sm = _filters.convolve_separable(combined, kernels)
        lo, hi = jnp.min(sm), jnp.max(sm)
        arr = (sm - lo) / jnp.maximum(hi - lo, 1e-12)
        return jnp.where(arr >= 1e-4, arr, 0.0).astype(jnp.float32)

    return jax.vmap(one)(struct_stack)


def run_segmentation(img: Image, settings=MUTLIATLAS_SETTINGS_DEFAULTS):
    """Run the atlas-based segmentation algorithm (reference run.py:106-441).

    Returns (results, results_prob): dicts of binary / probability Images.
    """
    results = {}
    results_prob = {}

    # opt-in stage profiling (PLATIPY_TPU_PROFILE=1): each lap fetches a
    # scalar to force pending device work, so it removes the cross-stage
    # dispatch overlap — use for attribution, not for headline timing
    import os as _os

    timer = None
    if _os.environ.get("PLATIPY_TPU_PROFILE") == "1":
        from platipy_tpu.utils.profiling import StageTimer

        timer = StageTimer()

    atlas_settings = settings["atlas_settings"]
    atlas_structure_list = atlas_settings["atlas_structure_list"]
    crop_atlas_to_structures = atlas_settings["crop_atlas_to_structures"]
    crop_atlas_expansion_mm = atlas_settings["crop_atlas_expansion_mm"]

    atlas_set = _load_atlas_set(settings)
    if timer:
        timer.lap("load_atlas")
    atlas_id_list = list(atlas_set.keys())

    if crop_atlas_to_structures:
        for atlas_id in atlas_id_list:
            case = atlas_set[atlas_id]["Original"]
            crop_box_size, crop_box_index = label_to_roi(
                [case[s] for s in atlas_structure_list],
                expansion_mm=crop_atlas_expansion_mm,
            )
            case["CT Image"] = crop_to_roi(case["CT Image"], crop_box_size, crop_box_index)
            for struct in atlas_structure_list:
                case[struct] = crop_to_roi(case[struct], crop_box_size, crop_box_index)

    # --- step 1: auto-crop the target (reference :203-248) -------------------
    expansion_mm = settings["auto_crop_target_image_settings"]["expansion_mm"]

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

    from platipy_tpu.utils.checkpoint import StageCheckpoint

    ckpt = StageCheckpoint(settings.get("checkpoint_directory"))

    reg_box = None  # (size, index) of the tight linear-metric box, if any
    if ckpt.has("cropbox"):
        meta = ckpt.meta("cropbox")
        crop_box_size = [int(v) for v in meta["size"]]
        crop_box_index = [int(v) for v in meta["index"]]
        logger.info("Resumed crop box from checkpoint.")
        if ckpt.has("regbox") and settings["linear_registration_settings"].get(
            "metric_box", "crop"
        ) == "atlas_extent":
            meta = ckpt.meta("regbox")
            reg_box = ([int(v) for v in meta["size"]],
                       [int(v) for v in meta["index"]])
    else:
        logger.info("Running initial similarity transform to crop image volume")
        crop_ids = atlas_id_list[: min(8, len(atlas_id_list))]
        crop_movings = [atlas_set[i]["Original"]["CT Image"] for i in crop_ids]
        registered_crop_stack, _ = linear_registration_batched(
            img, crop_movings, as_stack=True,
            **{k: v for k, v in quick_reg_settings.items() if k != "verbose"},
        )
        # combine on device in ONE dispatch: N full-volume fetches over a
        # remote-device link cost ~0.3s each and N eager adds pay per-op
        # dispatch latency; the union mask crosses host once in label_to_roi
        combined_image = img.with_array(_combine_for_crop(registered_crop_stack))

        crop_box_size, crop_box_index = label_to_roi(
            combined_image, expansion_mm=expansion_mm
        )
        # bucket the crop shape so compiled programs are reused across cases
        crop_box_size, crop_box_index = pad_roi_to_multiple(
            crop_box_size, crop_box_index, img.size, 32
        )
        # ...and snap to a bucket this process has already compiled for, if
        # one fits: per-case boxes straddle bucket steps as they track the
        # anatomy, and each fresh size recompiles the whole pipeline
        crop_box_size, crop_box_index = snap_roi_to_seen_bucket(
            crop_box_size, crop_box_index, img.size
        )
        ckpt.save("cropbox", meta={"size": list(crop_box_size),
                                   "index": list(crop_box_index)})

        # TPU extension (default off = reference parity; see the cardiac
        # pipeline for rationale/measurements): sample the affine metric
        # only on the tight box where the quick-registered atlases carry
        # data — the crop's 20-40 mm margins are target-only anatomy whose
        # valid-point-excluded mean metric rewards scale distortions on
        # full-FOV targets
        if settings["linear_registration_settings"].get(
            "metric_box", "crop"
        ) == "atlas_extent":
            # engage only on genuinely full-FOV inputs where the auto-crop
            # actually cropped (see the cardiac pipeline: on tight targets
            # the second registration call costs ~2 s warm for no DSC
            # change; tight targets' margins are air and cannot be gamed)
            dilution = (max(float(np.prod(np.asarray(crop_box_size))), 1.0)
                        / float(np.prod(np.asarray(img.size))))
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
            substantial = all(
                r >= 0.5 * c for r, c in zip(reg_size, crop_box_size)
            )
            if (dilution < 0.5 and substantial
                    and tuple(reg_size) != tuple(crop_box_size)):
                reg_box = (reg_size, reg_index)
                ckpt.save("regbox", meta={"size": list(reg_size),
                                          "index": list(reg_index)})
    linear_target = (crop_to_roi(img, reg_box[0], reg_box[1])
                     if reg_box is not None else None)
    img_crop = crop_to_roi(img, crop_box_size, crop_box_index)
    logger.info("Calculated crop box: %s %s", crop_box_index, crop_box_size)
    if timer:
        timer.lap("auto_crop", sync=img_crop)

    # --- steps 2-3 with optional checkpoint/resume --------------------------
    from platipy_tpu.parallel.atlas import pack_binary_masks, unpack_binary_masks

    n_structs = len(atlas_structure_list)
    rir = None
    if ckpt.has("rir"):
        rir = ckpt.load("rir")
        # the packed volume is anonymous bit patterns: resuming under a
        # changed/reordered structure list would silently decode bits to the
        # wrong structures (and the validity bit as an extra structure's
        # near-full-volume mask) — validate and re-register on mismatch
        ckpt_structs = rir.get("__meta__", {}).get("structures")
        if "packed_structs" in rir and ckpt_structs != list(atlas_structure_list):
            logger.warning(
                "rir checkpoint was written for structures %s but this run uses "
                "%s; ignoring the checkpoint and re-running registration",
                ckpt_structs, list(atlas_structure_list),
            )
            rir = None
    if rir is not None:
        logger.info("Resumed rigid/affine-registered atlas stacks from checkpoint.")
        moving_stack = jnp.asarray(rir["moving_stack"])
        if "packed_structs" in rir:
            packed_structs = jnp.asarray(rir["packed_structs"])
        else:
            # older checkpoints carry per-structure stacks: re-pack on device
            # (their OOB information is lost, so the validity bit is set
            # everywhere — demons gating degrades to the ungated behaviour)
            packed_structs = sum(
                (jnp.asarray(rir[f"struct__{s}"]) > 0).astype(jnp.float32)
                * np.float32(2.0**k)
                for k, s in enumerate(atlas_structure_list)
            ) + np.float32(2.0**n_structs)
    else:
        # --- step 2: linear registration per atlas (reference :255-300) ----------
        linear_registration_settings = settings["linear_registration_settings"]
        logger.info(
            "Running %s transform to align atlas images",
            linear_registration_settings["reg_method"],
        )

        reg_movings = [atlas_set[i]["Original"]["CT Image"] for i in atlas_id_list]
        lin_kwargs = {k: v for k, v in linear_registration_settings.items()
                      if k not in ("verbose", "metric_box", "metric_box_expansion_mm")}
        if linear_target is not None:
            # tight-metric-box extension: optimise on the atlas-data box,
            # warp onto the pipeline crop grid (physical-space transforms
            # compose exactly across the grids)
            _, _, stacked_tfm = linear_registration_batched(
                linear_target, reg_movings, as_stack=True,
                return_stacked_transform=True, **lin_kwargs,
            )
            dv = lin_kwargs.get("default_value")
            if dv is None:
                # the serial path's CT auto-detect (linear.py); scalar
                # device fetch, not a full-volume pull
                dv = -1000 if float(
                    jnp.min(jnp.asarray(reg_movings[0].array))
                ) <= -1000 else 0
            moving_stack = apply_transforms_batched(
                stacked_tfm, reg_movings, img_crop,
                interpolator=lin_kwargs.get("final_interp", INTERP_LINEAR),
                default_value=dv, as_stack=True,
            )
        else:
            moving_stack, _, stacked_tfm = linear_registration_batched(
                img_crop, reg_movings, as_stack=True,
                return_stacked_transform=True, **lin_kwargs,
            )
        # ALL structure warps as ONE bit-packed volume per atlas — NN
        # sampling selects whole source voxels, so warping the packed volume
        # is bitwise-identical to the reference's per-structure sitk.Resample
        # loop (run.py:291-299) at ~1/S the gather traffic, and the demons
        # warp below moves the same single packed stack
        # the everywhere-1 highest bit NN-warps to the linear transform's
        # in-bounds mask — free OOB detection for the demons gating below
        pack_inputs = [
            atlas_set[i]["Original"]["CT Image"].with_array(
                pack_binary_masks(
                    [atlas_set[i]["Original"][s].array
                     for s in atlas_structure_list],
                    append_validity=True,
                )
            )
            for i in atlas_id_list
        ]
        packed_structs = apply_transforms_batched(
            stacked_tfm, pack_inputs, img_crop,
            interpolator=INTERP_NEAREST, default_value=0, as_stack=True,
        )
        del pack_inputs
        for atlas_id in atlas_id_list:
            atlas_set[atlas_id]["Original"] = None

        if ckpt.enabled:
            ckpt.save("rir", arrays={
                "moving_stack": np.asarray(moving_stack),
                "packed_structs": np.asarray(packed_structs),
            }, meta={"structures": list(atlas_structure_list)})

    if timer:
        timer.lap("linear_registration", sync=moving_stack)

    # --- step 3: batched demons DIR (reference :306-347, parallelised) -------
    deformable_settings = settings["deformable_registration_settings"]
    logger.info("Running batched DIR to refine atlas image registration")

    target_arr = img_crop.array.astype(jnp.float32)

    # shard the atlas axis over the mesh, padding to a multiple of the
    # device count (padded lanes are zero-weighted at fusion)
    from platipy_tpu.parallel.atlas import sharding_enabled

    n_dev = len(jax.devices())
    n_valid = moving_stack.shape[0]
    if n_dev > 1 and sharding_enabled():
        mesh = atlas_mesh()
        moving_stack, n_valid = pad_atlas_axis(moving_stack, n_dev)
        moving_stack = shard_over_atlases(moving_stack, mesh)
        packed_structs = shard_over_atlases(
            pad_atlas_axis(packed_structs, n_dev)[0], mesh
        )

    smoothing_sigmas = deformable_settings.get("smoothing_sigmas")
    if not smoothing_sigmas:
        smoothing_sigmas = list(deformable_settings["resolution_staging"])

    if ckpt.has("dvf"):
        logger.info("Resumed DVF stack from checkpoint.")
        dvf_stack = jnp.asarray(ckpt.load("dvf")["dvf_stack"])
        if dvf_stack.shape[0] > moving_stack.shape[0]:
            # checkpoint written under a different device count: drop pad lanes
            dvf_stack = dvf_stack[: moving_stack.shape[0]]
        elif dvf_stack.shape[0] < moving_stack.shape[0]:
            # pad directly to the current stack length (pad_atlas_axis expects
            # a device count, not a target length)
            extra = moving_stack.shape[0] - dvf_stack.shape[0]
            dvf_stack = jnp.concatenate(
                [dvf_stack, jnp.repeat(dvf_stack[-1:], extra, axis=0)]
            )
    else:
        demons_moving = moving_stack
        if deformable_settings.get("oob_inherit_fixed"):
            # TPU extension (see cardiac run.py): out-of-bounds regions of
            # the linearly-registered atlas inherit the FIXED image's
            # intensity, silencing the crop-face boundary forces that
            # otherwise destabilise the field on full-FOV targets
            from platipy_tpu.parallel.atlas import extract_packed_bit

            valid = extract_packed_bit(packed_structs, n_structs)
            demons_moving = jnp.where(valid > 0, moving_stack, target_arr[None])
        dvf_stack = batched_multiscale_demons(
            target_arr,
            demons_moving,
            spacing_xyz=img_crop.spacing,
            resolution_staging=deformable_settings["resolution_staging"],
            iteration_staging=deformable_settings["iteration_staging"],
            smoothing_sigmas=smoothing_sigmas,
            isotropic_resample=deformable_settings["isotropic_resample"],
            regularisation_kernel_mm=deformable_settings.get("regularisation_kernel_mm", 1.5),
            maximum_rms_error=deformable_settings.get("maximum_rms_error"),
            field_dtype=deformable_settings.get("field_dtype"),
        )
        if ckpt.enabled:
            ckpt.save("dvf", arrays={"dvf_stack": np.asarray(dvf_stack)})

    dir_images = batched_warp_by_dvf(
        moving_stack, dvf_stack, img_crop.spacing,
        interp=INTERP_LINEAR, default_value=-1000.0,
    )
    # all structures through the DVFs as ONE packed dispatch + ONE unpack
    packed_dir = batched_warp_by_dvf(
        packed_structs, dvf_stack, img_crop.spacing,
        interp=INTERP_NEAREST, default_value=0.0,
    )
    struct_stack_all = unpack_binary_masks(packed_dir, n_structs)

    # (the reference stores per-atlas "DIR" images back into atlas_set here,
    # run.py:306-347 — this pipeline keeps the stacks; per-atlas device
    # slices would pay a dispatch each and nothing downstream reads them)

    if timer:
        timer.lap("demons_dir", sync=dir_images)

    # --- step 4: weight maps + fusion (reference :352-364) -------------------
    vote_type = settings["label_fusion_settings"]["vote_type"]
    vote_params = settings["label_fusion_settings"]["vote_params"]

    weight_stack = batched_weight_maps(
        target_arr, dir_images, img_crop.spacing,
        vote_type=vote_type, vote_params=vote_params,
    )
    if weight_stack.shape[0] != n_valid:
        # zero the padded atlas lanes out of the fusion reduction
        weight_stack = weight_stack * atlas_validity_mask(
            n_valid, weight_stack.shape[0]
        )[:, None, None, None]

    # smoothing kernels for sitk.DiscreteGaussian(combined, 1.0) parity
    _var_vox = 1.0 / np.asarray(img_crop.spacing) ** 2
    fusion_kernel_key = tuple(
        tuple(float(v) for v in _filters.discrete_gaussian_kernel1d(_var_vox[a], 0.01, 32))
        for a in (2, 1, 0)
    )
    prob_stack = _fuse_structures_stack(weight_stack, struct_stack_all,
                                        fusion_kernel_key)
    combined_label_dict = {
        s: img_crop.with_array(prob_stack[k])
        for k, s in enumerate(atlas_structure_list)
    }

    if timer:
        timer.lap("fusion", sync=combined_label_dict[atlas_structure_list[-1]])

    # --- step 5: paste into original space (reference :366-404) --------------
    logger.info("Generating binary segmentations.")

    from platipy_tpu.label.fusion import process_probability_stack
    from platipy_tpu.utils.crop import paste_stack

    thresholds = [
        settings["label_fusion_settings"]["optimal_threshold"].get(s, 0.5)
        for s in atlas_structure_list
    ]
    # whole structure stack crosses the device link once each way
    proc = process_probability_stack(prob_stack, thresholds)
    bin_full = paste_stack(proc, img.spatial_shape, crop_box_index,
                           dtype=jnp.uint8)
    prob_full = paste_stack(prob_stack, img.spatial_shape, crop_box_index,
                            dtype=jnp.float32)

    for k, structure_name in enumerate(atlas_structure_list):
        results[structure_name] = img.with_array(bin_full[k])
        results_prob[structure_name] = img.with_array(prob_full[k])

    if timer:
        timer.lap("paste_threshold", sync=results[atlas_structure_list[-1]])

    # --- step 6: post-processing (reference :406-437) ------------------------
    postprocessing_settings = settings["postprocessing_settings"]
    if postprocessing_settings["run_postprocessing"]:
        logger.info("Running post-processing.")
        binaryfillhole_img = tuple(
            int(postprocessing_settings["binaryfillhole_mm"] / sp) for sp in img.spacing
        )

        # step 5's masks are single-component by construction (fill-holes +
        # keep-largest ran before the paste, which adds nothing), so the
        # reference's keep-largest here (run.py:424-431) is an identity —
        # only the closing remains, batched over structures in one program
        fillhole_structs = [
            s for s in postprocessing_settings["structures_for_binaryfillhole"]
            if s in results
        ]
        if fillhole_structs:
            closed = binary_closing_batched(
                jnp.stack([results[s].array for s in fillhole_structs]),
                binaryfillhole_img,
            )
            for k, s in enumerate(fillhole_structs):
                results[s] = results[s].with_array(closed[k].astype(jnp.uint8))

        if len(postprocessing_settings["structures_for_overlap_correction"]) >= 2:
            input_overlap = {
                s: results[s]
                for s in postprocessing_settings["structures_for_overlap_correction"]
            }
            output_overlap = correct_volume_overlap(input_overlap)
            for s in postprocessing_settings["structures_for_overlap_correction"]:
                results[s] = output_overlap[s]

    if timer:
        timer.lap("postprocessing", sync=results[atlas_structure_list[-1]])
        timer.report()
        # expose the per-stage seconds so callers (bench.py) can record them
        import sys

        sys.modules[__name__].LAST_STAGE_TIMES = dict(timer.times)

    logger.info("Done!")
    return results, results_prob
