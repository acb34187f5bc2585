"""Offline vessel-accuracy + IAR-cost experiments on stashed pipeline state.

Runs the bench's crop-grid cases ONCE each through the real pipeline with
PLATIPY_TPU_DEBUG_ATLAS_SET=1, then replays IAR and vessel splining variants
offline against the stashed post-DIR atlas sets:

  * IAR wall time, standalone (the 8.38 s stage from BENCH_r03)
  * vessel DSC for: pruned-set median (bench baseline), all-10 atlases,
    smoothing sweep, area-weighted fused-probability COMs

Scores every variant against the exact tube ground truth.  Diagnostics only.
"""

import logging
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


def tube_dsc(pred_mask_img, gt_full, crop_index_xyz, full_shape):
    pred = np.zeros(full_shape, np.uint8)
    arr = np.asarray(pred_mask_img.array)
    ix, iy, iz = (int(v) for v in crop_index_xyz)
    pred[iz:iz + arr.shape[0], iy:iy + arr.shape[1], ix:ix + arr.shape[2]] = arr
    gt = np.asarray(gt_full.array)
    inter = float((pred & (gt > 0)).sum())
    return 2 * inter / max(float(pred.sum() + (gt > 0).sum()), 1.0)


def centreline_rmse(pred_mask_img, gt_full, crop_index_xyz, full_shape, spacing):
    """Mean |slice-COM error| in mm over slices where both have mass."""
    pred = np.zeros(full_shape, np.uint8)
    arr = np.asarray(pred_mask_img.array)
    ix, iy, iz = (int(v) for v in crop_index_xyz)
    pred[iz:iz + arr.shape[0], iy:iy + arr.shape[1], ix:ix + arr.shape[2]] = arr
    gt = np.asarray(gt_full.array) > 0
    errs = []
    for z in range(full_shape[0]):
        if pred[z].any() and gt[z].any():
            cp = np.array(np.nonzero(pred[z])).mean(axis=1)
            cg = np.array(np.nonzero(gt[z])).mean(axis=1)
            errs.append(np.hypot((cp[0] - cg[0]) * spacing[1],
                                 (cp[1] - cg[1]) * spacing[0]))
    return float(np.mean(errs)) if errs else float("nan")


def main():
    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cache_dir = os.path.join(repo, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    logging.basicConfig(level=logging.WARNING)

    rng = np.random.RandomState(7)
    ct0, masks0, fields0 = bench.build_phantom()
    atlas_set = {}
    for i in range(10):
        ct_i, masks_i = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        dz, dy, dx = rng.randint(0, 5, size=3)
        crop = ((dz, bench.SHAPE[0] - rng.randint(0, 5)),
                (dy, bench.SHAPE[1] - rng.randint(0, 5)),
                (dx, bench.SHAPE[2] - rng.randint(0, 5)))
        img, m = bench.to_images(ct_i, masks_i, crop=crop)
        atlas_set[f"{i:02d}"] = {"CT Image": img, **m}
    settings = bench.make_settings(atlas_set)

    cases = []
    for _ in range(4):
        ct_t, masks_t = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        cases.append(bench.to_images(ct_t, masks_t))

    os.environ["PLATIPY_TPU_DEBUG_ATLAS_SET"] = "1"
    from platipy_tpu.projects.cardiac import run as card_run
    from platipy_tpu.label.iar import run_iar
    from platipy_tpu.utils.vessel import vessel_spline_generation

    spacing = bench.SPACING
    for ci, (img_t, masks_t) in enumerate(cases):
        t0 = time.time()
        results, dt = bench.run_case(img_t, settings)
        pre_iar = card_run.LAST_ATLAS_SET_PRE_IAR
        img_crop = card_run.LAST_IMG_CROP
        crop_size, crop_index = card_run.LAST_CROP_BOX
        pruned_ids = list(card_run.LAST_ATLAS_SET.keys())
        gt_v = masks_t["VESSEL"]
        m = bench.surface_metrics(gt_v, results["VESSEL"])
        print(f"\n=== case {ci}: pipeline {dt:.1f}s  VESSEL {m}  "
              f"pruned={sorted(pruned_ids)}", flush=True)

        # --- IAR standalone timing -------------------------------------
        t0 = time.time()
        import cProfile, pstats, io
        prof = cProfile.Profile()
        prof.enable()
        kept = run_iar(atlas_set={i: dict(pre_iar[i]) for i in pre_iar},
                       **settings["iar_settings"])
        prof.disable()
        iar_s = time.time() - t0
        print(f"[iar] standalone: {iar_s:.2f}s  kept={sorted(kept.keys())}")
        s = io.StringIO()
        pstats.Stats(prof, stream=s).sort_stats("cumulative").print_stats(14)
        print("\n".join(s.getvalue().splitlines()[4:22]))

        # --- vessel variants --------------------------------------------
        vset = dict(settings["vessel_spline_settings"])
        base_kw = {k: vset[k] for k in (
            "vessel_name_list", "vessel_radius_mm_dict",
            "stop_condition_type_dict", "stop_condition_value_dict",
            "scan_direction_dict")}

        def run_variant(tag, ids, **kw):
            sub = {i: pre_iar[i] for i in ids}
            t0 = time.time()
            out = vessel_spline_generation(img_crop, sub, **base_kw, **kw)
            v = out["VESSEL"]
            dsc = tube_dsc(v, gt_v, crop_index, bench.SHAPE)
            cerr = centreline_rmse(v, gt_v, crop_index, bench.SHAPE, spacing)
            print(f"[vessel] {tag:34s} dsc={dsc:.4f} com_err={cerr:.3f}mm "
                  f"({time.time()-t0:.2f}s)")
            return dsc

        all_ids = list(pre_iar.keys())
        run_variant("pruned median s=1.0 (bench)", pruned_ids,
                    com_combine="median", spline_smoothing=1.0)
        run_variant("all10 median s=1.0", all_ids,
                    com_combine="median", spline_smoothing=1.0)
        run_variant("all10 mean s=1.0", all_ids,
                    com_combine="mean", spline_smoothing=1.0)
        run_variant("all10 median s=0.0", all_ids,
                    com_combine="median", spline_smoothing=0.0)
        run_variant("all10 median s=2.0", all_ids,
                    com_combine="median", spline_smoothing=2.0)
        run_variant("all10 median s=4.0", all_ids,
                    com_combine="median", spline_smoothing=4.0)
        run_variant("pruned mean s=1.0", pruned_ids,
                    com_combine="mean", spline_smoothing=1.0)

        # oracle: spline through the TRUE centreline COMs (registration-free
        # ceiling of the tube rasterisation + spline machinery)
        from platipy_tpu.utils.vessel import spline_centreline, tube_mask_from_points
        gt_np = np.asarray(gt_v.array)
        pts = []
        ox, oy, oz = img_crop.origin
        for z in range(bench.SHAPE[0]):
            if gt_np[z].any():
                c = np.array(np.nonzero(gt_np[z])).mean(axis=1)
                pts.append((c[1] * spacing[0], c[0] * spacing[1], z * spacing[2]))
        ctl = spline_centreline(np.asarray(pts), smoothing=0.0)
        # shift into crop-origin space
        ctl_crop = ctl - np.array([ox, oy, oz])[None, :] * 0 + 0  # physical pts
        v_or = tube_mask_from_points(ctl, 5.0, bench.to_images(
            np.zeros(bench.SHAPE, np.float32), {})[0])
        dsc_or = tube_dsc(v_or, gt_v, (0, 0, 0), bench.SHAPE)
        print(f"[vessel] oracle true-COM spline         dsc={dsc_or:.4f}")

        if ci >= 2:
            break


if __name__ == "__main__":
    main()
