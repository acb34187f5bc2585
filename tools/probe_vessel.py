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


def refine_centreline_intensity(img_crop, pts_mm, radius_mm, spacing,
                                search_mm=4.0):
    """Matched-filter refinement prototype: slide a soft disk template over
    the target CT slice around each predicted COM, take the NCC peak with
    quadratic sub-voxel interpolation.  Host numpy — evaluation only."""
    ct = np.asarray(img_crop.array).astype(np.float64)
    ox, oy, oz = (float(v) for v in img_crop.origin)
    sx, sy, sz = spacing
    ry = int(np.ceil((radius_mm + 2.0) / sy))
    rx = int(np.ceil((radius_mm + 2.0) / sx))
    ys, xs = np.mgrid[-ry:ry + 1, -rx:rx + 1]
    d = np.sqrt((ys * sy) ** 2 + (xs * sx) ** 2)
    tmpl = 1.0 / (1.0 + np.exp((d - radius_mm) / 0.5))
    tmpl -= tmpl.mean()
    tn = np.linalg.norm(tmpl) + 1e-9
    nyo = int(np.ceil(search_mm / sy))
    nxo = int(np.ceil(search_mm / sx))

    def subpix(c, i):
        if 0 < i < c.shape[0] - 1 and np.all(np.isfinite(c[i - 1:i + 2])):
            den = c[i - 1] - 2 * c[i] + c[i + 1]
            if den != 0:
                return i + 0.5 * (c[i - 1] - c[i + 1]) / den
        return float(i)

    out = []
    for (px, py, pz) in np.asarray(pts_mm, np.float64):
        z = int(round((pz - oz) / sz))
        if z < 0 or z >= ct.shape[0]:
            continue
        cyi = int(round((py - oy) / sy))
        cxi = int(round((px - ox) / sx))
        corr = np.full((2 * nyo + 1, 2 * nxo + 1), -np.inf)
        for dy in range(-nyo, nyo + 1):
            for dx in range(-nxo, nxo + 1):
                y0 = cyi + dy - ry
                x0 = cxi + dx - rx
                win = ct[z, y0:y0 + 2 * ry + 1, x0:x0 + 2 * rx + 1]
                if win.shape != tmpl.shape:
                    continue
                w = win - win.mean()
                corr[dy + nyo, dx + nxo] = (w * tmpl).sum() / (
                    np.linalg.norm(w) * tn + 1e-9)
        if not np.isfinite(corr).any():
            out.append((px, py, pz))
            continue
        iy, ix = np.unravel_index(np.nanargmax(corr), corr.shape)
        fy = subpix(corr[:, ix], iy) - nyo
        fx = subpix(corr[iy, :], ix) - nxo
        out.append((ox + (cxi + fx) * sx, oy + (cyi + fy) * sy, pz))
    return np.asarray(out)


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
        run_variant("all10 median s=0.0", all_ids,
                    com_combine="median", spline_smoothing=0.0)
        run_variant("all10 median s=0.1", all_ids,
                    com_combine="median", spline_smoothing=0.1)
        run_variant("all10 median s=0.25", all_ids,
                    com_combine="median", spline_smoothing=0.25)
        run_variant("pruned median s=0.1", pruned_ids,
                    com_combine="median", spline_smoothing=0.1)

        # --- intensity matched-filter refinement prototype ----------------
        from platipy_tpu.utils.vessel import (
            com_from_image_list,
            spline_centreline,
            tube_mask_from_points,
        )

        image_list = [pre_iar[i]["DIR"]["VESSEL"] for i in all_ids]
        pts0 = com_from_image_list(
            image_list, condition_type="count", condition_value=2,
            scan_direction="z", combine="median",
        )
        for n_iter in (1, 2):
            pts = np.asarray(pts0, np.float64)
            for _ in range(n_iter):
                pts = refine_centreline_intensity(
                    img_crop, pts, radius_mm=5.0, spacing=spacing)
            for s_sm in (0.0, 0.1):
                ctl = spline_centreline(pts, smoothing=s_sm)
                v = tube_mask_from_points(ctl, 5.0, image_list[0])
                dsc = tube_dsc(v, gt_v, crop_index, bench.SHAPE)
                cerr = centreline_rmse(v, gt_v, crop_index, bench.SHAPE, spacing)
                print(f"[vessel] refine x{n_iter} s={s_sm:<4} "
                      f"               dsc={dsc:.4f} com_err={cerr:.3f}mm")

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
