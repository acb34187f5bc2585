"""Offline vessel-splining variant probe: run the full-FOV pipeline ONCE
(tightreg_oob config) to stash the post-DIR atlas set, then sweep splining
options (end trimming, mass weighting powers, tube clipping, end
extrapolation) against the truth tube without re-running registration."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PLATIPY_TPU_DEBUG_ATLAS_SET"] = "1"

import numpy as np

import bench


def tube_dsc(tube_crop, gt_full, cb_index):
    x0, y0, z0 = (int(v) for v in cb_index)
    az, ay, ax = tube_crop.shape
    full = np.zeros(gt_full.shape, bool)
    full[z0:z0 + az, y0:y0 + ay, x0:x0 + ax] = tube_crop > 0
    inter = (full & gt_full).sum()
    return 2 * inter / max(full.sum() + gt_full.sum(), 1)


STASH = "/tmp/r5_spline_stash.npz"


def main():
    import jax

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from platipy_tpu.core.image import from_array
    from platipy_tpu.utils import vessel as V

    from platipy_tpu.projects.cardiac import run as card_run

    import copy as _copy

    if os.path.exists(STASH) and "fresh" not in sys.argv[1:]:
        z = np.load(STASH)
        gt_full = z["gt_full"] > 0
        cb_index = z["cb_index"]
        img_crop = from_array(z["crop_ct"], origin=tuple(z["crop_origin"]),
                              spacing=tuple(z["crop_spacing"]))
        prob = img_crop.with_array(z["prob"])
        settings = bench.make_settings({})
        vss = settings["vessel_spline_settings"]
        print("loaded stash", flush=True)
    else:
        rng = np.random.RandomState(7)
        ct0, masks0, fields0 = bench.build_phantom()
        atlas_set = {}
        for i in range(10):
            ct_i, masks_i = bench.deform_case(
                ct0, fields0, rng, shift_vox=rng.randint(-3, 4, size=3))
            ct_i, masks_i = bench.add_atlas_context(ct_i, masks_i)
            ct_i, masks_i, origin = bench.crop_atlas_to_structures(ct_i, masks_i)
            img, m = bench.to_images(ct_i, masks_i, origin_shift=origin)
            atlas_set[f"{i:02d}"] = {"CT Image": img, **m}
        settings = bench.make_settings(atlas_set)
        settings["deformable_registration_settings"]["oob_inherit_fixed"] = True
        settings["linear_registration_settings"]["metric_box"] = "atlas_extent"

        cases = []
        for _ in range(4):
            ct_t, masks_t = bench.deform_case(
                ct0, fields0, rng, shift_vox=rng.randint(-3, 4, size=3))
            cases.append((ct_t, masks_t))
        ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
        img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)
        gt_full = np.asarray(masks_full["VESSEL"].array) > 0

        res, dt = bench.run_case(img_full, settings)
        base = bench.surface_metrics(masks_full["VESSEL"], res["VESSEL"])
        print(f"pipeline ({dt:.1f}s) VESSEL baseline: {base}", flush=True)

        # pipeline splines with use_all_registered_atlases=True — evaluate
        # variants on the same FULL registered set, not the IAR-pruned view
        aset = card_run.LAST_ATLAS_SET_PRE_IAR
        img_crop = card_run.LAST_IMG_CROP
        cb_size, cb_index = card_run.LAST_CROP_BOX
        vss = settings["vessel_spline_settings"]

        prob = V.fused_vessel_probability(img_crop, aset, "VESSEL",
                                          vote_params=vss["vote_params"])
        np.savez_compressed(
            STASH, gt_full=gt_full.astype(np.uint8),
            cb_index=np.asarray(cb_index),
            crop_ct=np.asarray(img_crop.array),
            crop_origin=np.asarray(img_crop.origin),
            crop_spacing=np.asarray(img_crop.spacing),
            prob=np.asarray(prob.array),
        )

    prob_np = np.asarray(prob.array, np.float32)
    origin = np.asarray(img_crop.origin, np.float64)
    spacing = np.asarray(img_crop.spacing, np.float64)

    def com_chain_np(pthr, min_mass, slice_rel=None, gate_ctr=None,
                     gate_mm=None):
        """Per-slice COM chain from the fused probability, with optional
        slice-relative re-threshold and spline-distance gating."""
        m = prob_np * (prob_np > pthr)
        if slice_rel is not None:
            smax = m.max(axis=(1, 2), keepdims=True)
            m = m * (m >= slice_rel * smax)
        if gate_ctr is not None:
            # zero mass beyond gate_mm of the first-pass centreline (per z)
            zs_mm = origin[2] + spacing[2] * np.arange(m.shape[0])
            cz = gate_ctr[:, 2]
            for k, z_mm in enumerate(zs_mm):
                j = np.argmin(np.abs(cz - z_mm))
                cy = (gate_ctr[j, 1] - origin[1]) / spacing[1]
                cx = (gate_ctr[j, 0] - origin[0]) / spacing[0]
                yy, xx = np.mgrid[:m.shape[1], :m.shape[2]]
                d2 = ((yy - cy) * spacing[1]) ** 2 + ((xx - cx) * spacing[0]) ** 2
                m[k] *= d2 <= gate_mm ** 2
        pts, masses = [], []
        for k in range(m.shape[0]):
            w = m[k].sum()
            if w <= min_mass:
                continue
            cy, cx = (np.mgrid[:m.shape[1], :m.shape[2]] * m[k][None]).sum(
                axis=(1, 2)) / w
            pts.append(origin + spacing * np.array([cx, cy, k], np.float64))
            masses.append(float(w))
        return np.asarray(pts), np.asarray(masses)

    def build(min_mass=1.0, wpow=0.5, smoothing=0.1, clip=False,
              extend=False, trim=0, pthr=None, slice_rel=None, refit_mm=0):
        pthr = pthr if pthr is not None else vss["prob_threshold"]
        pts, masses = com_chain_np(pthr, min_mass, slice_rel=slice_rel)
        if refit_mm:
            w0 = masses ** (2 * wpow)
            ctr0 = np.asarray(V.spline_centreline(
                pts, smoothing=smoothing, weights=w0))
            pts, masses = com_chain_np(pthr, min_mass, slice_rel=slice_rel,
                                       gate_ctr=ctr0, gate_mm=refit_mm)
        lo_z, hi_z = pts[0][2], pts[-1][2]
        if trim:
            pts, masses = pts[trim:-trim], masses[trim:-trim]
        w = masses ** (2 * wpow)  # spline_centreline sqrt()s internally
        ctr = V.spline_centreline(pts, smoothing=smoothing, weights=w)
        if extend:
            # linear end extension along the fitted end tangents, back out
            # to the observed probability extent (lo_z..hi_z).  tangent_k
            # averages the tangent over a window of spline samples (the
            # 2-sample tangent inherits end-sample noise)
            k = min(int(build.tangent_k), len(ctr) - 1)
            d0 = (ctr[0] - ctr[k]) / k
            d1 = (ctr[-1] - ctr[-1 - k]) / k
            def ext(p, d, target_z):
                dz = target_z - p[2]
                if abs(d[2]) < 1e-6:
                    return None
                return p + d * (dz / d[2])
            lo_pt = ext(ctr[0], d0, lo_z)
            hi_pt = ext(ctr[-1], d1, hi_z)
            segs = [ctr]
            if lo_pt is not None:
                segs.insert(0, np.linspace(lo_pt, ctr[0], 8))
            if hi_pt is not None:
                segs.append(np.linspace(ctr[-1], hi_pt, 8))
            ctr = np.concatenate(segs)
        tube = V.tube_mask_from_points(ctr, vss["vessel_radius_mm_dict"]["VESSEL"],
                                       img_crop)
        t = np.asarray(tube.array)
        if clip:
            # clip to the observed chain extent (z index in crop space)
            origin_z = float(img_crop.origin[2]); sp_z = float(img_crop.spacing[2])
            zlo = int(round((lo_z - origin_z) / sp_z))
            zhi = int(round((hi_z - origin_z) / sp_z))
            t = t.copy(); t[:zlo] = 0; t[zhi + 1:] = 0
        return t

    T3 = dict(clip=True, trim=3, extend=True)
    grid_k = [1, 8, 16, 24, 32]
    grid = [
        ("as-pipeline", dict()),
        ("clip+trim3+ext", dict(**T3)),
        ("T3+srel0.4", dict(slice_rel=0.4, **T3)),
        ("T3+srel0.5", dict(slice_rel=0.5, **T3)),
        ("T3+srel0.6", dict(slice_rel=0.6, **T3)),
        ("T3+refit8", dict(refit_mm=8.0, **T3)),
        ("T3+refit6", dict(refit_mm=6.0, **T3)),
        ("T3+refit10", dict(refit_mm=10.0, **T3)),
        ("T3+srel0.5+refit8", dict(slice_rel=0.5, refit_mm=8.0, **T3)),
        ("T3+srel0.4+refit8", dict(slice_rel=0.4, refit_mm=8.0, **T3)),
        ("T3+refit8+trim0", dict(clip=True, trim=0, extend=False, refit_mm=8.0)),
        ("T3+refit8+sm0.2", dict(refit_mm=8.0, smoothing=0.2, **T3)),
    ]
    def profile(t):
        x0, y0, z0 = (int(v) for v in cb_index)
        az, ay, ax = t.shape
        full = np.zeros(gt_full.shape, bool)
        full[z0:z0 + az, y0:y0 + ay, x0:x0 + ax] = t > 0
        errs = []
        for z in range(gt_full.shape[0]):
            g, r = gt_full[z], full[z]
            if g.sum() and r.sum():
                gc = np.argwhere(g).mean(axis=0)
                rc = np.argwhere(r).mean(axis=0)
                errs.append((z, float(np.hypot(*(1.5 * (rc - gc)))),
                             int(g.sum()), int(r.sum())))
        e = np.array([x[1] for x in errs]); nn = len(errs)
        miss_lo = int(gt_full[:errs[0][0]].sum()); miss_hi = int(gt_full[errs[-1][0]+1:].sum())
        fp_lo = int(full[:errs[0][0]].sum()); fp_hi = int(full[errs[-1][0]+1:].sum())
        return (f"mean {e.mean():.2f} first6 {e[:6].mean():.2f} "
                f"mid {e[nn//3:2*nn//3].mean():.2f} last6 {e[-6:].mean():.2f} "
                f"missTP lo/hi {miss_lo}/{miss_hi} FP lo/hi {fp_lo}/{fp_hi}")

    for tk in grid_k:
        build.tangent_k = tk
        t = build(**T3)
        print(f"T3+tangent_k{tk:<3d}             DSC "
              f"{tube_dsc(t, gt_full, cb_index):.4f}  {profile(t)}",
              flush=True)


if __name__ == "__main__":
    main()
