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


def main():
    import jax

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from platipy_tpu.projects.cardiac import run as card_run
    from platipy_tpu.utils import vessel as V

    rng = np.random.RandomState(7)
    ct0, masks0, fields0 = bench.build_phantom()
    atlas_set = {}
    for i in range(10):
        ct_i, masks_i = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        ct_i, masks_i = bench.add_atlas_context(ct_i, masks_i)
        ct_i, masks_i, origin = bench.crop_atlas_to_structures(ct_i, masks_i)
        img, m = bench.to_images(ct_i, masks_i, origin_shift=origin)
        atlas_set[f"{i:02d}"] = {"CT Image": img, **m}
    settings = bench.make_settings(atlas_set)
    settings["deformable_registration_settings"]["oob_inherit_fixed"] = True
    settings["linear_registration_settings"]["metric_box"] = "atlas_extent"

    cases = []
    for _ in range(4):
        ct_t, masks_t = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        cases.append((ct_t, masks_t))
    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)
    gt_full = np.asarray(masks_full["VESSEL"].array) > 0

    res, dt = bench.run_case(img_full, settings)
    base = bench.surface_metrics(masks_full["VESSEL"], res["VESSEL"])
    print(f"pipeline ({dt:.1f}s) VESSEL baseline: {base}", flush=True)

    # the pipeline splines with use_all_registered_atlases=True — evaluate
    # variants on the same FULL registered set, not the IAR-pruned view
    aset = card_run.LAST_ATLAS_SET_PRE_IAR
    img_crop = card_run.LAST_IMG_CROP
    cb_size, cb_index = card_run.LAST_CROP_BOX
    vss = settings["vessel_spline_settings"]

    prob = V.fused_vessel_probability(img_crop, aset, "VESSEL",
                                      vote_params=vss["vote_params"])

    def build(min_mass=1.0, wpow=0.5, smoothing=0.1, clip=False,
              extend=False, trim=0):
        pts, masses = V.com_from_probability(
            prob, scan_direction="z", prob_threshold=vss["prob_threshold"],
            min_mass=min_mass, return_masses=True)
        pts = np.asarray(pts); masses = np.asarray(masses, float)
        lo_z, hi_z = pts[0][2], pts[-1][2]
        if trim:
            pts, masses = pts[trim:-trim], masses[trim:-trim]
        w = masses ** (2 * wpow)  # spline_centreline sqrt()s internally
        ctr = V.spline_centreline(pts, smoothing=smoothing, weights=w)
        if extend:
            # linear end extension along the fitted end tangents, back out
            # to the observed probability extent (lo_z..hi_z)
            d0 = ctr[0] - ctr[1]
            d1 = ctr[-1] - ctr[-2]
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

    grid = [
        ("as-pipeline", dict()),
        ("clip", dict(clip=True)),
        ("clip+mm3", dict(clip=True, min_mass=3)),
        ("clip+mm5", dict(clip=True, min_mass=5)),
        ("clip+wpow1", dict(clip=True, wpow=1.0)),
        ("clip+wpow1.5", dict(clip=True, wpow=1.5)),
        ("clip+sm0.3", dict(clip=True, smoothing=0.3)),
        ("clip+sm0.5+wpow1", dict(clip=True, smoothing=0.5, wpow=1.0)),
        ("clip+trim3+ext", dict(clip=True, trim=3, extend=True)),
        ("clip+trim5+ext", dict(clip=True, trim=5, extend=True)),
        ("clip+trim3+ext+wpow1", dict(clip=True, trim=3, extend=True, wpow=1.0)),
        ("clip+trim5+ext+sm0.5", dict(clip=True, trim=5, extend=True, smoothing=0.5)),
    ]
    for name, kw in grid:
        t = build(**kw)
        print(f"{name:28s} DSC {tube_dsc(t, gt_full, cb_index):.4f}", flush=True)


if __name__ == "__main__":
    main()
