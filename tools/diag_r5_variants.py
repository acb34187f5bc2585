"""Round-5 full-grid VESSEL variant matrix.

Runs the full-FOV bench case under pipeline-setting variants and reports
VESSEL DSC/HD95, per-atlas DIR vessel slice-COM error vs truth (isolating
DIR quality from splining), and the affine scale factors.

Usage: python tools/diag_r5_variants.py [variant ...]
Variants: base oob tight oob_tight
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PLATIPY_TPU_DEBUG_ATLAS_SET"] = "1"

import copy

import numpy as np

import bench


def per_atlas_dir_com_err(card_run, gt_mask_full):
    """Mean/max lateral slice-COM error (mm) of each atlas's DIR vessel vs
    the truth tube, on the crop grid."""
    atlas_set = card_run.LAST_ATLAS_SET_PRE_IAR
    img_crop = card_run.LAST_IMG_CROP
    cb_size, cb_index = card_run.LAST_CROP_BOX
    x0, y0, z0 = (int(v) for v in cb_index)
    sx, sy, sz = (int(v) for v in cb_size)
    gt_crop = gt_mask_full[z0:z0 + sz, y0:y0 + sy, x0:x0 + sx]
    gt_com = {}
    for z in range(gt_crop.shape[0]):
        s = gt_crop[z]
        if s.sum():
            gt_com[z] = np.argwhere(s).mean(axis=0)
    out = {}
    for i in sorted(atlas_set.keys()):
        m = np.asarray(atlas_set[i]["DIR"]["VESSEL"].array) > 0
        errs = []
        for z, g in gt_com.items():
            s = m[z]
            if s.sum():
                c = np.argwhere(s).mean(axis=0)
                errs.append(np.hypot((c[0] - g[0]) * 1.5, (c[1] - g[1]) * 1.5))
        if errs:
            e = np.array(errs)
            out[i] = (round(float(e.mean()), 2), round(float(e.max()), 2))
    return out


def affine_scales(card_run):
    out = {}
    atlas_set = card_run.LAST_ATLAS_SET_PRE_IAR
    for i in sorted(atlas_set.keys()):
        t = atlas_set[i]["RIR"]["Transform"]
        try:
            mat = np.asarray(t.as_matrix())[:3, :3]
            out[i] = tuple(round(float(v), 3)
                           for v in np.linalg.norm(mat, axis=0))
        except Exception:
            try:
                comps = t.transforms  # CompositeTransform
                mat = np.asarray(comps[-1].as_matrix())[:3, :3] @ np.asarray(
                    comps[0].as_matrix())[:3, :3]
                out[i] = tuple(round(float(v), 3)
                               for v in np.linalg.norm(mat, axis=0))
            except Exception:
                out[i] = None
    return out


def main():
    import jax

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from platipy_tpu.projects.cardiac import run as card_run

    which = sys.argv[1:] or ["base", "oob", "tight", "oob_tight"]

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
    settings0 = bench.make_settings(atlas_set)

    # identical rng consumption to bench.main()
    cases = []
    for _ in range(4):
        ct_t, masks_t = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        cases.append((ct_t, masks_t))
    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)
    gt_full = np.asarray(masks_full["VESSEL"].array) > 0

    variants = {
        "base": {},
        "oob": {"oob": True},
        "tight": {"exp": [20, 20, 20]},
        "oob_tight": {"oob": True, "exp": [20, 20, 20]},
        "tightreg": {"metric_box": "atlas_extent"},
        "tightreg_oob": {"metric_box": "atlas_extent", "oob": True},
        "shrinkreg_oob": {"metric_box": "atlas_extent", "oob": True,
                          "mb_exp": [-10, -10, -10]},
        "final": {"metric_box": "atlas_extent", "oob": True,
                  "vessel_ends": True},
        "final_shrink": {"metric_box": "atlas_extent", "oob": True,
                         "mb_exp": [-10, -10, -10], "vessel_ends": True},
    }
    for name in which:
        v = variants[name]
        settings = copy.deepcopy(settings0)
        # deepcopy loses device arrays? atlas_set holds Image pytrees —
        # reuse the original in-memory set to avoid copying device buffers
        settings["atlas_settings"]["atlas_set"] = atlas_set
        if v.get("oob"):
            settings["deformable_registration_settings"]["oob_inherit_fixed"] = True
        if v.get("exp"):
            settings["auto_crop_target_image_settings"]["expansion_mm"] = v["exp"]
        if v.get("metric_box"):
            settings["linear_registration_settings"]["metric_box"] = v["metric_box"]
        if v.get("mb_exp"):
            settings["linear_registration_settings"][
                "metric_box_expansion_mm"] = v["mb_exp"]
        if v.get("vessel_ends"):
            settings["vessel_spline_settings"]["end_trim"] = 3
            settings["vessel_spline_settings"]["clip_to_extent"] = True
        res, dt = bench.run_case(img_full, settings)
        mets = bench.surface_metrics(masks_full["VESSEL"], res["VESSEL"])
        wh = bench.surface_metrics(masks_full["WHOLEHEART"], res["WHOLEHEART"])
        ch = bench.surface_metrics(masks_full["CHAMBER"], res["CHAMBER"])
        print(f"[{name}] {dt:.1f}s VESSEL {json.dumps(mets)} "
              f"WH_dsc {wh['dsc']} CH_dsc {ch['dsc']}", flush=True)
        # per-slice lateral error profile of the final tube vs truth
        rs = np.asarray(res["VESSEL"].array) > 0
        errs = []
        for z in range(gt_full.shape[0]):
            g, r = gt_full[z], rs[z]
            if g.sum() and r.sum():
                gc = np.argwhere(g).mean(axis=0)
                rc = np.argwhere(r).mean(axis=0)
                errs.append((z, float(np.hypot(*(1.5 * (rc - gc)))),
                             int(g.sum()), int(r.sum())))
        if errs:
            e = np.array([x[1] for x in errs])
            nn = len(errs)
            print(f"[{name}] slice err mm: mean {e.mean():.2f} p90 "
                  f"{np.percentile(e, 90):.2f} | first10 "
                  f"{e[:10].mean():.2f} mid {e[nn//3:2*nn//3].mean():.2f} "
                  f"last10 {e[-10:].mean():.2f}")
            print(f"[{name}] gt z {errs[0][0]}..{errs[-1][0]}, res extra: "
                  f"lo {int((rs[:errs[0][0]] > 0).sum())} vox, "
                  f"hi {int((rs[errs[-1][0]+1:] > 0).sum())} vox")
            worst = sorted(errs, key=lambda t: -t[1])[:5]
            print(f"[{name}] worst (z,err,gt_a,res_a): "
                  f"{[(z, round(d, 2), a, b) for z, d, a, b in worst]}")
        cb_size, cb_index = card_run.LAST_CROP_BOX
        print(f"[{name}] crop box index(xyz)={tuple(int(q) for q in cb_index)} "
              f"size(xyz)={tuple(int(q) for q in cb_size)}")
        errs = per_atlas_dir_com_err(card_run, gt_full)
        print(f"[{name}] per-atlas DIR vessel COM err (mean,max) mm: {errs}")
        print(f"[{name}] affine col norms (x,y,z): {affine_scales(card_run)}",
              flush=True)


if __name__ == "__main__":
    main()
