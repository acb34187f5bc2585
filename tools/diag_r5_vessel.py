"""Round-5 full-grid VESSEL diagnostic: per-slice centreline error of the
final tube vs truth, on BOTH the crop-grid warm case and the full-FOV case,
plus the COM-chain / fused-probability view from the stashed atlas set.

Localises the full-grid DSC 0.806 failure: truncation (missing end slices)
vs lateral centreline error vs stop-condition trimming."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PLATIPY_TPU_DEBUG_ATLAS_SET"] = "1"

import numpy as np

import bench


def slice_com(mask):
    """Per-z-slice (cy, cx) COM dict of a [z,y,x] mask."""
    out = {}
    for z in range(mask.shape[0]):
        s = mask[z]
        n = s.sum()
        if n:
            c = np.argwhere(s).mean(axis=0)
            out[z] = (float(c[0]), float(c[1]), int(n))
    return out


def report_case(tag, gt_mask, res_mask, spacing_yx=(1.5, 1.5)):
    gt = slice_com(gt_mask)
    rs = slice_com(res_mask)
    gt_z = sorted(gt.keys())
    rs_z = sorted(rs.keys())
    print(f"[{tag}] truth z-extent: {gt_z[0]}..{gt_z[-1]} ({len(gt_z)} slices), "
          f"result z-extent: {rs_z[0] if rs_z else '-'}..{rs_z[-1] if rs_z else '-'}"
          f" ({len(rs_z)} slices)", flush=True)
    errs = []
    for z in gt_z:
        if z in rs:
            dy = (rs[z][0] - gt[z][0]) * spacing_yx[0]
            dx = (rs[z][1] - gt[z][1]) * spacing_yx[1]
            errs.append((z, float(np.hypot(dy, dx)), gt[z][2], rs[z][2]))
    if errs:
        e = np.array([x[1] for x in errs])
        print(f"[{tag}] lateral COM err mm: mean {e.mean():.2f} median "
              f"{np.median(e):.2f} p90 {np.percentile(e, 90):.2f} max {e.max():.2f}")
        # per-slice table, every 4th slice + the 6 worst
        worst = sorted(errs, key=lambda t: -t[1])[:6]
        print(f"[{tag}] worst slices (z, err_mm, gt_area, res_area): "
              f"{[(z, round(d, 2), a, b) for z, d, a, b in worst]}")
        # error profile in thirds
        n = len(errs)
        for name, seg in (("first-10", errs[:10]), ("mid", errs[n//3:2*n//3]),
                          ("last-10", errs[-10:])):
            ee = np.array([x[1] for x in seg])
            print(f"[{tag}]   {name}: mean {ee.mean():.2f} max {ee.max():.2f}")


def com_chain_report(tag, card_run, settings):
    """Recompute the fused-probability COM chain from the stashed atlas set."""
    from platipy_tpu.utils.vessel import com_from_probability, fused_vessel_probability

    atlas_set = card_run.LAST_ATLAS_SET_PRE_IAR
    img_crop = card_run.LAST_IMG_CROP
    cb_size, cb_index = card_run.LAST_CROP_BOX
    print(f"[{tag}] crop box index(xyz)={tuple(int(v) for v in cb_index)} "
          f"size(xyz)={tuple(int(v) for v in cb_size)}", flush=True)
    vss = settings["vessel_spline_settings"]
    prob = fused_vessel_probability(
        img_crop, atlas_set, "VESSEL", vote_params=vss.get("vote_params"))
    pts, masses = com_from_probability(
        prob, scan_direction="z", prob_threshold=vss["prob_threshold"],
        min_mass=float(vss["stop_condition_value_dict"]["VESSEL"]),
        return_masses=True)
    zs = [p[2] for p in pts]
    print(f"[{tag}] COM chain: {len(pts)} slices, z_mm {min(zs):.1f}..{max(zs):.1f}, "
          f"mass min {min(masses):.1f} median {np.median(masses):.1f} "
          f"max {max(masses):.1f}")
    print(f"[{tag}] first 5 masses {[round(m,1) for m in masses[:5]]} "
          f"last 5 {[round(m,1) for m in masses[-5:]]}")
    # per-atlas DIR vessel z-extent on the crop grid
    for i in sorted(atlas_set.keys()):
        m = np.asarray(atlas_set[i]["DIR"]["VESSEL"].array) > 0
        zz = np.where(m.any(axis=(1, 2)))[0]
        if len(zz):
            print(f"[{tag}]   atlas {i}: DIR vessel z {zz[0]}..{zz[-1]} "
                  f"({m.sum()} vox)")
    return prob


def main():
    import jax

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    from platipy_tpu.projects.cardiac import run as card_run

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

    # identical rng consumption to bench.main(): 4 crop cases first
    cases = []
    for _ in range(4):
        ct_t, masks_t = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        cases.append((ct_t, masks_t))

    # --- crop-grid case (cases[1], a bench warm case) ---
    img_c, masks_c = bench.to_images(*cases[1])
    res_c, dt = bench.run_case(img_c, settings)
    print(f"crop-grid case: {dt:.1f}s")
    mets = bench.surface_metrics(masks_c["VESSEL"], res_c["VESSEL"])
    print(f"[crop] VESSEL {json.dumps(mets)}")
    report_case("crop", np.asarray(masks_c["VESSEL"].array) > 0,
                np.asarray(res_c["VESSEL"].array) > 0)
    com_chain_report("crop", card_run, settings)

    # --- full-FOV case (same rng position as bench) ---
    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)
    res_f, dt = bench.run_case(img_full, settings)
    print(f"full-grid case: {dt:.1f}s")
    mets = bench.surface_metrics(masks_full["VESSEL"], res_f["VESSEL"])
    print(f"[full] VESSEL {json.dumps(mets)}")
    report_case("full", np.asarray(masks_full["VESSEL"].array) > 0,
                np.asarray(res_f["VESSEL"].array) > 0)
    com_chain_report("full", card_run, settings)

    # also look at the other two structures' full-grid errors for context
    for s in ("WHOLEHEART", "CHAMBER"):
        mets = bench.surface_metrics(masks_full[s], res_f[s])
        print(f"[full] {s} {json.dumps(mets)}")


if __name__ == "__main__":
    main()
