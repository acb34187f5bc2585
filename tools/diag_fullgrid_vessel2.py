"""Stage-attribution for the full-grid VESSEL error: registration vs COM
estimation vs splining.  Uses the PLATIPY_TPU_DEBUG_ATLAS_SET hook to replay
fusion/COM offline on the stashed post-DIR atlas set."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["PLATIPY_TPU_DEBUG_ATLAS_SET"] = "1"

import numpy as np

import bench


def slice_coms(mask):
    """[z] -> (cy, cx) or None per slice."""
    out = {}
    for z in range(mask.shape[0]):
        s = mask[z]
        if s.sum():
            out[z] = np.argwhere(s).mean(axis=0)
    return out


def com_err_profile(gt_coms, coms):
    errs = {}
    for z, c in coms.items():
        if z in gt_coms:
            errs[z] = float(np.hypot(*(gt_coms[z] - c)))
    return errs


def main():
    import jax

    repo_dir = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo_dir, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.RandomState(7)
    ct0, masks0, fields0 = bench.build_phantom()
    atlas_set = {}
    for i in range(10):
        ct_i, masks_i = bench.deform_case(ct0, fields0, rng,
                                          shift_vox=rng.randint(-3, 4, size=3))
        ct_i, masks_i = bench.add_atlas_context(ct_i, masks_i)
        dz, dy, dx = rng.randint(0, 5, size=3)
        crop = ((dz, ct_i.shape[0] - rng.randint(0, 5)),
                (dy, ct_i.shape[1] - rng.randint(0, 5)),
                (dx, ct_i.shape[2] - rng.randint(0, 5)))
        img, m = bench.to_images(ct_i, masks_i, crop=crop)
        atlas_set[f"{i:02d}"] = {"CT Image": img, **m}
    settings = bench.make_settings(atlas_set)
    for _ in range(4):
        bench.deform_case(ct0, fields0, rng, shift_vox=rng.randint(-3, 4, size=3))
    ct_f, masks_f = bench.deform_case(ct0, fields0, rng)
    img_full, masks_full = bench.build_full_fov_case(ct_f, masks_f)

    results, dt = bench.run_case(img_full, settings)
    print(f"run: {dt:.1f}s")

    from platipy_tpu.projects.cardiac import run as card_run

    cb_size, cb_index = card_run.LAST_CROP_BOX
    print(f"crop box: index(xyz)={cb_index} size(xyz)={cb_size}  "
          f"(full grid 512x512x192 xyz)")
    aset = card_run.LAST_ATLAS_SET_PRE_IAR
    img_crop = card_run.LAST_IMG_CROP

    # GT vessel on the crop grid
    x0, y0, z0 = cb_index
    sx, sy, sz = cb_size
    gt_full = np.asarray(masks_full["VESSEL"].array)
    gt_crop = gt_full[z0:z0 + sz, y0:y0 + sy, x0:x0 + sx]
    gt_coms = slice_coms(gt_crop)

    # (a) per-atlas warped vessel COM error
    print("\nper-atlas DIR-warped VESSEL: mean COM err (vox), dsc")
    for aid in sorted(aset):
        v = np.asarray(aset[aid]["DIR"]["VESSEL"].array) > 0.5
        errs = com_err_profile(gt_coms, slice_coms(v))
        inter = np.logical_and(v, gt_crop).sum()
        d = 2 * inter / max(v.sum() + gt_crop.sum(), 1)
        print(f"  {aid}: com_err={np.mean(list(errs.values())):.2f}  dsc={d:.3f}  "
              f"nslices={len(errs)}")

    # (b) fused probability COM error (the spline's input)
    from platipy_tpu.utils.vessel import com_from_probability, fused_vessel_probability

    vss = settings["vessel_spline_settings"]
    prob = fused_vessel_probability(
        img_crop, aset, "VESSEL", vote_params=vss.get("vote_params"),
    )
    pts, masses = com_from_probability(
        prob, scan_direction="z", prob_threshold=vss["prob_threshold"],
        min_mass=float(vss["stop_condition_value_dict"]["VESSEL"]),
        return_masses=True,
    )
    origin = np.asarray(img_crop.origin)
    spacing = np.asarray(img_crop.spacing)
    print("\nfused-prob COM error by slice (vox):")
    errs_b = []
    for p, m in zip(pts, masses):
        idx = (np.asarray(p) - origin) / spacing  # xyz
        z = int(round(idx[2]))
        if z in gt_coms:
            e = float(np.hypot(idx[1] - gt_coms[z][0], idx[0] - gt_coms[z][1]))
            errs_b.append((z, e, m))
    for z, e, m in errs_b:
        flag = " <<<" if e > 0.8 else ""
        print(f"  z={z:3d} err={e:5.2f} mass={m:7.1f}{flag}")
    print(f"extra slices beyond GT: {[int(round(((np.asarray(p)-origin)/spacing)[2])) for p in pts if int(round(((np.asarray(p)-origin)/spacing)[2])) not in gt_coms]}")

    # (c) final result COM error (spline output)
    res_full = np.asarray(results["VESSEL"].array)
    res_crop = res_full[z0:z0 + sz, y0:y0 + sy, x0:x0 + sx]
    errs_c = com_err_profile(gt_coms, slice_coms(res_crop))
    print(f"\nmean COM err: fused-prob={np.mean([e for _, e, _ in errs_b]):.3f}  "
          f"final={np.mean(list(errs_c.values())):.3f}")


if __name__ == "__main__":
    main()
