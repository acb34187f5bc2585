"""North-star benchmark: 10-atlas multi-atlas segmentation (register + fuse).

Runs the full pipeline — auto-crop, batched per-atlas linear registration,
batched multiscale demons (6/3/1.5 mm, 150/125/100 iterations), multi-structure
fusion, paste + post-processing — on a textured, synthetically DEFORMED
multi-structure phantom (body + chamber + vessel), with per-atlas grid
variation, on whatever accelerator JAX finds (the real TPU chip under the
driver).

Atlas/target generation is host-side numpy/scipy (smooth random DVFs via
gaussian-filtered noise + map_coordinates) so the measured region is purely
the segmentation pipeline.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N, ...}
vs_baseline is relative to the reference's published ~300 s end-to-end hybrid
cardiac time on a 24-core i9 + RTX 3090 (platipy cardiac README:42-46); the
north-star target is <60 s (BASELINE.md).  Extra keys: per-structure surface
metrics (DSC/HD95/MASD), per-stage seconds (one separately profiled run, since
stage sync points serialize the pipeline), cold-compile seconds, and achieved
HBM stream bandwidth vs the v5e roofline.
"""

import copy
import json
import time

import numpy as np

SHAPE = (96, 160, 160)        # cardiac crop, [z,y,x]
SPACING = (1.5, 1.5, 2.0)     # (x,y,z) mm
STRUCTURES = ["WHOLEHEART", "CHAMBER", "VESSEL"]
V5E_HBM_GBPS = 819.0          # v5e HBM roofline (public spec: 16 GB @ 819 GB/s)


def build_phantom():
    """Textured multi-structure phantom: soft-tissue body ellipsoid with a
    bone-like shell, a low-contrast interior chamber, and a thin vessel tube
    hugging the surface — contrast boundaries + anisotropy like cardiac CT."""
    nz, ny, nx = SHAPE
    sx, sy, sz = SPACING
    zz, yy, xx = np.mgrid[:nz, :ny, :nx].astype(np.float32)
    z_mm, y_mm, x_mm = zz * sz, yy * sy, xx * sx
    cz, cy, cx = 48 * sz, 80 * sy, 80 * sx

    # body: ellipsoid (54, 58, 50) mm radii
    r_body = np.sqrt(((z_mm - cz) / 54) ** 2 + ((y_mm - cy) / 58) ** 2
                     + ((x_mm - cx) / 50) ** 2)
    def sigmoid(t):
        return 1.0 / (1.0 + np.exp(np.clip(t, -60.0, 60.0)))

    body = sigmoid((r_body - 1.0) / 0.03)
    # bone-like shell just outside the body
    shell = np.exp(-((r_body - 1.12) / 0.04) ** 2)
    # chamber: interior ellipsoid, low contrast vs body
    r_ch = np.sqrt(((z_mm - cz) / 26) ** 2 + ((y_mm - cy - 8) / 24) ** 2
                   + ((x_mm - cx + 6) / 22) ** 2)
    chamber = sigmoid((r_ch - 1.0) / 0.05)
    # vessel: tube along z at 0.85 body radius
    vx, vy = cx + 38.0, cy + 30.0
    r_v = np.sqrt((x_mm - vx) ** 2 + (y_mm - vy) ** 2)
    vessel = sigmoid((r_v - 5.0) / 0.8) * (body > 0.2)

    tex = (60 * np.sin(0.41 * zz) * np.cos(0.29 * yy)
           + 45 * np.sin(0.23 * xx + 0.1 * yy)
           + 25 * np.sin(0.09 * xx) * np.sin(0.07 * zz))
    ct = (-1000 + body * (1040 + tex) + shell * 700
          + chamber * 90 + vessel * 180).astype(np.float32)
    masks = {
        "WHOLEHEART": (body > 0.5).astype(np.uint8),
        "CHAMBER": (chamber > 0.5).astype(np.uint8),
        "VESSEL": (vessel > 0.5).astype(np.uint8),
    }
    return ct, masks


def random_smooth_dvf(rng, max_mm=8.0, smooth_vox=12.0):
    """Smooth random displacement field in voxel units, [z,y,x] components."""
    from scipy.ndimage import gaussian_filter

    spacing_zyx = np.array([SPACING[2], SPACING[1], SPACING[0]], np.float32)
    field = []
    for axis in range(3):
        f = rng.randn(*SHAPE).astype(np.float32)
        f = gaussian_filter(f, smooth_vox)
        f *= max_mm / (np.abs(f).max() + 1e-9) / spacing_zyx[axis]
        field.append(f)
    return field


def deform_case(ct, masks, rng, shift_vox=(0, 0, 0)):
    """Warp the phantom through a smooth random DVF + bulk shift (host-side:
    the measured pipeline starts AFTER case generation)."""
    from scipy.ndimage import map_coordinates

    dvf = random_smooth_dvf(rng)
    zz, yy, xx = np.mgrid[: SHAPE[0], : SHAPE[1], : SHAPE[2]].astype(np.float32)
    coords = [zz + dvf[0] + shift_vox[0], yy + dvf[1] + shift_vox[1],
              xx + dvf[2] + shift_vox[2]]
    ct_w = map_coordinates(ct, coords, order=1, mode="constant", cval=-1000.0)
    masks_w = {
        name: map_coordinates(m, coords, order=0, mode="constant", cval=0)
        for name, m in masks.items()
    }
    return ct_w.astype(np.float32), masks_w


def to_images(ct, masks, crop=None, origin_shift=(0.0, 0.0, 0.0)):
    from platipy_tpu.core.image import from_array

    if crop is not None:
        (z0, z1), (y0, y1), (x0, x1) = crop
        ct = ct[z0:z1, y0:y1, x0:x1]
        masks = {k: v[z0:z1, y0:y1, x0:x1] for k, v in masks.items()}
        origin_shift = (
            origin_shift[0] + x0 * SPACING[0],
            origin_shift[1] + y0 * SPACING[1],
            origin_shift[2] + z0 * SPACING[2],
        )
    img = from_array(np.ascontiguousarray(ct), origin=origin_shift, spacing=SPACING)
    m_imgs = {
        k: from_array(np.ascontiguousarray(v), origin=origin_shift, spacing=SPACING)
        for k, v in masks.items()
    }
    return img, m_imgs


def make_settings(atlas_set):
    from platipy_tpu.projects.multiatlas.run import MUTLIATLAS_SETTINGS_DEFAULTS

    settings = copy.deepcopy(MUTLIATLAS_SETTINGS_DEFAULTS)
    settings["atlas_settings"]["atlas_set"] = atlas_set
    settings["atlas_settings"]["atlas_id_list"] = list(atlas_set.keys())
    settings["atlas_settings"]["atlas_structure_list"] = list(STRUCTURES)
    # the reference multiatlas defaults (run.py:75-91): 6/3/1.5mm, 150/125/100
    settings["deformable_registration_settings"]["resolution_staging"] = [6, 3, 1.5]
    settings["deformable_registration_settings"]["iteration_staging"] = [150, 125, 100]
    # local (Gaussian-weighted intensity-difference) voting: one extra
    # separable convolution per atlas (<0.1 s batched) and measurably better
    # thin-structure DSC than unweighted majority voting; both are reference
    # pipeline options (reference fusion.py:155-177)
    settings["label_fusion_settings"]["vote_type"] = "local"
    settings["postprocessing_settings"]["structures_for_binaryfillhole"] = list(STRUCTURES)
    return settings


def run_case(img, settings):
    from platipy_tpu.projects.multiatlas.run import run_segmentation

    t0 = time.time()
    results, _ = run_segmentation(img, settings)
    for s in STRUCTURES:
        np.asarray(results[s].array)  # force full execution (tunnel-safe sync)
    return results, time.time() - t0


def surface_metrics(gt, auto):
    from platipy_tpu.label.comparison import (
        compute_metric_dsc,
        compute_surface_metrics,
    )

    sm = compute_surface_metrics(gt, auto)
    return {
        "dsc": round(float(compute_metric_dsc(gt, auto)), 4),
        "hd95_mm": round(float(sm["hausdorffDistance95Pooled"]), 2),
        "masd_mm": round(float(sm["meanSurfaceDistance"]), 3),
    }


def stream_bandwidth_gbps():
    """Achieved HBM bandwidth of a pure streaming kernel (read 2 + write 1
    arrays per iteration), the roofline context for the memory-bound demons
    loop.  The iteration loop runs INSIDE one jitted program (lax.fori_loop)
    so per-dispatch tunnel latency cannot pollute the measurement."""
    import jax
    import jax.numpy as jnp

    n = 64 * 1024 * 1024  # 256 MB per f32 array
    iters = 50
    x = jnp.arange(n, dtype=jnp.float32)
    z = jnp.ones((n,), jnp.float32)

    @jax.jit
    def chained_saxpy(x, z):
        return jax.lax.fori_loop(0, iters, lambda i, y: y + 0.5 * z, x)

    y = chained_saxpy(x, z)
    float(jnp.sum(y[:1]))  # warm-up + sync (block_until_ready lies over the tunnel)
    t0 = time.time()
    y = chained_saxpy(y, z)
    float(jnp.sum(y[:1]))
    dt = time.time() - t0
    bytes_moved = iters * 3 * n * 4
    return bytes_moved / dt / 1e9


def _wait_for_healthy_device(budget_s=1500):
    """Block until a trivial device op succeeds in a SUBPROCESS (or the budget
    runs out).  Tunnelled TPU platforms flap: a backend init attempted during
    a bad window burns ~30 minutes in internal retries and then dies, while a
    run started from a healthy window completes.  Subprocess probes are cheap
    and killable; the in-process backend is only initialised once one
    succeeds.  On locally-attached hardware the single probe costs ~5 s."""
    import subprocess
    import sys

    t0 = time.time()
    fast_failures = 0
    while True:
        t_probe = time.time()
        try:
            # import platipy_tpu first: it applies any JAX_PLATFORMS env
            # redirect through the config API (some plugin platforms ignore
            # the raw env var), so the probe inits the same backend the
            # benchmark will
            r = subprocess.run(
                [sys.executable, "-c",
                 "import platipy_tpu, jax, jax.numpy as j;"
                 " print(float(j.sum(j.ones((8, 8)))))"],
                capture_output=True, timeout=120, text=True,
            )
            if r.returncode == 0:
                return True
            print(f"device probe failed (rc={r.returncode}): "
                  f"{r.stderr.strip()[-500:]}", file=sys.stderr)
            # a probe that fails in seconds is a broken environment, not a
            # flapping tunnel — retrying for the whole budget just hides the
            # error for 25 minutes
            if time.time() - t_probe < 10:
                fast_failures += 1
                if fast_failures >= 3:
                    return False
        except subprocess.TimeoutExpired:
            fast_failures = 0
            print("device probe timed out (tunnel flap?); retrying",
                  file=sys.stderr)
        if time.time() - t0 > budget_s:
            return False  # last-ditch: let the real run try anyway
        time.sleep(120)


def main():
    import os

    _wait_for_healthy_device()

    import jax

    # persistent compilation cache: compiles amortise across runs, as they
    # would in a deployed segmentation service
    repo_dir = os.path.dirname(os.path.abspath(__file__))
    cache_dir = os.path.join(repo_dir, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    # seed from a committed cache artifact IF one exists (.jax_cache itself is
    # untracked and gets wiped with the working tree, which re-pays remote
    # compiles on every fresh checkout).  The seed directory is optional —
    # when absent this block is a no-op and the first run compiles cold.
    # Stale/foreign entries in a seed are simply cache misses.
    seed_dir = os.path.join(repo_dir, "artifacts", "xla_cache_seed")
    if os.path.isdir(seed_dir):
        import shutil

        for name in os.listdir(seed_dir):
            dst = os.path.join(cache_dir, name)
            if not os.path.exists(dst):
                shutil.copy2(os.path.join(seed_dir, name), dst)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    # cache EVERY program: the many small (<0.5 s compile) programs are
    # exactly the ones whose per-process remote recompiles dominated cold
    # starts (~0.4-1 s each over the tunnel, hundreds of programs)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

    rng = np.random.RandomState(7)
    ct0, masks0 = build_phantom()

    # 10 atlases: deformed anatomy + varied grids (different crops shift the
    # shape AND origin per atlas; spacing shared, like one scanner protocol)
    atlas_set = {}
    for i in range(10):
        ct_i, masks_i = deform_case(ct0, masks0, rng,
                                    shift_vox=rng.randint(-3, 4, size=3))
        dz, dy, dx = rng.randint(0, 5, size=3)
        crop = ((dz, SHAPE[0] - rng.randint(0, 5)),
                (dy, SHAPE[1] - rng.randint(0, 5)),
                (dx, SHAPE[2] - rng.randint(0, 5)))
        img, m = to_images(ct_i, masks_i, crop=crop)
        atlas_set[f"{i:02d}"] = {"CT Image": img, **m}

    settings = make_settings(atlas_set)

    # held-out cases: independently deformed targets on the full grid
    cases = []
    for _ in range(4):
        ct_t, masks_t = deform_case(ct0, masks0, rng,
                                    shift_vox=rng.randint(-3, 4, size=3))
        cases.append(to_images(ct_t, masks_t))

    # run 1 (cold: includes jit compilation / cache population)
    t0 = time.time()
    results, cold_s = run_case(cases[0][0], settings)
    per_structure = {s: surface_metrics(cases[0][1][s], results[s])
                     for s in STRUCTURES}

    # steady state: three distinct warm cases back-to-back (deployed-service
    # regime); the mean damps single-run tunnel/host jitter
    warm_times = []
    min_dsc = min(v["dsc"] for v in per_structure.values())
    for img_w, masks_w in cases[1:]:
        results_w, dt = run_case(img_w, settings)
        warm_times.append(dt)
        for s in STRUCTURES:
            m = surface_metrics(masks_w[s], results_w[s])
            min_dsc = min(min_dsc, m["dsc"])
    # median: robust to a one-off shape-bucket compile on the first warm
    # case (auto-crop boxes bucket by pad_roi_to_multiple; a fresh bucket
    # compiles once and is then cached persistently)
    warm_s = float(np.median(warm_times))

    # stage breakdown: ONE extra profiled run (stage sync points serialize
    # the pipeline, so this is kept out of the headline timing)
    os.environ["PLATIPY_TPU_PROFILE"] = "1"
    from platipy_tpu.projects.multiatlas import run as ma_run

    _ = run_case(cases[1][0], settings)
    stage_s = {k: round(v, 2) for k, v in
               getattr(ma_run, "LAST_STAGE_TIMES", {}).items()}
    os.environ.pop("PLATIPY_TPU_PROFILE", None)

    hbm = stream_bandwidth_gbps()

    baseline_s = 300.0  # reference hybrid cardiac pipeline ~5 min per case
    print(json.dumps({
        "metric": "multiatlas_10atlas_3struct_register_fuse_per_case",
        "value": round(warm_s, 2),
        "unit": "s",
        "vs_baseline": round(warm_s / baseline_s, 4),
        "cold_s": round(cold_s, 2),
        "warm_runs_s": [round(t, 2) for t in warm_times],
        "throughput_cases_per_hour": round(3600.0 / warm_s, 1),
        "dsc": min_dsc,
        "per_structure": per_structure,
        "stage_s": stage_s,
        "hbm_stream_gbps": round(hbm, 1),
        "hbm_stream_vs_roofline": round(hbm / V5E_HBM_GBPS, 3),
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
