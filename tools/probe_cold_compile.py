"""Cold-compile budget breakdown (VERDICT r4 item 3: 30.4 s -> 56.3 s).

Runs ONE bench warm-shape case in THIS process with an EMPTY compilation
cache and jax_log_compiles=1, capturing every "Finished XLA compilation"
line; aggregates compile seconds per program name.  Point PLATIPY_COLD_DIR
at a scratch cache dir (default: a temp dir, so the real .jax_cache is
untouched).

Usage: python tools/probe_cold_compile.py [crop|full]
"""

import logging
import os
import re
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import bench


class CompileLogCapture(logging.Handler):
    PAT = re.compile(r"Finished (?:XLA compilation|jaxpr to MLIR module conversion|tracing) .*?(?:of|for) (?:jit[(_]|pjit[(_]?)?([\w<>\[\]\. -]+?)\)? in ([0-9.eE+-]+) sec")

    def __init__(self):
        super().__init__()
        self.events = []

    def emit(self, record):
        msg = record.getMessage()
        m = self.PAT.search(msg)
        if m:
            kind = ("compile" if "XLA compilation" in msg
                    else "lower" if "MLIR" in msg else "trace")
            self.events.append((kind, m.group(1), float(m.group(2))))


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "crop"
    import jax

    cache_dir = os.environ.get("PLATIPY_COLD_DIR") or tempfile.mkdtemp(
        prefix="platipy_coldcache_")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_log_compiles", True)

    cap = CompileLogCapture()
    logging.getLogger("jax").addHandler(cap)
    logging.getLogger("jax").setLevel(logging.DEBUG)

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
    ct_t, masks_t = bench.deform_case(ct0, fields0, rng,
                                      shift_vox=rng.randint(-3, 4, size=3))
    if which == "full":
        img_t, _ = bench.build_full_fov_case(ct_t, masks_t)
    else:
        img_t, _ = bench.to_images(ct_t, masks_t)

    t0 = time.time()
    _, dt = bench.run_case(img_t, settings)
    total = time.time() - t0
    print(f"\ncold case ({which}): {dt:.1f}s run, {total:.1f}s wall")

    agg = {}
    for kind, name, secs in cap.events:
        k = (kind, name.strip())
        agg[k] = (agg[k][0] + secs, agg[k][1] + 1) if k in agg else (secs, 1)
    by_kind = {}
    for (kind, _), (secs, _) in agg.items():
        by_kind[kind] = by_kind.get(kind, 0.0) + secs
    print("totals by kind:", {k: round(v, 1) for k, v in by_kind.items()})
    rows = sorted(((v[0], v[1], kind, name)
                   for (kind, name), v in agg.items()), reverse=True)
    print(f"{'secs':>8} {'n':>4}  kind     name")
    for secs, cnt, kind, name in rows[:40]:
        print(f"{secs:8.2f} {cnt:4d}  {kind:8s} {name[:70]}")
    n_programs = sum(1 for (k, _), _ in agg.items() if k == "compile")
    print(f"distinct compiled programs: {n_programs}; events: {len(cap.events)}")


if __name__ == "__main__":
    main()
