"""End-to-end IMAGE-pipeline throughput on the chip: pixels -> SIFT ->
match -> F-verify -> incremental reconstruction, timed per stage.

The north-star metric is e2e frames/s on the image path (r3 verdict
missing#4: no recorded number above 8-64 images existed).  Renders an
N-image synthetic scene (scripts/synth_dataset.py), then runs the real
pipeline entry points with a warm compilation cache and prints ONE JSON
line: {n_images, extract_s, match_s, reconstruct_s, total_s,
frames_per_s, registered, ate_pct}.

Usage: python scripts/e2e_bench.py [--n_images 96] [--scene corridor]
       [--workdir /tmp/e2e_bench] [--warm]

--warm runs matching twice, timing the second pass with extraction
features cached removed (compile-warm numbers; first-compile adds
30-60 s once per process lifetime, amortized to zero in production by
the persistent compilation cache).
"""

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_images", type=int, default=96)
    ap.add_argument("--scene", default="corridor")
    ap.add_argument("--workdir", default="/tmp/e2e_bench")
    ap.add_argument("--cpu", action="store_true")
    # record per-phase device-dispatch + host-fetch counts (the tunnel
    # bills ~13 ms per round-trip; the count x 13 ms is the small-scene
    # wall model).  Must be decided before xrsfm_tpu imports.
    ap.add_argument("--count_dispatches", action="store_true")
    # steady-state mode: run each phase TWICE in this process and report
    # the second pass.  The r5 dispatch-count analysis attributed the
    # "warm" wall's dominant cost to PER-PROCESS jit warmup (trace +
    # compile-cache load across ~18 BA shapes + the other kernels'
    # buckets: 72 s of the 116 s reconstruct wall @96 images), not to
    # tunnel dispatches (1,387 round-trips ~ 18 s).  A long-lived
    # production service pays warmup once; --steady measures that
    # regime.
    ap.add_argument("--steady", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    counter = None
    if args.count_dispatches:
        from xrsfm_tpu.utils.profiling import install_dispatch_counter

        counter = install_dispatch_counter()
    from xrsfm_tpu import enable_compilation_cache

    enable_compilation_cache()
    import numpy as np
    import synth_dataset as sd

    ws = args.workdir
    shutil.rmtree(ws, ignore_errors=True)
    sd.main(ws, n_cams=args.n_images, scene=args.scene)

    from xrsfm_tpu.pipelines import run_matching as RM
    from xrsfm_tpu.pipelines import run_reconstruction as RR

    images = os.path.join(ws, "images")
    bin_dir = os.path.join(ws, "bins")
    os.makedirs(bin_dir, exist_ok=True)
    names = __import__("xrsfm_tpu.utils.io_features",
                       fromlist=["x"]).load_image_names(images)

    def snap():
        if counter is None:
            return None
        return (counter["jit_calls"], counter["fetches"])

    def phase_counts(before, after):
        if before is None:
            return None
        return {"dispatches": after[0] - before[0],
                "fetches": after[1] - before[1]}

    passes = 2 if args.steady else 1
    for _pass in range(passes):
        if _pass:  # second pass re-does the work with jits warm
            os.remove(os.path.join(bin_dir, "ftr.bin"))
            for fp in ("fp.bin", "fp_init.bin"):
                p = os.path.join(bin_dir, fp)
                if os.path.exists(p):
                    os.remove(p)
        c0 = snap()
        t0 = time.time()
        feats = RM.get_features(images, os.path.join(bin_dir, "ftr.bin"),
                                names, verbose=False)
        extract_s = time.time() - t0
        c1 = snap()
        t0 = time.time()
        RM.main(images, "", "sequential", bin_dir)
        match_s = time.time() - t0  # features cached: pure match+verify
        c2 = snap()
        t0 = time.time()
        m = RR.main(bin_dir, os.path.join(ws, "camera.txt"),
                    os.path.join(ws, "model"))
        reconstruct_s = time.time() - t0
        c3 = snap()
    reg = int(np.count_nonzero(m.registered)) if m is not None else 0

    ate_pct = None
    gt = os.path.join(ws, "gt_poses.txt")
    if m is not None and os.path.exists(gt):
        from xrsfm_tpu.ops.umeyama import ate_rmse
        from xrsfm_tpu.utils import geometry as G

        gtp = {}
        for line in open(gt):
            p = line.split()
            gtp[p[0]] = (np.array(list(map(float, p[1:5]))),
                         np.array(list(map(float, p[5:8]))))
        est_c, gt_c = [], []
        for i in range(m.num_frames):
            if m.registered[i] and m.names[i] in gtp:
                est_c.append(G.pose_center_np(np.asarray(m.q[i]),
                                              np.asarray(m.t[i])))
                gt_c.append(G.pose_center_np(*gtp[m.names[i]]))
        est_c, gt_c = np.asarray(est_c), np.asarray(gt_c)
        span = float(np.linalg.norm(gt_c.max(0) - gt_c.min(0)))
        ate_pct = round(100.0 * float(ate_rmse(gt_c, est_c)) / span, 3)

    total = extract_s + match_s + reconstruct_s
    out = {
        "mode": "steady" if args.steady else "fresh_process",
        "n_images": args.n_images,
        "n_feats_mean": int(np.mean([len(f.keypoints) for f in feats])),
        "extract_s": round(extract_s, 1),
        "match_s": round(match_s, 1),
        "reconstruct_s": round(reconstruct_s, 1),
        "total_s": round(total, 1),
        "frames_per_s": round(args.n_images / total, 3),
        "registered": reg,
        "ate_pct_span": ate_pct,
    }
    if counter is not None:
        out["dispatch_counts"] = {
            "extract": phase_counts(c0, c1),
            "match": phase_counts(c1, c2),
            "reconstruct": phase_counts(c2, c3),
        }
        top = sorted(counter["by_name"].items(), key=lambda kv: -kv[1])[:15]
        out["dispatch_top"] = dict(top)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
