"""SIFT extraction throughput breakdown on the live device.

Times bench.bench_sift's exact configuration while sweeping the
per-octave candidate-pool size: orientation+descriptor work is
proportional to POOL SLOTS (not real keypoints), so the images/s vs
pool curve separates the slot-proportional stage from the fixed
pyramid/detect/top-k/transfer cost.  Prints one JSON line.

Usage: python scripts/profile_sift.py [--pools 512,1024,2048] [--reps 4]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pools", default="512,1024,2048")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--size", default="480,640")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from xrsfm_tpu import enable_compilation_cache

    enable_compilation_cache()
    from xrsfm_tpu.ops.sift import SiftExtractor, SiftOptions

    h, w = map(int, args.size.split(","))
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, size=(h, w)).astype(np.float32)
    from numpy.lib.stride_tricks import sliding_window_view

    k = np.ones((5, 5), np.float32) / 25.0
    sw = sliding_window_view(np.pad(img, 2, mode="edge"), (5, 5))
    img = (sw * k).sum(axis=(2, 3)).astype(np.uint8)
    imgs = [img] * args.batch

    out = {"size": [h, w], "batch": args.batch, "points": []}
    for pool in map(int, args.pools.split(",")):
        ex = SiftExtractor(SiftOptions(
            num_octaves=4, features_per_octave=pool,
            max_features=4096, first_octave=0,
        ))
        ex.extract_batch(imgs, batch=args.batch)  # compile + warm
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            res = ex.extract_batch(imgs, batch=args.batch)
            times.append(time.perf_counter() - t0)
        med = float(np.median(times))
        n_kp = int(np.mean([len(kp) for kp, _ in res]))
        out["points"].append({
            "pool": pool,
            "images_per_s": round(args.batch / med, 2),
            "s_per_batch": round(med, 3),
            "keypoints": n_kp,
        })
        print(f"pool={pool}: {args.batch / med:.2f} img/s, {n_kp} kp",
              file=sys.stderr, flush=True)
    # slot-cost slope from the smallest/largest pool (total slots per
    # image = sum over octaves of max(pool >> o, floor))
    pts = out["points"]
    if len(pts) >= 2:
        def slots(pool):
            return sum(max(pool >> o, 128) for o in range(4))

        s0, s1 = slots(pts[0]["pool"]), slots(pts[-1]["pool"])
        d = pts[-1]["s_per_batch"] - pts[0]["s_per_batch"]
        per_slot = d / max(s1 - s0, 1) / args.batch
        fixed = pts[0]["s_per_batch"] / args.batch - per_slot * s0
        out["us_per_slot_per_image"] = round(1e6 * per_slot, 2)
        out["fixed_s_per_image"] = round(fixed, 4)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
