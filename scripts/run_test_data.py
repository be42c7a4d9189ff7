#!/usr/bin/env python
"""End-to-end smoke pipeline on a workspace directory.

Mirrors the reference driver (scripts/run_test_data.py:27-56): matching
stage then reconstruction stage (then optional tag scale), invoked through
the same CLI surface as the individual tools.  Works on the synthetic
dataset from synth_dataset.py or any workspace with images/ + camera.txt.

Usage: python scripts/run_test_data.py <workspace> [--matching sequential]
       [--estimate_scale]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xrsfm_tpu import cli


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("workspace")
    ap.add_argument("--matching", default="sequential",
                    choices=["sequential", "retrieval", "covisibility"])
    ap.add_argument("--estimate_scale", action="store_true")
    ap.add_argument("--correct_pose", action="store_true")
    ap.add_argument("--tag_length", type=float, default=0.113)
    a = ap.parse_args()

    ws = a.workspace
    images = os.path.join(ws, "images")
    retrieval = os.path.join(ws, "retrieval.txt")
    bin_dir = os.path.join(ws, "bins")
    out_dir = os.path.join(ws, "model")

    cli.main(["run_matching", images, retrieval, a.matching, bin_dir])
    rec_args = [
        "run_reconstruction", bin_dir, os.path.join(ws, "camera.txt"), out_dir
    ]
    if a.correct_pose:
        rec_args.append("--correct_pose")
    cli.main(rec_args)
    if not os.path.exists(os.path.join(out_dir, "images.bin")):
        print("[run_test_data] reconstruction produced no model", flush=True)
        sys.exit(1)

    # per-point RGB from the source images (reference:
    # scripts/pointcloud_color_calculator.py)
    from pointcloud_color import add_color

    n_colored = add_color(images, out_dir)
    print(f"[run_test_data] colored {n_colored} points", flush=True)

    if a.estimate_scale:
        cli.main([
            "estimate_scale", images, out_dir, "--tag_length", str(a.tag_length)
        ])


if __name__ == "__main__":
    main()
