#!/usr/bin/env python
"""KITTI odometry driver: matching + reconstruction over sequences.

Mirrors the reference's run_kitti_matching.py / run_kitti_reconstruction.py
(scripts/run_kitti_matching.py:37-44, run_kitti_reconstruction.py:31-43):
for each sequence, run sequential matching on image_0 then rec_kitti.

Usage:
  python scripts/run_kitti.py <kitti_root> <workspace> [--seqs 00 01 ...]

Expects <kitti_root>/<seq>/image_0/*.png and optional times.txt.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xrsfm_tpu import cli


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kitti_root")
    ap.add_argument("workspace")
    ap.add_argument("--seqs", nargs="*", default=[f"{i:02d}" for i in range(11)])
    a = ap.parse_args()
    for seq in a.seqs:
        images = os.path.join(a.kitti_root, seq, "image_0")
        if not os.path.isdir(images):
            print(f"skip {seq}: no {images}")
            continue
        ws = os.path.join(a.workspace, seq)
        bins = os.path.join(ws, "bins")
        model = os.path.join(ws, "model")
        cli.main(["run_matching", images, "", "sequential", bins])
        stamps = os.path.join(a.kitti_root, seq, "times.txt")
        args = ["rec_kitti", bins, seq, model]
        if os.path.exists(stamps):
            args += ["--timestamp_path", stamps]
        cli.main(args)


if __name__ == "__main__":
    main()
