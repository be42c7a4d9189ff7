#!/usr/bin/env python
"""1DSfM driver: covisibility matching + reconstruction over scenes.

Mirrors the reference's run_1dsfm_matching.py / run_1dsfm_reconstruction.py
(scripts/run_1dsfm_matching.py:38-44, run_1dsfm_reconstruction.py:33-39).

Usage:
  python scripts/run_1dsfm.py <data_root> <workspace> [--scenes Alamo ...]

Expects <data_root>/<scene>/{images/, retrieval.txt, camera_info.txt}.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from xrsfm_tpu import cli

SCENES = [
    "Alamo", "Ellis_Island", "Gendarmenmarkt", "Madrid_Metropolis",
    "Montreal_Notre_Dame", "NYC_Library", "Piazza_del_Popolo", "Piccadilly",
    "Roman_Forum", "Tower_of_London", "Trafalgar", "Union_Square",
    "Vienna_Cathedral", "Yorkminster",
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("data_root")
    ap.add_argument("workspace")
    ap.add_argument("--scenes", nargs="*", default=SCENES)
    ap.add_argument("--matching", default="covisibility",
                    choices=["sequential", "retrieval", "covisibility"])
    a = ap.parse_args()
    for scene in a.scenes:
        root = os.path.join(a.data_root, scene)
        if not os.path.isdir(root):
            print(f"skip {scene}: not found")
            continue
        ws = os.path.join(a.workspace, scene)
        bins = os.path.join(ws, "bins")
        model = os.path.join(ws, "model")
        cli.main([
            "run_matching", os.path.join(root, "images"),
            os.path.join(root, "retrieval.txt"), a.matching, bins,
        ])
        cli.main([
            "rec_1dsfm", bins, os.path.join(root, "camera_info.txt"), model,
        ])


if __name__ == "__main__":
    main()
