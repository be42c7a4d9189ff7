"""Command-line entry points mirroring the reference's 7 binaries.

(reference: CMakeLists.txt:160-181 — run_matching, run_reconstruction,
run_triangulation, rec_kitti, rec_1dsfm, estimate_scale,
unpack_collect_data)

Usage: python -m xrsfm_tpu.cli <command> [args...]
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None):
    from . import enable_compilation_cache

    enable_compilation_cache()
    argv = argv if argv is not None else sys.argv[1:]
    ap = argparse.ArgumentParser(prog="xrsfm_tpu")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run_matching", help="matching stage")
    p.add_argument("images_dir")
    p.add_argument("retrieval_path")
    p.add_argument("matching_type", choices=["sequential", "retrieval", "covisibility"])
    p.add_argument("output_dir")

    p = sub.add_parser("run_reconstruction", help="incremental reconstruction")
    p.add_argument("bin_dir")
    p.add_argument("camera_txt")
    p.add_argument("output_dir")
    p.add_argument("--init_id1", type=int, default=-1)
    p.add_argument("--init_id2", type=int, default=-1)

    p = sub.add_parser("run_triangulation", help="triangulate with known poses")
    p.add_argument("bin_dir")
    p.add_argument("model_dir")
    p.add_argument("output_dir")

    p = sub.add_parser("rec_kitti", help="KITTI odometry reconstruction")
    p.add_argument("bin_dir")
    p.add_argument("seq_name")
    p.add_argument("output_dir")
    p.add_argument("--timestamp_path", default="")

    p = sub.add_parser("rec_1dsfm", help="1DSfM unordered scene reconstruction")
    p.add_argument("bin_dir")
    p.add_argument("camera_info_path")
    p.add_argument("output_dir")

    p = sub.add_parser("estimate_scale", help="AprilTag metric scale")
    p.add_argument("images_dir")
    p.add_argument("model_dir")
    p.add_argument("--tag_length", type=float, default=0.113)

    p = sub.add_parser("unpack_collect_data", help="unpack phone capture")
    p.add_argument("input_path")
    p.add_argument("output_dir")

    args = ap.parse_args(argv)

    if args.cmd == "run_matching":
        from .pipelines import run_matching as M

        M.main(args.images_dir, args.retrieval_path, args.matching_type, args.output_dir)
    elif args.cmd == "run_reconstruction":
        from .pipelines import run_reconstruction as R

        R.main(args.bin_dir, args.camera_txt, args.output_dir,
               args.init_id1, args.init_id2)
    elif args.cmd == "run_triangulation":
        from .pipelines import run_triangulation as T

        T.main(args.bin_dir, args.model_dir, args.output_dir)
    elif args.cmd == "rec_kitti":
        from .pipelines import rec_kitti as K

        K.main(args.bin_dir, args.seq_name, args.output_dir, args.timestamp_path)
    elif args.cmd == "rec_1dsfm":
        from .pipelines import rec_1dsfm as U

        U.main(args.bin_dir, args.camera_info_path, args.output_dir)
    elif args.cmd == "estimate_scale":
        from .pipelines import estimate_scale as S

        S.main(args.images_dir, args.model_dir, args.tag_length)
    elif args.cmd == "unpack_collect_data":
        from .pipelines import unpack_collect_data as UC

        UC.main(args.input_path, args.output_dir)


if __name__ == "__main__":
    main()
