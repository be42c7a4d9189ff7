"""Unpack phone RGB capture into per-frame PNGs + camera.txt.

(reference: src/unpack_collect_data.cc:6-54 — the RGBCaptureTool binary
stream: per frame a timestamped JPEG blob; plus a sensor-side camera.txt)

The reference's stream format: repeated records of
  double timestamp, int32 jpeg_size, jpeg_size bytes of JPEG data.
"""

from __future__ import annotations

import os
import struct


def main(input_path: str, output_dir: str):
    img_dir = os.path.join(output_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    stamps = []
    with open(input_path, "rb") as f:
        idx = 0
        while True:
            head = f.read(12)
            if len(head) < 12:
                break
            ts, size = struct.unpack("<di", head)
            blob = f.read(size)
            if len(blob) < size:
                break
            with open(os.path.join(img_dir, f"{idx:06d}.jpg"), "wb") as out:
                out.write(blob)
            stamps.append(ts)
            idx += 1
    with open(os.path.join(output_dir, "timestamps.txt"), "w") as f:
        for ts in stamps:
            f.write(f"{ts}\n")
    print(f"[unpack] {len(stamps)} frames -> {img_dir}", flush=True)
    return len(stamps)
