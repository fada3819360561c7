"""PNG sequence -> mp4 (capability mirror of Utils/VideoGenerate.py:1-19)."""

from __future__ import annotations

import glob
import os


def pngs_to_video(png_dir: str, out_path: str, fps: int = 4):
    import cv2

    paths = sorted(glob.glob(os.path.join(png_dir, "*.png")))
    if not paths:
        raise FileNotFoundError(f"no PNGs under {png_dir}")
    first = cv2.imread(paths[0])
    h, w = first.shape[:2]
    fourcc = cv2.VideoWriter_fourcc(*"mp4v")
    writer = cv2.VideoWriter(out_path, fourcc, fps, (w, h))
    for p in paths:
        img = cv2.imread(p)
        if img.shape[:2] != (h, w):
            img = cv2.resize(img, (w, h))
        writer.write(img)
    writer.release()
    return out_path
