"""PNG directory -> mp4 (mirror of Utils/VideoGenerate.py)."""

from __future__ import annotations

import argparse

from ..utils.video import pngs_to_video


def main(argv=None):
    p = argparse.ArgumentParser(description="PNG dir -> mp4")
    p.add_argument("--png_dir", type=str, required=True)
    p.add_argument("--out", type=str, default="./demo.mp4")
    p.add_argument("--fps", type=int, default=4)
    args = p.parse_args(argv)
    print("wrote", pngs_to_video(args.png_dir, args.out, args.fps))


if __name__ == "__main__":
    main()
