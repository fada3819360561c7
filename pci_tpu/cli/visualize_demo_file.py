"""Composite viewer for saved demo ``.bin`` clouds.

Mirror of the reference's visualize_demo_file.py:8-129, which composes any
subset of {key frames, ground truths, forward/backward warps, per-model
results} onto one canvas, keys in green/blue and the time sequence through
a fixed color cycle (red, orange, yellow, purple).  The reference switches
compositions by commenting blocks in and out; here each block is a flag:

  python -m pci_tpu.cli.visualize_demo_file \
      --inputs Demos/x/Inputs --results Demos/x/result_field_2 \
      --out composite.png

Any number of ``--results`` directories can be layered (e.g. to compare
field=2 against pointinet output in one frame, like the reference's
side-by-side sessions).
"""

from __future__ import annotations

import argparse
import os

from ..utils.visualize import PcdsVisualizer

# the reference's time-sequence palette: red, orange, yellow, purple
TIME_COLORS = [[0.8, 0, 0], [0.8, 0.4, 0], [0.6, 0.6, 0], [0.6, 0, 0.6]]
KEY1_COLOR = [0, 0.8, 0]  # green
KEY2_COLOR = [0, 0, 0.8]  # blue


def parse_args(argv=None):
    p = argparse.ArgumentParser(description="compose saved demo clouds")
    p.add_argument("--inputs", type=str, default=None,
                   help="dir with key_1.bin / key_2.bin (5-float scans)")
    p.add_argument("--gt", type=str, default=None,
                   help="dir with gt_<t>.bin ground truths (5-float)")
    p.add_argument("--flows", type=str, default=None,
                   help="dir with forward_<i>.bin / backward_<i>.bin warps")
    p.add_argument("--results", type=str, action="append", default=[],
                   help="dir with result_<t>.bin clouds (3-float); repeatable")
    p.add_argument("--times", type=str, default="0.2,0.4,0.6,0.8",
                   help="comma-separated t values for gt/result files")
    p.add_argument("--out", type=str, default="./composite.png")
    p.add_argument("--npoints", type=int, default=30000,
                   help="FPS-downsample each cloud to this many points")
    p.add_argument("--no_downsample", action="store_true")
    p.add_argument("--point_size", type=float, default=4.0)
    p.add_argument("--gt_jitter", type=float, default=0.0,
                   help="gaussian jitter on GT clouds (the reference uses "
                        "0.03 to keep GT visible under overlapping results)")
    p.add_argument("--view_point_json", type=str, default=None)
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    times = [t.strip() for t in args.times.split(",") if t.strip()]
    vis = PcdsVisualizer(
        if_save=True, if_show=False,
        if_down_sample=not args.no_downsample, npoints=args.npoints,
        view_point_json_file=args.view_point_json,
        point_size=args.point_size,
    )

    def maybe(path, reader, color, jitter=0.0):
        if os.path.isfile(path):
            vis.add_to_vis(reader(path, jitter), color)
            return True
        return False

    n_layers = 0
    if args.inputs:
        n_layers += maybe(os.path.join(args.inputs, "key_1.bin"),
                          vis.read_bin_pc_fps_5, KEY1_COLOR)
        n_layers += maybe(os.path.join(args.inputs, "key_2.bin"),
                          vis.read_bin_pc_fps_5, KEY2_COLOR)
    if args.gt:
        for i, t in enumerate(times):
            n_layers += maybe(os.path.join(args.gt, f"gt_{t}.bin"),
                              vis.read_bin_pc_fps_5,
                              TIME_COLORS[i % len(TIME_COLORS)],
                              args.gt_jitter)
    if args.flows:
        for i, step in enumerate(["1", "2", "3"]):
            for name in (f"forward_{step}.bin", f"backward_{step}.bin"):
                n_layers += maybe(os.path.join(args.flows, name),
                                  vis.read_bin_pc_fps_5,
                                  TIME_COLORS[i % len(TIME_COLORS)])
    for rdir in args.results:
        for i, t in enumerate(times):
            n_layers += maybe(os.path.join(rdir, f"result_{t}.bin"),
                              vis.read_bin_pc_fps_3,
                              TIME_COLORS[i % len(TIME_COLORS)])

    if not n_layers:
        raise SystemExit("no clouds found — check --inputs/--gt/--flows/--results")
    vis.show_and_save(args.out)
    print(f"wrote {args.out} ({n_layers} layers)")


if __name__ == "__main__":
    main()
