"""Materialize the synthetic training corpus (idempotent).

Writes the r2 layout under runs/synth_scenes: 10 scenes (8 train /
2 val), 40 frames each, 24k raw points, seed 0 — the corpus behind every
trained checkpoint in results/RESULTS.md.  Pure-host numpy; safe to run
while the TPU is wedged.

  python -m benchmarks.prep_synth [--root runs/synth_scenes]
"""

from __future__ import annotations

import argparse
import os


def prep(root: str = "runs/synth_scenes", n_scenes: int = 10, n_train: int = 8,
         n_frames: int = 40, npts: int = 24000, seed: int = 0) -> None:
    from pci_tpu.data import generate_scenes

    train_txt = os.path.join(root, "train.txt")
    val_txt = os.path.join(root, "val.txt")
    lidar = os.path.join(root, "lidar")
    want = n_scenes * n_frames
    if (
        os.path.exists(train_txt)
        and os.path.exists(val_txt)
        and os.path.isdir(lidar)
        and len([f for f in os.listdir(lidar) if f.endswith(".bin")]) >= want
    ):
        print(f"synth corpus already present under {root}")
        return
    names = generate_scenes(
        root, n_scenes=n_scenes, n_frames=n_frames, npts=npts, seed=seed
    )
    with open(train_txt, "w") as f:
        f.write("\n".join(names[:n_train]) + "\n")
    with open(val_txt, "w") as f:
        f.write("\n".join(names[n_train:]) + "\n")
    print(f"wrote {n_scenes} scenes ({n_train} train / {n_scenes - n_train} val) "
          f"x {n_frames} frames under {root}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--root", type=str, default="runs/synth_scenes")
    args = p.parse_args()
    prep(args.root)
