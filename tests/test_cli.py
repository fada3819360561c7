"""End-to-end CLI tests on synthetic scenes (tiny shapes, hermetic CPU).

Drives the actual entry points: train -> checkpoint -> test -> demo ->
heatmap, the way a user of the reference would run its scripts.
"""

import os
import sys

import numpy as np
import pytest


def make_scene(tmp_path, scene="scene-0001", n_frames=40, npts=120):
    rng = np.random.default_rng(3)
    (tmp_path / "lidar").mkdir(exist_ok=True)
    (tmp_path / "split").mkdir(exist_ok=True)
    lines = []
    base = (rng.standard_normal((npts, 3)) * 3).astype(np.float32)
    for i in range(n_frames):
        fn = f"{scene}_frame_{i:03d}.bin"
        # smooth drift so interpolation is learnable
        xyz = base + np.asarray([0.05 * i, 0.0, 0.0], np.float32)
        pts = np.concatenate(
            [xyz, np.zeros((npts, 2), np.float32)], axis=1
        )
        pts.tofile(tmp_path / "lidar" / fn)
        lines.append(f"{fn} {i * 0.05:.6f}")
    (tmp_path / "split" / f"{scene}.txt").write_text("\n".join(lines) + "\n")
    (tmp_path / "scenes.txt").write_text(scene + "\n")


@pytest.fixture(scope="module")
def scene_dir(tmp_path_factory):
    p = tmp_path_factory.mktemp("scene")
    make_scene(p)
    return p


def common_args(scene_dir, extra):
    return [
        "--root", str(scene_dir / "lidar"),
        "--scenes_list", str(scene_dir / "scenes.txt"),
        "--scene_split_lib", str(scene_dir / "split"),
        "--npoints", "64", "--interval", "3", "--field", "1",
        "--sample_method", "random",
        "--ff_out_c", "32", "--tr_out_c", "32",
    ] + extra


class TestTrainCli:
    def test_train_then_test_then_demo(self, scene_dir, tmp_path):
        from pci_tpu.cli import train as train_cli

        save_dir = str(tmp_path / "ckpts")
        log_dir = str(tmp_path / "logs")
        train_cli.main(common_args(scene_dir, [
            "--epochs", "2", "--batch_size", "2",
            "--save_dir", save_dir, "--log_dir", log_dir,
            "--init_lr", "0.001",
        ]))
        # best checkpoint with loss-stamped name exists
        from pci_tpu.train import BestKeeper

        best = BestKeeper.best_path(save_dir, prefix="field_1")
        assert best is not None, os.listdir(save_dir)
        # metrics were logged
        assert os.path.exists(os.path.join(log_dir, "metrics.jsonl"))

        # resume picks up the full-state checkpoint and continues
        train_cli.main(common_args(scene_dir, [
            "--epochs", "3", "--batch_size", "2",
            "--save_dir", save_dir, "--log_dir", log_dir,
            "--init_lr", "0.001", "--resume",
        ]))

        # eval with the trained checkpoint
        from pci_tpu.cli import test as test_cli

        mean_cd = test_cli.main(common_args(scene_dir, [
            "--pretrained_self_model", best,
            "--log_dir", str(tmp_path / "logs_eval"),
        ]))
        assert np.isfinite(mean_cd)

    def test_polypci_cli(self, scene_dir, tmp_path):
        from pci_tpu.cli import train_polypci

        # just the eval path over a few windows (degree 1)
        import pci_tpu.cli.train_polypci as mod

        argv = [
            "--root", str(scene_dir / "lidar"),
            "--scenes_list", str(scene_dir / "scenes.txt"),
            "--scene_split_lib", str(scene_dir / "split"),
            "--npoints", "48", "--interval", "3", "--field", "1",
            "--degree", "1", "--sample_method", "random",
            "--log_dir", str(tmp_path / "logs_poly"),
        ]
        # monkeypatch-free: just run it; window count is small for 40 frames
        mod.main(argv)


class TestVisualizationCli:
    def test_hot_map(self, tmp_path):
        from pci_tpu.cli import visualize_hot_map

        visualize_hot_map.main([
            "--field", "2", "--out_dir", str(tmp_path), "--steps", "5",
        ])
        assert (tmp_path / "field_2.png").exists()

    def test_visualizer_renders_png(self, tmp_path):
        from pci_tpu.utils import PcdsVisualizer

        rng = np.random.default_rng(0)
        vis = PcdsVisualizer(if_save=True, if_show=False)
        vis.add_to_vis(rng.standard_normal((100, 3)), [1, 0, 0])
        vis.add_to_vis(rng.standard_normal((100, 3)), [0, 1, 0])
        out = str(tmp_path / "shot.png")
        vis.show_and_save(out)
        assert os.path.getsize(out) > 1000

    def test_visualize_demo_file_composite(self, tmp_path):
        """Composition variants of the reference's visualize_demo_file.py:
        keys + GT + two result dirs layered onto one canvas."""
        from pci_tpu.cli import visualize_demo_file

        rng = np.random.default_rng(0)
        inputs = tmp_path / "Inputs"
        res_a = tmp_path / "result_field_2"
        res_b = tmp_path / "result_pointinet"
        for d in (inputs, res_a, res_b):
            d.mkdir()
        for name in ("key_1.bin", "key_2.bin"):
            pts = rng.standard_normal((200, 5)).astype(np.float32)
            pts.tofile(str(inputs / name))
        for t in ("0.2", "0.4"):
            rng.standard_normal((150, 5)).astype(np.float32).tofile(
                str(inputs / f"gt_{t}.bin"))
            for d in (res_a, res_b):
                rng.standard_normal((150, 3)).astype(np.float32).tofile(
                    str(d / f"result_{t}.bin"))

        out = str(tmp_path / "composite.png")
        visualize_demo_file.main([
            "--inputs", str(inputs), "--gt", str(inputs),
            "--results", str(res_a), "--results", str(res_b),
            "--times", "0.2,0.4", "--gt_jitter", "0.03",
            "--npoints", "100", "--out", out,
        ])
        assert os.path.getsize(out) > 1000

    def test_metrics_csv_export_feeds_charts(self, tmp_path):
        """metrics.jsonl -> wandb-style CSV -> draw_charts (VERDICT item 9)."""
        from pci_tpu.cli import draw_charts
        from pci_tpu.train.metrics import MetricLogger, metrics_to_csv

        log = MetricLogger(str(tmp_path))
        for i in range(12):
            log.log({"cd": 0.5 + 0.01 * i, "t": (i % 4 + 1) / 5}, step=i)
        log.log({"loss": 1.0}, step=99)  # heterogeneous keys
        log.close()
        csv_path = metrics_to_csv(str(tmp_path / "metrics.jsonl"))
        head = open(csv_path).readline()
        assert "cd" in head and "t" in head and "loss" in head
        out = str(tmp_path / "chart.png")
        draw_charts.main(["--metrics", csv_path, "--bins", "4", "--out", out])
        assert os.path.getsize(out) > 1000

    def test_video_generate(self, tmp_path):
        from pci_tpu.utils import PcdsVisualizer
        from pci_tpu.utils.video import pngs_to_video

        rng = np.random.default_rng(0)
        png_dir = tmp_path / "pngs"
        png_dir.mkdir()
        for i in range(3):
            vis = PcdsVisualizer(if_save=True, if_show=False)
            vis.add_to_vis(rng.standard_normal((50, 3)) + i * 0.1, [0, 1, 0])
            vis.show_and_save(str(png_dir / f"f{i}.png"))
        out = pngs_to_video(str(png_dir), str(tmp_path / "demo.mp4"), fps=2)
        assert os.path.getsize(out) > 1000


class TestBenchDegradation:
    """bench.py must emit one parseable JSON line when the backend is
    unavailable instead of a traceback or an infinite hang (VERDICT r3
    item 2; the r3 driver bench died with rc=1 + raw traceback)."""

    def _run_bench(self, env_extra):
        import json
        import subprocess

        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        env = dict(os.environ, **env_extra)
        r = subprocess.run(
            [sys.executable, os.path.join(repo, "bench.py")],
            capture_output=True, text=True, timeout=180, env=env, cwd=repo,
        )
        lines = [ln for ln in r.stdout.strip().splitlines() if ln.startswith("{")]
        assert lines, f"no JSON line in stdout: {r.stdout!r} {r.stderr[-500:]!r}"
        return r.returncode, json.loads(lines[-1])

    def test_crash_triggers_conservative_retry(self):
        """A crash in the default config must spawn ONE conservative
        retry (r4 kernel routes off) and forward its JSON annotated with
        the retry reason.  The hook crashes both attempts, so the final
        line carries the child's error plus the parent's annotations —
        the retry plumbing is what's under test."""
        rc, rec = self._run_bench({
            "PCI_TPU_BENCH_SKIP_PROBE": "1",
            "PCI_TPU_BENCH_SIMULATE_CRASH": "1",
        })
        assert rc == 1
        assert rec.get("config", "").startswith("conservative")
        assert "RuntimeError" in rec.get("retry_reason", "")
        assert "error" in rec

    def test_backend_probe_failure_is_one_json_line(self):
        # Poison the probe subprocess: an unimportable sitecustomize dir on
        # PYTHONPATH makes `import jax` die instantly in the child, which
        # simulates a dead backend without needing a wedged chip.
        rc, rec = self._run_bench({
            "PCI_TPU_BENCH_PROBE_TIMEOUT": "30",
            "PYTHONPATH": "/nonexistent_axon_site",
            "JAX_PLATFORMS": "cuda",  # child: no such backend -> rc!=0
        })
        assert rc == 1
        assert rec["metric"] == "frames_per_sec_16k"
        assert rec["value"] == 0.0
        assert "error" in rec and "backend_probe" in rec["error"]
        assert "probes" in rec and "stages_passed" in rec["probes"]
