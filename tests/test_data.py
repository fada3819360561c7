"""Data pipeline tests: readers against the reference's shipped scans,
window protocols against hand-built synthetic scenes, native FPS vs the
device FPS oracle."""

import os

import numpy as np
import pytest

from pci_tpu import data as D
from pci_tpu.data import native

REF_INPUTS = "/root/reference/Demos/20230508test/demo_data/Inputs"
REF_KITTI = "/root/reference/PointINet20230424/data/demo_data/original"


class TestReaders:
    @pytest.mark.skipif(not os.path.isdir(REF_INPUTS), reason="no reference data")
    def test_nuscenes_bin(self):
        pts = D.read_nuscenes_bin(os.path.join(REF_INPUTS, "key_1.bin"))
        assert pts.shape == (34688, 5)
        assert np.isfinite(pts[:, :3]).all()

    @pytest.mark.skipif(not os.path.isdir(REF_KITTI), reason="no reference data")
    def test_kitti_bin(self):
        pts = D.read_kitti_bin(os.path.join(REF_KITTI, "000000.bin"))
        assert pts.shape[1] == 4
        assert pts.shape[0] == 124670  # documented in SURVEY.md section 2.5

    def test_random_subsample_pads_short_clouds(self):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        out = D.random_subsample(pts, 32, rng)
        assert out.shape == (32, 3)


class TestNativeFps:
    def test_native_matches_greedy_semantics(self):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((200, 3)).astype(np.float32)
        idx = native.fps_indices(pts, 32, 0)
        # independent greedy oracle
        from tests.reference_impls import fps_np

        want = fps_np(pts[None], 32, 0)[0]
        np.testing.assert_array_equal(idx, want)

    def test_native_lib_builds(self):
        assert native.have_native(), "C++ native lib failed to build"

    def test_fps_subsample_cache_hits_and_matches(self, tmp_path, monkeypatch):
        """The content-keyed FPS index cache is bit-identical to the
        uncached path, skips the native kernel on a hit, and persists
        through PCI_TPU_FPS_CACHE_DIR across fresh in-memory caches."""
        from pci_tpu.data import lidar

        rng = np.random.default_rng(3)
        pts = rng.standard_normal((300, 4)).astype(np.float32)
        monkeypatch.setattr(lidar, "_fps_cache", {})
        monkeypatch.setenv("PCI_TPU_FPS_CACHE_DIR", str(tmp_path / "fpscache"))
        calls = []
        real = lidar.native.fps_indices
        monkeypatch.setattr(
            lidar.native, "fps_indices",
            lambda *a, **k: (calls.append(1), real(*a, **k))[1],
        )
        monkeypatch.setenv("PCI_TPU_FPS_CACHE_MAX", "0")
        want = lidar.fps_subsample(pts, 64)
        assert len(calls) == 1  # cache disabled: native ran
        monkeypatch.setenv("PCI_TPU_FPS_CACHE_MAX", "8192")
        got1 = lidar.fps_subsample(pts, 64)
        got2 = lidar.fps_subsample(pts, 64)
        assert len(calls) == 2  # one miss, then a memory hit
        np.testing.assert_array_equal(got1, want)
        np.testing.assert_array_equal(got2, want)
        # fresh process-level cache: disk satisfies the miss
        monkeypatch.setattr(lidar, "_fps_cache", {})
        got3 = lidar.fps_subsample(pts, 64)
        assert len(calls) == 2  # no new native call
        np.testing.assert_array_equal(got3, want)
        # different content is a different key
        lidar.fps_subsample(pts + 1.0, 64)
        assert len(calls) == 3

    def test_voxel_downsample(self):
        rng = np.random.default_rng(0)
        pts = (rng.standard_normal((500, 3)) * 5).astype(np.float32)
        idx = native.voxel_downsample_indices(pts, 1.0)
        assert 0 < len(idx) <= 500
        kept = pts[idx]
        # kept points pairwise occupy distinct voxels
        vox = np.floor(kept / 1.0 + 1e6).astype(np.int64)
        assert len(np.unique(vox, axis=0)) == len(kept)


def _write_scene(tmp_path, scene, n_frames, npts=100, width=5):
    rng = np.random.default_rng(42)
    os.makedirs(tmp_path / "lidar", exist_ok=True)
    os.makedirs(tmp_path / "split", exist_ok=True)
    lines = []
    for i in range(n_frames):
        fn = f"{scene}_frame_{i:03d}.bin"
        pts = (rng.standard_normal((npts, width)) * 2).astype(np.float32)
        pts.tofile(tmp_path / "lidar" / fn)
        lines.append(f"{fn} {i * 0.05:.6f}")
    with open(tmp_path / "split" / f"{scene}.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    with open(tmp_path / "scenes.txt", "w") as f:
        f.write(scene + "\n")


class TestNuscenesInterpolation:
    def test_window_protocol(self, tmp_path):
        _write_scene(tmp_path, "scene-0001", 40)
        ds = D.NuscenesInterpolationDataset(
            root=str(tmp_path / "lidar"),
            scenes_list=str(tmp_path / "scenes.txt"),
            scene_split_lib=str(tmp_path / "split"),
            field=2, npoints=64, interval=3, sample_method="random",
        )
        assert len(ds) > 0
        item = ds[0]
        assert len(item["forward"]) == 2
        assert len(item["keys"]) == 2
        assert len(item["backward"]) == 2
        assert item["gt"].shape == (64, 3)
        assert 0.0 < float(item["t"]) < 1.0
        # uniform frame times at interval=3: first window bias=1 -> t=1/3
        assert float(ds[0]["t"]) == pytest.approx(1 / 3, rel=1e-4)

    def test_window_count_sequential(self, tmp_path):
        _write_scene(tmp_path, "scene-0002", 40)
        ds = D.NuscenesInterpolationDataset(
            root=str(tmp_path / "lidar"),
            scenes_list=str(tmp_path / "scenes.txt"),
            scene_split_lib=str(tmp_path / "split"),
            field=1, npoints=32, interval=5, sample_method="random",
        )
        # reference protocol: (interval-1) samples per key-pair stride
        # key pairs: front=5, back=10 -> advance while back + 5 < 40
        assert len(ds) % 4 == 0


class TestPolyPCIDataset:
    def test_T_ordering_matches_trajectory_stack(self, tmp_path):
        _write_scene(tmp_path, "scene-0003", 40)
        ds = D.PolyPCIDataset(
            root=str(tmp_path / "lidar"),
            scenes_list=str(tmp_path / "scenes.txt"),
            scene_split_lib=str(tmp_path / "split"),
            field=2, npoints=32, interval=3, sample_method="random",
        )
        item = ds[0]
        T = item["T"]
        assert T.shape == (5,)
        # order: key(0), fwd1(-1), bwd1(+1), fwd2(-2), bwd2(+2) in
        # key-interval units (uniform timestamps here)
        np.testing.assert_allclose(T, [0.0, -1.0, 1.0, -2.0, 2.0], atol=1e-5)
        # t range includes extrapolation
        ts = [float(ds[i]["t"]) for i in range(min(len(ds), 13))]
        assert min(ts) < 0 or max(ts) > 1 or 0.0 in ts


class TestKittiTriplets:
    def test_protocol(self, tmp_path):
        rng = np.random.default_rng(0)
        os.makedirs(tmp_path / "velodyne")
        n_frames = 20
        for i in range(n_frames):
            (rng.standard_normal((150, 4)).astype(np.float32)).tofile(
                tmp_path / "velodyne" / f"{i:06d}.bin"
            )
        with open(tmp_path / "times.txt", "w") as f:
            f.write("\n".join(f"{i * 0.1:.6f}" for i in range(n_frames)))
        ds = D.KittiInterpolationDataset(
            str(tmp_path), npoints=64, interval=5, train=False
        )
        item = ds[0]
        assert item["ini_pc"].shape == (64, 4)  # intensity kept
        assert 0.0 < float(item["t"]) < 1.0
        # eval mode: interval-1 triplets per stride
        ds_train = D.KittiInterpolationDataset(
            str(tmp_path), npoints=64, interval=5, train=True
        )
        assert len(ds) == len(ds_train) * 4


class TestSynthGenerator:
    def test_layout_and_learnable_motion(self, tmp_path):
        import jax.numpy as jnp

        from pci_tpu import ops

        names = D.generate_scenes(
            str(tmp_path), n_scenes=2, n_frames=12, npts=4000, seed=3
        )
        assert len(names) == 2
        ds = D.NuscenesInterpolationDataset(
            root=str(tmp_path / "lidar"),
            scenes_list=str(tmp_path / "scenes.txt"),
            scene_split_lib=str(tmp_path / "split"),
            field=1, npoints=2048, interval=3, sample_method="random",
        )
        assert len(ds) > 0
        item = ds[0]
        k1, k2 = item["keys"]
        gt = item["gt"]
        assert k1.shape == (2048, 3) and gt.shape == (2048, 3)
        # motion is real: identity (key1 as prediction) has CD clearly
        # above the sensor-noise floor, and gt sits between the keys
        cd_id = float(ops.chamfer_distance(jnp.asarray(k1)[None], jnp.asarray(gt)[None]))
        cd_keys = float(ops.chamfer_distance(jnp.asarray(k1)[None], jnp.asarray(k2)[None]))
        assert cd_id > 1e-3
        assert cd_id < cd_keys  # gt is an intermediate frame


class TestLoader:
    def test_collate_and_batching(self, tmp_path):
        _write_scene(tmp_path, "scene-0004", 40)
        ds = D.NuscenesInterpolationDataset(
            root=str(tmp_path / "lidar"),
            scenes_list=str(tmp_path / "scenes.txt"),
            scene_split_lib=str(tmp_path / "split"),
            field=1, npoints=32, interval=3, sample_method="random",
        )
        loader = D.Loader(ds, batch_size=2, shuffle=True, num_workers=2)
        batches = list(loader)
        assert len(batches) == len(ds) // 2
        b = batches[0]
        assert b["keys"][0].shape == (2, 32, 3)
        assert b["t"].shape == (2,)
        assert b["gt"].shape == (2, 32, 3)


class TestNativeIO:
    """Native fused load+subsample (native/pci_native.cpp pci_load_scan)."""

    def _scan(self, tmp_path, n=1000, width=5):
        rng = np.random.default_rng(0)
        pts = rng.standard_normal((n, width)).astype(np.float32)
        p = tmp_path / "scan.bin"
        pts.tofile(p)
        return str(p), pts

    def test_load_scan_no_replacement_and_deterministic(self, tmp_path):
        from pci_tpu.data import native

        if not native.have_native():
            pytest.skip("no native toolchain")
        path, pts = self._scan(tmp_path)
        a = native.load_scan(path, 5, 256, seed=7)
        b = native.load_scan(path, 5, 256, seed=7)
        c = native.load_scan(path, 5, 256, seed=8)
        np.testing.assert_array_equal(a, b)
        assert not np.array_equal(a, c)
        # every row comes from the file, no duplicates (n >= npoints)
        rows = {tuple(r) for r in np.round(a, 6).tolist()}
        assert len(rows) == 256
        file_rows = {tuple(r) for r in np.round(pts, 6).tolist()}
        assert rows <= file_rows

    def test_load_scan_wrap_pad_short(self, tmp_path):
        from pci_tpu.data import native

        if not native.have_native():
            pytest.skip("no native toolchain")
        path, pts = self._scan(tmp_path, n=10)
        a = native.load_scan(path, 5, 64, seed=3)
        assert a.shape == (64, 5)
        # first 10 rows are the file in order (reference wrap protocol)
        np.testing.assert_array_equal(a[:10], pts)
        file_rows = {tuple(r) for r in np.round(pts, 6).tolist()}
        assert {tuple(r) for r in np.round(a, 6).tolist()} <= file_rows

    def test_read_subsample_env_gate(self, tmp_path, monkeypatch):
        from pci_tpu.data.lidar import read_subsample

        path, pts = self._scan(tmp_path)
        rng1 = np.random.default_rng(5)
        rng2 = np.random.default_rng(5)
        monkeypatch.delenv("PCI_TPU_NATIVE_IO", raising=False)
        off = read_subsample(path, 5, 128, rng1, channels=3)
        monkeypatch.setenv("PCI_TPU_NATIVE_IO", "1")
        on = read_subsample(path, 5, 128, rng2, channels=3)
        assert off.shape == on.shape == (128, 3)
        file3 = {tuple(r) for r in np.round(pts[:, :3], 6).tolist()}
        for arr in (off, on):
            assert {tuple(r) for r in np.round(arr, 6).tolist()} <= file3
