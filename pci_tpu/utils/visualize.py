"""Point-cloud visualization (host-side).

Capability mirror of the reference's PcdsVisualizer
(Utils/Visualize.py:59-100): accumulate colored clouds, render a
screenshot.  Backend: Open3D offscreen if installed, else matplotlib 3D
scatter (always available in this image).
"""

from __future__ import annotations

import numpy as np

try:
    import open3d as _o3d  # optional
except Exception:  # pragma: no cover
    _o3d = None


class PcdsVisualizer:
    """Accumulate (cloud, color) layers and render to PNG and/or screen."""

    def __init__(
        self,
        if_save: bool = True,
        if_show: bool = False,
        view_point_json_file: str | None = None,
        point_size: float = 1.0,
        if_down_sample: bool = False,
        npoints: int = 12000,
    ):
        self.if_save = if_save
        self.if_show = if_show
        self.point_size = point_size
        self.view_point_json_file = view_point_json_file
        self.if_down_sample = if_down_sample
        self.npoints = npoints
        self.layers: list[tuple[np.ndarray, tuple]] = []

    def add_to_vis(self, points, color):
        """points: ``[N, 3]`` array (or anything np.asarray handles)."""
        pts = np.asarray(points, np.float32).reshape(-1, 3)
        self.layers.append((pts, tuple(color)))

    def _read_bin(self, path, width, jitter):
        """Load a KITTI-style ``.bin`` (fp32, ``width`` floats per point),
        optional gaussian jitter, optional FPS downsample to ``npoints``
        (reference Utils/Visualize.py:35-57)."""
        pts = np.fromfile(path, np.float32).reshape(-1, width)[:, :3].copy()
        if jitter:
            pts += np.random.normal(-jitter, jitter, size=pts.shape).astype(
                np.float32
            )
        if self.if_down_sample and len(pts) > self.npoints:
            from ..data.native import fps_indices

            pts = pts[fps_indices(pts, self.npoints)]
        return pts

    def read_bin_pc_fps_5(self, path, jitter=0):
        """5-float/point scan (x y z intensity ring), like the raw inputs."""
        return self._read_bin(path, 5, jitter)

    def read_bin_pc_fps_3(self, path, jitter=0):
        """3-float/point cloud, like saved interpolation results."""
        return self._read_bin(path, 3, jitter)

    # the reference's converters accept torch tensors; here numpy/JAX both
    # work through np.asarray
    def convert_to_o3d_from_tensor(self, points):
        return np.asarray(points, np.float32).reshape(-1, 3)

    def convert_to_o3d_from_numpy(self, points):
        return np.asarray(points, np.float32).reshape(-1, 3)

    def show_and_save(self, path: str | None):
        if _o3d is not None:
            self._render_open3d(path)
        else:
            self._render_matplotlib(path)

    def clear(self):
        self.layers = []

    def _render_matplotlib(self, path):
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure(figsize=(12, 12), facecolor="black")
        ax = fig.add_subplot(projection="3d", facecolor="black")
        for pts, color in self.layers:
            ax.scatter(
                pts[:, 0], pts[:, 1], pts[:, 2],
                s=self.point_size * 0.3, c=[color], linewidths=0,
            )
        ax.set_axis_off()
        ax.view_init(elev=35, azim=-90)
        # equal aspect over the data bounds
        all_pts = np.concatenate([p for p, _ in self.layers], axis=0)
        center = all_pts.mean(axis=0)
        radius = float(np.abs(all_pts - center).max()) or 1.0
        ax.set_xlim(center[0] - radius, center[0] + radius)
        ax.set_ylim(center[1] - radius, center[1] + radius)
        ax.set_zlim(center[2] - radius, center[2] + radius)
        if self.if_save and path:
            fig.savefig(path, dpi=100, bbox_inches="tight", facecolor="black")
        if self.if_show:  # pragma: no cover
            plt.show()
        plt.close(fig)

    def _render_open3d(self, path):  # pragma: no cover - needs open3d
        vis = _o3d.visualization.Visualizer()
        vis.create_window(visible=self.if_show)
        for pts, color in self.layers:
            pcd = _o3d.geometry.PointCloud()
            pcd.points = _o3d.utility.Vector3dVector(pts.astype(np.float64))
            pcd.paint_uniform_color(list(color))
            vis.add_geometry(pcd)
        opt = vis.get_render_option()
        opt.point_size = self.point_size
        opt.background_color = np.zeros(3)
        vis.poll_events()
        vis.update_renderer()
        if self.if_save and path:
            vis.capture_screen_image(path)
        vis.destroy_window()
