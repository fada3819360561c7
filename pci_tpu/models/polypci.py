"""PolyPCI — per-point polynomial trajectory fitting.

Behavioral spec from /root/reference/PolyPCI/Models/Models_V1.py:92-222:
chain 1-NN "rebuilt" correspondences ring by ring away from the key frame,
collect per-point trajectories over the 2*field+1 frame window, fit a
degree-d polynomial per point per axis, evaluate at t.

TPU redesign: the reference's per-sample host round trip
(``np.polyfit`` + sklearn, Models_V1.py:191-219) becomes one batched
on-device Vandermonde least-squares (ops.polyfit_eval_xyz); the forward
and backward chains of each ring run as a single batched FlowNet3D call.

Trajectory order (must match the dataset's T_list):
``[key, fwd_ring1, bwd_ring1, fwd_ring2, bwd_ring2, ...]``
(Models_V1.py:142-180 appends key, then per ring forward then backward).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from .. import ops
from .flownet3d import FlowNet3D


def rebuild(ref_pcd, pcd):
    """Snap each warped point to its nearest neighbor in a real frame
    (Models_V1.py:102-114, K=1)."""
    idx = ops.nearest_neighbor_idx(ref_pcd, pcd)
    return ops.index_points(pcd, idx)


class PolyPCI(nn.Module):
    field: int
    degree: int
    freeze_flow: bool = True

    @nn.compact
    def __call__(
        self, forward_pcds, key_pcd, backward_pcds, t, T_list, ini_feature,
        *, train: bool = False, momentum=0.1,
    ):
        """forward_pcds/backward_pcds: ``field * [B,N,3]``,
        key_pcd ``[B,N,3]``, t ``[B]`` in [-field, field],
        T_list ``[B, 2*field+1]`` frame times (trajectory order),
        ini_feature ``[B,N,3]`` zeros -> interpolated cloud ``[B,N,3]``."""
        B, N, _ = ini_feature.shape
        flow = FlowNet3D(name="flow")
        flow_train = train and not self.freeze_flow

        traj = [key_pcd]
        prev_f, prev_b = key_pcd, key_pcd
        for i in range(self.field):
            # sequential flow calls: narrow calls pipeline better than one
            # wide batched pass on v5e (see ISAPCInet)
            ff = flow(prev_f, forward_pcds[i], ini_feature, ini_feature,
                      train=flow_train, momentum=momentum)
            fb = flow(prev_b, backward_pcds[i], ini_feature, ini_feature,
                      train=flow_train, momentum=momentum)
            if self.freeze_flow:
                ff = lax.stop_gradient(ff)
                fb = lax.stop_gradient(fb)
            prev_f = rebuild(prev_f + ff, forward_pcds[i])
            prev_b = rebuild(prev_b + fb, backward_pcds[i])
            traj.append(prev_f)
            traj.append(prev_b)

        trajs = jnp.stack(traj, axis=1)  # [B, 2*field+1, N, 3]
        return ops.polyfit_eval_xyz(
            T_list.astype(jnp.float32), trajs, self.degree, t.astype(jnp.float32)
        )
