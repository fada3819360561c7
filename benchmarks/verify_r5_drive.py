"""Round-5 verify drive: real chip, real LiDAR, the changed routes.

1. flowenc megakernel (pl.ds fix) — first real Mosaic lowering, via
   FlowNet3D eval with PCI_TPU_ENC_KERNEL=1 on the demo pair.
2. pn2mid megakernel — TPU on/off parity of Pointnet2FeatureAbstract.
3. chamfer sanity anchor on the demo pair (~0.756).
"""
import os
import time

os.environ.setdefault("PCI_TPU_ENC_KERNEL", "1")
os.environ.setdefault("PCI_TPU_MID_KERNEL", "1")

import numpy as np
import jax
import jax.numpy as jnp

print("backend:", jax.default_backend(), jax.devices())

from pci_tpu.data import lidar
from pci_tpu import ops

d = "/root/reference/Demos/20230508test/demo_data/Inputs"
import glob
files = sorted(glob.glob(d + "/*.bin"))
print("demo files:", [os.path.basename(f) for f in files[:4]])
p1 = lidar.read_subsample(files[0], 5, 16384, np.random.default_rng(0))
p2 = lidar.read_subsample(files[1], 5, 16384, np.random.default_rng(1))
x1 = jnp.asarray(p1[None, :, :3]); x2 = jnp.asarray(p2[None, :, :3])

t0 = time.time()
cd = float(ops.chamfer(x1, x2).mean())
print(f"chamfer(f1,f2) = {cd:.4f}  ({time.time()-t0:.1f}s)")
cd_self = float(ops.chamfer(x1, x1).mean())
print(f"chamfer(f1,f1) = {cd_self:.2e}")
assert cd_self < 1e-4

# --- flowenc/flowmid megakernel path: FlowNet3D eval fwd ---
from pci_tpu.models import FlowNet3D
m = FlowNet3D()
with jax.default_device(jax.devices("cpu")[0]):
    pass
print("init flownet3d (jit, tpu)...")
t0 = time.time()
v = jax.jit(lambda: m.init(jax.random.key(0), x1, x2, jnp.zeros((1, 16384, 0)), jnp.zeros((1, 16384, 0)), train=False))()
print(f"init done {time.time()-t0:.1f}s")
t0 = time.time()
flow = m.apply(v, x1, x2, jnp.zeros((1, 16384, 0)), jnp.zeros((1, 16384, 0)), train=False)
flow_np = np.asarray(flow)
print(f"flownet3d fwd (ENC+MID kernels) {time.time()-t0:.1f}s  "
      f"flow norm mean={np.linalg.norm(flow_np, axis=-1).mean():.3f} finite={np.isfinite(flow_np).all()}")
assert np.isfinite(flow_np).all()

# XLA reference arm
os.environ["PCI_TPU_ENC_KERNEL"] = "0"
os.environ["PCI_TPU_MID_KERNEL"] = "0"
import pci_tpu.models.flownet3d as f3
flow_ref = np.asarray(m.apply(v, x1, x2, jnp.zeros((1, 16384, 0)), jnp.zeros((1, 16384, 0)), train=False))
rel = np.abs(flow_np - flow_ref).max() / (np.abs(flow_ref).max() + 1e-9)
print(f"enc/mid kernel vs XLA max rel diff = {rel:.2e}")
assert rel < 5e-3, rel

# --- pn2mid megakernel: TPU on/off parity ---
from pci_tpu.nn.pointnet2 import Pointnet2FeatureAbstract
ff = Pointnet2FeatureAbstract(64)
xyzs = x1[:, :4096]
vv = jax.jit(lambda: ff.init(jax.random.key(1), xyzs, train=False))()
os.environ["PCI_TPU_PN2_KERNEL"] = "1"
t0 = time.time()
a = np.asarray(ff.apply(vv, xyzs, train=False))
print(f"pn2mid kernel fwd {time.time()-t0:.1f}s")
os.environ["PCI_TPU_PN2_KERNEL"] = "0"
b = np.asarray(ff.apply(vv, xyzs, train=False))
rel = np.abs(a - b).max() / (np.abs(b).max() + 1e-9)
print(f"pn2mid kernel vs XLA max rel diff = {rel:.2e} finite={np.isfinite(a).all()}")
assert np.isfinite(a).all()
assert rel < 5e-3, rel

print("VERIFY OK")
