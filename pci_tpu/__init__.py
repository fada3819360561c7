"""pci_tpu — a TPU-native point-cloud frame-interpolation framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
jlx-dxl/Point-Cloud-Interpolation- (PointINet / ISAPCInet / PolyPCI LiDAR
frame interpolation).  Everything is built for the TPU compilation model:

* static shapes end-to-end (fixed ``npoints`` per config),
* one jitted train / inference step,
* batched flow fan-out (the 4*field FlowNet3D calls of ISAPCInet run as a
  single batched program on the MXU),
* mask-adaptive fusion instead of per-sample python loops,
* ``jax.sharding`` data / point-axis parallelism over a device mesh.

Layer map (mirrors SURVEY.md section 1 of the reference analysis):

=========  =====================================================
``ops``     point-cloud primitive kernels (knn, fps, ball query,
            chamfer, emd, 3-nn interpolation, polynomial fit)
``nn``      neural layers (SetConv, FlowEmbedding, SetUpConv,
            FeaturePropagation, PointsFusion, Transformer, Tnet...)
``models``  FlowNet3D, PointINet, ISAPCInet, PolyPCI
``data``    LiDAR .bin readers + interpolation window samplers
``train``   train/eval loops, schedules, checkpointing, metrics
``parallel``mesh construction, sharded step builders, ring kernels
``utils``   visualization / video (host-side)
=========  =====================================================
"""

__version__ = "0.1.0"
