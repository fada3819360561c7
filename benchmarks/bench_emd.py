"""EMD timing/quality on real LiDAR pairs: auction kernel vs XLA paths.

The reference protocol (PointINet20230424/test.py:67 + models/utils.py:
EMD eps=0.001, 10000 iters) evaluates EMD at full cloud resolution.
This benchmark loads the real nuScenes demo pair and reports, per size:

  * auction_tpu  — blocked Gauss-Seidel Pallas kernel (the ops.emd route
    on TPU at n >= 1024)
  * sinkhorn     — certified entropic bracket (midpoint +- half-width)
  * scipy optimum at sizes where the Hungarian is tractable (<= 4096)

Run: python -m benchmarks.bench_emd [--sizes 1024 4096 16000]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+",
                    default=[1024, 4096, 16000])
    ap.add_argument("--eps", type=float, default=1e-3)
    args = ap.parse_args()

    import jax.numpy as jnp

    from pci_tpu import ops
    from pci_tpu.ops.pallas_kernels.auction_tpu import emd_auction_tpu

    base = "/root/reference/Demos/20230508test/demo_data/Inputs/"
    rng = np.random.default_rng(0)

    def load(path, n):
        raw = np.fromfile(path, np.float32).reshape(-1, 5)[:, :3]
        return raw[rng.choice(len(raw), n, replace=False)]

    for n in args.sizes:
        a = load(base + "key_1.bin", n)
        b = load(base + "key_2.bin", n)
        ja, jb = jnp.asarray(a), jnp.asarray(b)

        want = None
        if n <= 4096:
            from scipy.optimize import linear_sum_assignment

            D = ((a[:, None, :].astype(np.float64) - b[None]) ** 2).sum(-1)
            ri, ci = linear_sum_assignment(D)
            want = float(D[ri, ci].sum()) / n

        # warm compile, then timed run with value fetch (the only
        # trustworthy sync through the axon tunnel — CLAUDE.md)
        d, _, c = emd_auction_tpu(ja, jb, args.eps, 512)
        float(jnp.mean(d))
        t0 = time.perf_counter()
        d, _, c = emd_auction_tpu(jb, ja, args.eps, 512)
        v = float(jnp.mean(d))
        t_auc = time.perf_counter() - t0

        t0 = time.perf_counter()
        s_mid, (s_lb, s_ub) = ops.sinkhorn_emd(
            ja[None], jb[None], return_bounds=True
        )
        s_mid = float(s_mid) / 36.0
        t_snk = time.perf_counter() - t0

        row = (f"n={n}: auction mean={v:.4f} conv={bool(c)} "
               f"t={t_auc:.2f}s | sinkhorn mid={s_mid:.4f} t={t_snk:.2f}s")
        if want is not None:
            row += f" | scipy opt={want:.4f}"
        print(row, flush=True)


if __name__ == "__main__":
    main()
