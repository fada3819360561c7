"""Headline benchmark: interpolated frames/s at 16k-pt scan pairs.

Runs PointINet (the reference's headline model, paper Table 6) on the real
nuScenes scan pair shipped with the reference, on whatever accelerator JAX
provides (the driver runs this on one real TPU chip).

Prints ONE JSON line:
  {"metric": "frames_per_sec_16k", "value": N, "unit": "frames/s",
   "vs_baseline": N / 4.909, "cd_val": ..., "cd_identity": ...}
Baseline: the PointINet paper's RTX 2060 single-frame rate at 16,384 pts
(203.7 ms/frame = 4.909 fps, BASELINE.md).

ACCURACY GATE (VERDICT r2 item 4): before timing, the TRAINED checkpoint
(results/checkpoints/pointinet_synth16k) is evaluated on deterministic
held-out synthetic windows (generated on the fly — hermetic, no data
mounts needed) and the bench HARD-FAILS unless the model beats the
identity baseline with margin.  A kernel "optimization" that trades CD
for fps therefore fails the driver run instead of being recorded as a
win.  Timing then uses the trained weights (not random init).
"""

import json
import os
import subprocess
import sys
import tempfile
import threading
import time

import numpy as np

# Gate thresholds, calibrated on the committed checkpoint (fp32 eval CD
# 0.167 on the original val scenes; fresh-seed scenes read within ~15%).
CD_ABS_MAX = 0.25
CD_VS_IDENTITY_MAX = 0.92  # model must beat copy-key1 by >= 8%


def _emit_error(stage, detail, probes=None):
    """One parseable JSON line instead of a traceback (VERDICT r3 item 2)."""
    print(json.dumps({
        "metric": "frames_per_sec_16k", "value": 0.0, "unit": "frames/s",
        "vs_baseline": 0.0, "error": f"{stage}: {detail}"[:500],
        "probes": probes or {},
    }), flush=True)


# The staged probe script: each stage prints a marker the parent parses, so
# a hang/crash localizes to backend-init vs compile vs device-execute.
_PROBE_SRC = """
import jax, jax.numpy as jnp
print("STAGE init", flush=True)
d = jax.devices()
print("STAGE devices %s %d" % (d[0].platform, len(d)), flush=True)
x = jnp.ones((128, 128))
y = float((x @ x).sum())   # value fetch = the only real sync (CLAUDE.md)
print("STAGE matmul %g" % y, flush=True)
"""


def _backend_probe(timeout_s):
    """Run a tiny bounded backend probe in a SUBPROCESS (a wedged axon
    client hangs inside make_c_api_client — in-process code can never
    recover from that).  Returns (ok, probes_dict)."""
    probes = {"timeout_s": timeout_s}
    t0 = time.perf_counter()
    try:
        r = subprocess.run(
            [sys.executable, "-u", "-c", _PROBE_SRC],
            capture_output=True, text=True, timeout=timeout_s,
        )
        out = r.stdout
        probes["rc"] = r.returncode
        if r.returncode != 0:
            probes["stderr_tail"] = r.stderr.strip().splitlines()[-1][-300:] if r.stderr.strip() else ""
    except subprocess.TimeoutExpired as e:
        out = (e.stdout or b"")
        if isinstance(out, bytes):
            out = out.decode(errors="replace")
        probes["rc"] = "timeout"
    probes["elapsed_s"] = round(time.perf_counter() - t0, 1)
    stages = [ln.split()[1] for ln in out.splitlines() if ln.startswith("STAGE ")]
    probes["stages_passed"] = stages
    ok = probes.get("rc") == 0 and "matmul" in stages
    if not ok:
        last = stages[-1] if stages else "none"
        probes["hung_after"] = last
    return ok, probes


_WATCHDOG = None


def _arm_watchdog(seconds):
    """If the benchmark itself wedges mid-run (the r3 failure mode), emit
    the diagnostic JSON line and hard-exit instead of hanging the driver."""
    global _WATCHDOG

    def fire():
        _emit_error("watchdog", f"bench exceeded {seconds}s wall clock")
        os._exit(3)

    t = threading.Timer(seconds, fire)
    t.daemon = True
    t.start()
    _WATCHDOG = t
    return t


# Kill switches for every kernel route that has interpreter parity tests
# but no measured on-chip run.  DEFAULT POLICY (VERDICT r4 item 3): the
# bench runs the last MEASURED-GOOD configuration; unmeasured kernels are
# only enabled through results/bench_routes.json, which the measurement
# sweep writes after its A/B stages pass on real hardware.  The bench can
# then never print 0.0 because of a kernel this repo chose but never ran.
_CONSERVATIVE_ENV = {
    "PCI_TPU_MID_KERNEL": "0",
    "PCI_TPU_ENC_KERNEL": "0",
    "PCI_TPU_FUSION_ONESHOT": "0",
    "PCI_TPU_PN2_KERNEL": "0",
}

_ROUTES_FILE = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results", "bench_routes.json"
)


def _apply_routing():
    """Set kernel-route env defaults (explicit env always wins): from
    results/bench_routes.json if the sweep has measured winners, else the
    conservative last-measured-good (r3) routes."""
    if os.path.exists(_ROUTES_FILE):
        with open(_ROUTES_FILE) as f:
            routes = json.load(f)
        for k, v in routes.get("env", {}).items():
            os.environ.setdefault(k, str(v))
        return routes.get("name", "measured (bench_routes.json)")
    for k, v in _CONSERVATIVE_ENV.items():
        os.environ.setdefault(k, v)
    return "conservative r3 routes (no bench_routes.json)"


def _retry_conservative(reason):
    """Re-run bench.py in a subprocess with the r4 kernel routes off;
    forward its JSON line annotated with the retry reason."""
    env = dict(
        os.environ, PCI_TPU_BENCH_CONSERVATIVE="1",
        PCI_TPU_BENCH_SKIP_PROBE="1", **_CONSERVATIVE_ENV,
    )
    # settle: the crashed parent's client just died; a quick reconnect
    # can hang on the worker (r5 wedge_experiment findings)
    time.sleep(float(os.environ.get("PCI_TPU_CLIENT_SETTLE", "60")))
    r = subprocess.run(
        [sys.executable, "-u", os.path.abspath(__file__)],
        capture_output=True, text=True, env=env,
        timeout=float(os.environ.get("PCI_TPU_BENCH_WATCHDOG", "1800")) + 60,
    )
    line = next(
        (ln for ln in reversed(r.stdout.strip().splitlines())
         if ln.startswith("{")), None,
    )
    if line is None:
        return False
    rec = json.loads(line)
    rec["config"] = "conservative (r4 kernel routes off)"
    rec["retry_reason"] = reason[:200]
    print(json.dumps(rec), flush=True)
    sys.exit(0 if "error" not in rec else 1)


def _load_cloud(path, npoints, width, seed):
    pts = np.fromfile(path, np.float32).reshape(-1, width)[:, :3]
    idx = np.random.default_rng(seed).choice(len(pts), npoints, replace=len(pts) < npoints)
    return pts[idx]


def _accuracy_gate(model, variables, npoints, n_windows=6):
    """Evaluate the trained weights on fresh deterministic synthetic
    windows; return (cd_val, cd_identity) and raise on regression."""
    import jax
    import jax.numpy as jnp

    from pci_tpu import ops
    from pci_tpu.data import NuscenesTripletDataset, generate_scenes

    root = os.path.join(tempfile.gettempdir(), "pci_benchval")
    if not os.path.exists(os.path.join(root, "scenes.txt")):
        generate_scenes(root, n_scenes=2, n_frames=24, npts=24000,
                        seed=123, prefix="benchval")
    with open(os.path.join(root, "benchval.txt"), "w") as f:
        f.write("benchval-0000\nbenchval-0001\n")
    ds = NuscenesTripletDataset(
        os.path.join(root, "lidar"), os.path.join(root, "benchval.txt"),
        os.path.join(root, "split"), npoints=npoints, interval=5,
        train=False, use_intensity=False, seed=0,
    )

    @jax.jit
    def predict(p1, p2, t):
        zeros = jnp.zeros_like(p1)
        return model.apply(
            variables, p1, p2, zeros, zeros, t, train=False,
            rngs={"sample": jax.random.key(7)},
        )

    cds, cds_id = [], []
    step = max(1, len(ds) // n_windows)
    for i in range(0, len(ds), step):
        item = ds[i]
        p1 = jnp.asarray(item["ini_pc"][None, :, :3])
        p2 = jnp.asarray(item["end_pc"][None, :, :3])
        gt = jnp.asarray(item["mid_pc"][None, :, :3])
        t = jnp.asarray([item["t"]], jnp.float32)
        pred = predict(p1, p2, t)[..., :3]
        cds.append(float(ops.chamfer_distance(pred, gt)))
        cds_id.append(float(ops.chamfer_distance(p1, gt)))
    cd, cd_id = float(np.mean(cds)), float(np.mean(cds_id))
    if not (cd < CD_ABS_MAX and cd < CD_VS_IDENTITY_MAX * cd_id):
        print(json.dumps({
            "metric": "frames_per_sec_16k", "value": 0.0, "unit": "frames/s",
            "vs_baseline": 0.0, "error": "ACCURACY GATE FAILED",
            "cd_val": round(cd, 4), "cd_identity": round(cd_id, 4),
        }))
        sys.exit(1)
    return cd, cd_id


def main():
    # --- staged backend probe (subprocess, bounded) -------------------
    # A wedged axon worker hangs INSIDE PJRT client creation; probing in
    # a subprocess with a timeout turns that into a diagnosable one-line
    # JSON artifact instead of an infinite hang / raw traceback.
    probe_timeout = float(os.environ.get("PCI_TPU_BENCH_PROBE_TIMEOUT", "180"))
    if os.environ.get("PCI_TPU_BENCH_SKIP_PROBE") != "1":
        ok, probes = _backend_probe(probe_timeout)
        if not ok:
            _emit_error("backend_probe",
                        f"rc={probes.get('rc')} hung_after={probes.get('hung_after')}",
                        probes)
            sys.exit(1)
        # SETTLE before the main process connects: the axon worker
        # poisons a client that connects within ~a minute of a previous
        # SUCCESSFUL client's exit (measured r5, wedge_experiment.log —
        # a 5 s reconnect hung forever, a 24 s one worked).  This gap is
        # the likely cause of BENCH_r04's hang-after-probe.
        time.sleep(float(os.environ.get("PCI_TPU_CLIENT_SETTLE", "60")))

    if os.environ.get("PCI_TPU_BENCH_SIMULATE_CRASH") == "1":
        raise RuntimeError("simulated bench crash (test hook)")

    watchdog = _arm_watchdog(
        float(os.environ.get("PCI_TPU_BENCH_WATCHDOG", "1800")))

    config_name = _apply_routing()  # before any pci_tpu import

    import jax
    import jax.numpy as jnp

    from pci_tpu.models import PointINet
    from pci_tpu.nn import policy

    # bf16 activations are the production setting (VERDICT r2 item 1);
    # the accuracy gate below validates the SAME policy the timing uses,
    # so a bf16-induced CD regression fails the bench instead of shipping.
    policy.set_compute_dtype(os.environ.get("PCI_TPU_COMPUTE_DTYPE", "bfloat16"))

    npoints = 16384
    base = "/root/reference/Demos/20230508test/demo_data/Inputs/"
    if os.path.isdir(base):
        a = _load_cloud(base + "key_1.bin", npoints, 5, 0)
        b = _load_cloud(base + "key_2.bin", npoints, 5, 1)
    else:  # fall back to synthetic clouds
        rng = np.random.default_rng(0)
        a = (rng.standard_normal((npoints, 3)) * 10).astype(np.float32)
        b = a + 0.5 * rng.standard_normal((npoints, 3)).astype(np.float32)

    p1 = jnp.asarray(a)[None]
    p2 = jnp.asarray(b)[None]
    zeros = jnp.zeros_like(p1)
    t = jnp.asarray([0.5], jnp.float32)

    model = PointINet(freeze_flow=True)
    rngs = {"params": jax.random.key(0), "sample": jax.random.key(1)}
    variables = model.init(rngs, p1, p2, zeros, zeros, t, train=False)

    cd_val = cd_id = None
    ckpt = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "results", "checkpoints", "pointinet_synth16k",
    )
    if os.path.isdir(ckpt):
        from pci_tpu.train import load_params

        variables = load_params(ckpt, variables)
        cd_val, cd_id = _accuracy_gate(model, variables, npoints)

    def fwd(variables, p1, p2, t, key):
        return model.apply(
            variables, p1, p2, zeros, zeros, t,
            train=False, rngs={"sample": key},
        )

    # Timing recipe: chained forwards inside ONE jitted lax.scan,
    # synchronized by a VALUE FETCH (through the axon TPU tunnel
    # block_until_ready() returns before the computation finishes).  The
    # fetch costs a FIXED ~36-42 ms round trip independent of scan length,
    # so a single scan overstates per-frame time by ~40/iters ms; timing
    # two scan lengths and dividing the difference cancels it (CLAUDE.md).
    def make(iters):
        @jax.jit
        def run(variables, p1, p2, t, key):
            def body(carry, i):
                out = fwd(variables, p1 + carry, p2, t, jax.random.fold_in(key, i))
                return 1e-9 * jnp.sum(out[..., 0]), None

            carry, _ = jax.lax.scan(
                body, jnp.float32(0.0), jnp.arange(iters), length=iters
            )
            return carry

        return run

    lo, hi = make(10), make(50)
    float(lo(variables, p1, p2, t, jax.random.key(2)))  # compile + warm
    float(hi(variables, p1, p2, t, jax.random.key(2)))
    t0 = time.perf_counter()
    float(lo(variables, p1, p2, t, jax.random.key(3)))
    t_lo = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(hi(variables, p1, p2, t, jax.random.key(3)))
    dt = (time.perf_counter() - t0 - t_lo) / 40

    fps = 1.0 / dt
    baseline_fps = 1.0 / 0.2037  # paper Table 6, RTX 2060 @ 16,384 pts
    record = {
        "metric": "frames_per_sec_16k",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 3),
        "config": config_name,
    }
    if cd_val is not None:
        record["cd_val"] = round(cd_val, 4)
        record["cd_identity"] = round(cd_id, 4)
    watchdog.cancel()
    print(json.dumps(record))


if __name__ == "__main__":
    try:
        main()
    except (SystemExit, KeyboardInterrupt):
        raise  # an operator Ctrl-C must NOT spawn the ~30-min retry
    except BaseException as e:  # noqa: BLE001 — driver wants one JSON line
        if _WATCHDOG is not None:
            _WATCHDOG.cancel()  # the retry below is bounded by its own
        if (isinstance(e, Exception)
                and os.environ.get("PCI_TPU_BENCH_CONSERVATIVE") != "1"):
            try:
                _retry_conservative(f"{type(e).__name__}: {e}")
            except (SystemExit, KeyboardInterrupt):
                raise
            except Exception:  # noqa: BLE001
                pass
        _emit_error(type(e).__name__, str(e))
        sys.exit(1)
