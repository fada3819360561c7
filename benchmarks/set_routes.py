"""Write results/bench_routes.json — the measured-winner kernel routes.

bench.py (VERDICT r4 item 3) defaults to the last measured-good (r3)
configuration and only enables newer kernel routes through this file,
which is written AFTER a sweep stage has shown the route good on real
hardware.  Usage:

  python -m benchmarks.set_routes --name "r5 sweep winners" \
      PCI_TPU_MID_KERNEL=1 PCI_TPU_ENC_KERNEL=1 PCI_TPU_FUSION_ONESHOT=1

  python -m benchmarks.set_routes --clear      # back to conservative
"""
import argparse
import json
import os

ROUTES = os.path.join(os.path.dirname(__file__), "..", "results", "bench_routes.json")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--name", default="measured winners")
    ap.add_argument("--clear", action="store_true")
    ap.add_argument("env", nargs="*", help="KEY=VALUE kernel-route settings")
    args = ap.parse_args()
    path = os.path.abspath(ROUTES)
    if args.clear:
        if os.path.exists(path):
            os.remove(path)
        print("routes cleared (bench.py falls back to conservative r3)")
        return
    env = dict(kv.split("=", 1) for kv in args.env)
    with open(path, "w") as f:
        json.dump({"name": args.name, "env": env}, f, indent=1)
    print(f"wrote {path}: {args.name} {env}")


if __name__ == "__main__":
    main()
