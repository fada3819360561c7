"""Regenerate the model-output golden fixture.

  python -m tests.gen_golden

Run ONLY after an intentional numeric change; commit the updated .npz so
the diff documents the change.  Must run on CPU (conftest pins tests to
CPU; this script pins itself the same way).
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np  # noqa: E402

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from tests.golden_cases import model_outputs  # noqa: E402


def main():
    here = os.path.dirname(__file__)
    path = os.path.join(here, "golden", "model_outputs.npz")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    outs = model_outputs()
    np.savez_compressed(path, **outs)
    for k, v in outs.items():
        print(f"{k}: shape={v.shape} mean={v.mean():+.6f} std={v.std():.6f}")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
