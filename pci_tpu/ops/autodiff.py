"""Autodiff-awareness helpers for kernel routing gates.

The eval-only Pallas kernels (setconv/knnconv/flowenc/flowmid/fusion
tail/one-shot/attention eval tail) define no VJP: tracing one under
``jax.grad`` dies in the pallas JVP rule (the r5 bench_train crash —
the frozen-flow fine-tune step differentiates the FULL param tree, so
tangents ride the flow params into the eval-routed megakernels even
though the optimizer masks their updates).

:func:`has_tangents` is the trace-time test the routing gates use to
fall back to the XLA expression (which defines the gradients) whenever
a nonzero tangent could actually flow.  Values under ``stop_gradient``
drop out of the AD trace entirely (they arrive as plain arrays /
``DynamicJaxprTracer``s, never ``JVPTracer``/``LinearizeTracer``), so a
properly frozen submodule (train.state.freeze_params) keeps its fused
kernels routable inside a differentiated train step.
"""

from __future__ import annotations

import jax

# jax 0.9: grad/linearize wrap live values in LinearizeTracer; jvp in
# JVPTracer.  Private path — pinned-image pragmatism; both names probed.
from jax._src.interpreters import ad as _ad

_AD_TRACERS = tuple(
    t
    for t in (
        getattr(_ad, "JVPTracer", None),
        getattr(_ad, "LinearizeTracer", None),
    )
    if t is not None
)
if not _AD_TRACERS:  # pragma: no cover
    raise ImportError(
        "jax no longer exposes JVPTracer/LinearizeTracer under "
        "jax._src.interpreters.ad — has_tangents would silently return "
        "False and re-enable the no-VJP pallas trace crash; update "
        "pci_tpu/ops/autodiff.py for this jax version."
    )


def has_tangents(*trees) -> bool:
    """True if any leaf of ``trees`` carries a (possibly) nonzero AD
    tangent — i.e. routing an eval-only (no-VJP) Pallas kernel on these
    inputs would crash the trace.  ``stop_gradient``-ed and constant
    leaves return False, so frozen subtrees stay on the kernel path.

    BLIND SPOT: only the innermost trace is visible — inside a nested
    jaxpr-forming transform (jax.checkpoint/remat, an inner jit, scan,
    vmap) every leaf is a DynamicJaxprTracer and this returns False.
    The gates are therefore a SECOND line of defense; the first is
    train.state.freeze_params, applied OUTSIDE any checkpoint wrapper
    (train/loop.py does), which kills the tangents themselves."""
    return any(
        isinstance(leaf, _AD_TRACERS)
        for tree in trees
        for leaf in jax.tree_util.tree_leaves(tree)
    )
