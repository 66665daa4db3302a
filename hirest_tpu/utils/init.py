"""Cheap parameter materialization.

`flax.Module.init` traces AND compiles the full forward just to produce
parameters — ~40 s for the EVA text tower and minutes for the joint model
on a tunneled TPU. For compile-checks and throughput benchmarks (where
parameter *values* are irrelevant) `shape_only_init` gets the parameter
tree via `jax.eval_shape` (trace only, no compile) and materializes small
deterministic host-side values.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def shape_only_init(module, *args, method=None, scale: float = 0.02, **kwargs):
    """Parameter pytree with the same structure/shapes/dtypes as
    `module.init(rng, *args)`, filled with cheap deterministic values."""
    if method is not None:
        kwargs["method"] = method
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))

    counter = [0]

    def materialize(s):
        counter[0] += 1
        rng = np.random.default_rng(counter[0])
        arr = rng.standard_normal(s.shape).astype(np.float32) * scale
        return jnp.asarray(arr, dtype=s.dtype)

    return jax.tree_util.tree_map(materialize, shapes)
