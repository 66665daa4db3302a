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
    `module.init(rng, *args)`, filled with cheap deterministic values.

    Leaves are HOST numpy arrays: the axon tunnel moves ~48 MB/s up /
    ~20 MB/s down, so materializing a 1B-param tower on device and then
    touching it host-side (weight transforms, quantization, stacking) costs
    minutes of round-trips. Callers' jit/apply uploads each leaf exactly
    once — after any host-side transform — at the dtype they chose."""
    if method is not None:
        kwargs["method"] = method
    shapes = jax.eval_shape(
        lambda: module.init(jax.random.PRNGKey(0), *args, **kwargs))

    # one shared random block, tiled per leaf: element-wise RNG for the
    # ~1B-param EVA tower costs ~60 s host-side; values are irrelevant here
    block = np.random.default_rng(0).standard_normal(8191).astype(np.float32)
    counter = [0]

    def materialize(s):
        counter[0] += 1
        n = int(np.prod(s.shape)) if s.shape else 1
        off = counter[0] % len(block)
        arr = np.resize(np.roll(block, -off), n).reshape(s.shape) * scale
        return arr.astype(s.dtype)

    return jax.tree_util.tree_map(materialize, shapes)
