"""Small pytree helpers shared across the framework."""

import jax
import jax.numpy as jnp
import numpy as np


def tree_flatten_with_paths(tree):
    """[(path_string, leaf), ...] with '/'-joined key paths."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    out = []
    for path, leaf in flat:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(str(p.key))
            elif hasattr(p, "idx"):
                parts.append(str(p.idx))
            elif hasattr(p, "name"):
                parts.append(str(p.name))
            else:
                parts.append(str(p))
        out.append(("/".join(parts), leaf))
    return out


def param_count(tree) -> int:
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(tree) if hasattr(x, "shape"))


def param_bytes(tree) -> int:
    total = 0
    for x in jax.tree.leaves(tree):
        if hasattr(x, "shape"):
            dtype = getattr(x, "dtype", jnp.float32)
            total += int(np.prod(x.shape)) * np.dtype(dtype).itemsize
    return total
