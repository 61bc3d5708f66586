from .logging import get_logger
from .trees import param_count, param_bytes, tree_flatten_with_paths


def block_on(tree) -> None:
    """Hard device sync: fetch one scalar per leaf group to host.

    ``jax.block_until_ready`` is a no-op on some experimental PJRT backends
    (observed on the axon TPU tunnel), which silently breaks wall-clock
    timing. Pulling a value to host is the only reliable barrier.
    """
    import jax
    import numpy as np

    jax.block_until_ready(tree)
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "shape")]
    if not leaves:
        return

    # index a single scalar: the cheapest computation that cannot complete
    # until the producing program has finished. Prefer a small device-memory
    # leaf -- scalar slicing of pinned_host arrays is unsupported on TPU.
    def rank(x):
        kind = getattr(getattr(x, "sharding", None), "memory_kind", None)
        return (kind not in (None, "device"), getattr(x, "size", 1 << 62))

    leaf = min(leaves, key=rank)
    try:
        np.asarray(leaf[(0,) * leaf.ndim] if leaf.ndim else leaf)
    except Exception:
        pass  # block_until_ready above is the best remaining barrier


__all__ = ["get_logger", "param_count", "param_bytes", "tree_flatten_with_paths", "block_on"]
