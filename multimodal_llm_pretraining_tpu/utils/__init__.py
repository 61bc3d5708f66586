from .logging import get_logger
from .trees import param_count, param_bytes, tree_flatten_with_paths

_SYNC_FNS: dict = {}


class InfrastructureError(RuntimeError):
    """The environment failed, not the workload.

    Raised when a probe worker dies of a transient backend fault (TPU tunnel
    ``UNAVAILABLE``, coordinator timeouts) after retries. Experiment sweeps
    must NOT cache these as arm failures: the arm is not infeasible, the
    machine hiccuped -- a re-sweep should retry it. (The reference's
    submitit jobs get this for free: an infra-failed SLURM job just gets
    resubmitted; a cached ``None`` there always means a *workload* failure,
    ``/root/reference/experiments/training_time_empirical.py:93-130``.)"""


# Message markers of transient backend faults. Shared by the probe-worker
# output classifier (benchmarking/isolation.py) and the step cache: faults
# matching these can also surface in the MAIN process (e.g. "Unable to
# initialize backend 'axon': UNAVAILABLE" when another process holds the
# tunnel) and must never be cached as arm failures there either.
INFRA_MARKERS = (
    "UNAVAILABLE:",
    "ABORTED:",
    "TPU device error",
    "TPU backend error",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "failed to connect",
    "Connection reset",
    "coordination service",
    "Unable to initialize backend",
    # libtpu rejecting plugin-polluted TPU_WORKER_HOSTNAMES before the
    # backend exists (the worker env is sanitized in isolation._worker_env;
    # this classifies any stragglers as the machine, not the arm)
    "unexpected worker hostname",
)

# Workload-failure markers that take precedence: an OOM is about the ARM
# even when the runtime wraps it in backend-error text.
_WORKLOAD_MARKERS = ("RESOURCE_EXHAUSTED", "Ran out of memory", "out of memory")


def is_infrastructure_error(e: BaseException) -> bool:
    """True when ``e`` is the machine failing rather than the workload."""
    if isinstance(e, InfrastructureError):
        return True
    msg = str(e)
    if any(m in msg for m in _WORKLOAD_MARKERS):
        return False
    return any(m in msg for m in INFRA_MARKERS)


def block_on(tree) -> None:
    """Hard device sync: force completion of every program producing ``tree``.

    ``jax.block_until_ready`` is a no-op on some experimental PJRT backends
    (observed on the axon TPU tunnel), which silently breaks wall-clock
    timing. Pulling a value to host is the only reliable barrier.

    Leaves of ``tree`` may come from MANY independent executions (the
    streaming offload updater dispatches one jitted program per parameter
    leaf), so syncing a single leaf is not enough: a later-dispatched leaf
    program could still be running when the timer stops. Instead one fused
    jitted reduction consumes a scalar from EVERY device-memory leaf -- it
    cannot run until all producers finish -- and its single output is fetched
    (one dispatch, ~13 ms on the tunnel, regardless of leaf count).

    Host-memory (``pinned_host``) leaves cannot be sliced on TPU; for those a
    small device round-trip is enqueued after the writebacks (DMA transfers
    are FIFO per direction on a single chip, so its completion bounds
    theirs).
    """
    import jax
    import numpy as np

    jax.block_until_ready(tree)
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "shape")]
    if not leaves:
        return

    def is_host(x):
        return getattr(getattr(x, "sharding", None), "memory_kind", None) == "pinned_host"

    dev_leaves = [x for x in leaves if not is_host(x)]
    host_leaves = [x for x in leaves if is_host(x)]

    if dev_leaves:
        key = tuple((x.shape, str(x.dtype)) for x in dev_leaves)
        fn = _SYNC_FNS.get(key)
        if fn is None:
            def reduce_first(*ls):
                import jax.numpy as jnp

                # sum real values (not *0, which XLA would constant-fold,
                # dropping the data dependency and with it the barrier)
                acc = jnp.zeros((), jnp.float32)
                for l in ls:
                    first = jax.lax.reshape(l, (l.size,))[0] if l.ndim else l
                    acc = acc + first.astype(jnp.float32)
                return acc

            fn = _SYNC_FNS[key] = jax.jit(reduce_first)
            if len(_SYNC_FNS) > 64:  # unbounded signatures: keep newest
                _SYNC_FNS.pop(next(iter(_SYNC_FNS)))
        try:
            np.asarray(fn(*dev_leaves))
        except Exception:
            pass  # block_until_ready above is the best remaining barrier

    if host_leaves:
        leaf = min(host_leaves, key=lambda x: getattr(x, "size", 1 << 62))
        try:
            moved = jax.device_put(leaf, jax.devices()[0])
            np.asarray(moved)[(0,) * moved.ndim if moved.ndim else ()]
        except Exception:
            pass


__all__ = [
    "get_logger",
    "param_count",
    "param_bytes",
    "tree_flatten_with_paths",
    "block_on",
    "InfrastructureError",
    "is_infrastructure_error",
    "INFRA_MARKERS",
]
