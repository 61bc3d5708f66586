"""Streaming optimizer update for host-offloaded state.

DeepSpeed's CPU offload works because its C++ CPU-Adam updates parameters
where the optimizer state lives; a naive TPU translation (fetch the whole
Adam state to HBM, update, send back) needs params + grads + m + v
simultaneously on device -- ~20 GB for pythia-1b, defeating the point.

This updater streams instead: the Adam moments stay in pinned host memory
between steps, and the update runs leaf by leaf -- fetch one leaf's (m, v),
apply the update on device, write back. Peak extra HBM is one leaf
(layer-stacked trees have ~16 leaves), so a model whose optimizer state is
2x its parameters fits on a chip with barely more HBM than the parameters.

Semantics match ``training/optimizer.py`` exactly (same schedule, global-norm
clipping, torch-Adam L2 vs AdamW decay, bias correction, frozen-param
masks); ``tests/test_offload_update.py`` locks numerical parity with the
optax path.
"""

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..models import OptimizerT, SchedulerType
from ..parallel.sharding import named_sharding
from .optimizer import build_schedule


class StreamingOffloadUpdater:
    """Hand-rolled Adam/AdamW with host-resident moments.

    opt_state pytree: {"count": scalar, "mu": params-like, "nu": params-like}
    plus, when ``master_weights`` is on, {"master": params-like f32}.

    ``master_weights`` reproduces DeepSpeed ZeRO-Offload's bf16 layout
    (reference ``src/train.py:203-213`` offload arms run DS bf16 mode): the
    device holds ONLY the bf16 model copy; the f32 master parameters live in
    pinned host memory next to the moments and stream leaf-by-leaf through
    the update. Device HBM for parameters halves versus keeping an f32
    master resident, and the per-microbatch f32->bf16 cast disappears.
    """

    def __init__(
        self,
        optimizer: OptimizerT,
        optimizer_kwargs: dict[str, Any],
        scheduler_type: SchedulerType,
        scheduler_kwargs: dict[str, Any],
        num_training_steps: int,
        max_grad_norm: float,
        trainable_mask=None,
        master_weights: bool = False,
    ):
        kwargs = dict(optimizer_kwargs)
        self.lr_base = float(kwargs.pop("lr"))
        self.b1, self.b2 = kwargs.pop("betas", (0.9, 0.999))
        self.eps = float(kwargs.pop("eps", 1e-8))
        self.weight_decay = float(kwargs.pop("weight_decay", 0.0))
        self.decoupled = optimizer == "adamw"
        self.max_grad_norm = max_grad_norm
        self.schedule = build_schedule(scheduler_type, scheduler_kwargs, self.lr_base, num_training_steps)
        self.trainable_mask = trainable_mask
        self.master_weights = master_weights
        self._group_jits: dict = {}
        self._leaf_update = jax.jit(self._leaf_update_impl, donate_argnums=(0, 2, 3), static_argnums=(6,))
        self._cast = jax.jit(lambda m, dtype: m.astype(dtype), static_argnums=(1,))
        self._sq_sum = jax.jit(lambda g: jnp.sum(jnp.square(g.astype(jnp.float32))))

    # ------------------------------------------------------------ state

    # Leaves above this f32 size split into row chunks; leaves between
    # GROUP_BYTES and this ride whole in their own single-leaf group (the
    # long-proven path -- pythia-1b's 512 MB stacked kernels stay whole,
    # pythia-2.8b's 0.8-3.4 GB ones chunk).
    CHUNK_THRESHOLD = 576 * 2**20

    def _chunk_ranges(self, shape):
        """Row ranges splitting a leaf whose f32 state exceeds the chunk
        threshold (stacked-layer kernels are multi-GB single leaves -- a
        whole [L, d_ff, d] tensor cannot round-trip HBM in one program on a
        chip whose params already fill half of it). None = leaf stays
        whole."""
        if not shape:
            return None
        nbytes = 4 * int(np.prod(shape))
        if nbytes <= max(self.GROUP_BYTES, self.CHUNK_THRESHOLD):
            return None
        rows = int(shape[0])
        row_bytes = max(nbytes // max(rows, 1), 1)
        rows_per = max(1, self.GROUP_BYTES // row_bytes)
        if rows_per >= rows:
            return None
        return [(s, min(s + rows_per, rows)) for s in range(0, rows, rows_per)]

    def init(self, params):
        mask_tree = self.trainable_mask if self.trainable_mask is not None else jax.tree.map(lambda _: True, params)

        def zeros_like_state(p, m):
            if not m:
                return jnp.zeros((), jnp.float32)  # frozen: 0-d placeholder
            r = self._chunk_ranges(p.shape)
            if r is None:
                return jnp.zeros(p.shape, jnp.float32)
            return tuple(jnp.zeros((b - a, *p.shape[1:]), jnp.float32) for a, b in r)

        def master_like(p, m):
            if not m:
                return jnp.zeros((), jnp.float32)
            r = self._chunk_ranges(p.shape)
            if r is None:
                return p.astype(jnp.float32)
            return tuple(p[a:b].astype(jnp.float32) for a, b in r)

        state = {
            "count": jnp.zeros((), jnp.int32),
            "mu": jax.tree.map(zeros_like_state, params, mask_tree),
            "nu": jax.tree.map(zeros_like_state, params, mask_tree),
        }
        if self.master_weights:
            state["master"] = jax.tree.map(master_like, params, mask_tree)
        return state

    # ------------------------------------------------------------ update

    def _leaf_update_impl(self, p, g, mu, nu, scale, count, trainable):
        if not trainable:
            return p, mu, nu
        g = g.astype(jnp.float32) * scale
        if self.weight_decay and not self.decoupled:
            g = g + self.weight_decay * p  # torch.optim.Adam L2 semantics
        mu = self.b1 * mu + (1 - self.b1) * g
        nu = self.b2 * nu + (1 - self.b2) * jnp.square(g)
        t = count + 1
        mu_hat = mu / (1 - self.b1**t.astype(jnp.float32))
        nu_hat = nu / (1 - self.b2**t.astype(jnp.float32))
        lr = self.schedule(count)
        step = lr * mu_hat / (jnp.sqrt(nu_hat) + self.eps)
        if self.weight_decay and self.decoupled:
            step = step + lr * self.weight_decay * p
        return (p - step).astype(p.dtype), mu, nu

    # ---------------------------------------------------- grouped streaming path

    # Per-group budget of f32 master-parameter bytes. Device-twin peak per
    # group is ~3x this (m, v, master) plus the update's temps -- small
    # enough that two groups in flight stay far from the HBM ceiling.
    GROUP_BYTES = 384 * 2**20
    # Dispatch throttle: with fully async dispatch every queued program's
    # inputs/outputs can be live at once (a ~3 GB-params model OOMs at
    # runtime even though each program fits). Sync on the newest host output
    # after this many group/chunk programs are in flight.
    MAX_INFLIGHT = 2

    def _throttle(self, probe, dispatched):
        if dispatched >= self.MAX_INFLIGHT and probe is not None:
            from ..utils import block_on

            block_on(probe)
            return 0
        return dispatched

    def _group_fn(self, sig, out_shardings, dev_twins):
        """jit of one leaf-group's update (cached per shape signature).

        A single whole-tree program does not work: XLA schedules every
        host->device fetch up front, so the full f32 state (3x params)
        materializes in HBM and defeats the offload. Bounded groups make the
        peak structural, and the caller's python loop of async dispatches
        pipelines group i+1's transfers under group i's execution.

        ``dev_twins`` mirrors the (ps, mus, nus, mss) leaf tuples with either
        ``None`` (operand already in device memory) or the device-memory twin
        of its pinned-host sharding; host operands are ``device_put`` onto the
        twin *inside* the program (XLA refuses mixed-memory-space compute),
        and ``out_shardings`` with ``pinned_host`` kinds write results back.
        """
        sig = (
            sig,
            tuple(str(s) for s in jax.tree.leaves(out_shardings)),
            tuple("-" if s is None else str(s) for s in jax.tree.leaves(dev_twins)),
        )
        if sig not in self._group_jits:
            leaves = jax.tree.leaves(out_shardings)
            outs = out_shardings if leaves and all(isinstance(s, jax.sharding.Sharding) for s in leaves) else None
            p_tw, mu_tw, nu_tw, ms_tw = dev_twins

            def to_dev(x, twin):
                return jax.device_put(x, twin) if twin is not None else x

            def fn(clip_scale, count, ps, gs, mus, nus, mss):
                new_p, new_mu, new_nu, new_ms = [], [], [], []
                for i, (p, g, mu, nu, ms) in enumerate(zip(ps, gs, mus, nus, mss if mss else [None] * len(ps))):
                    p = to_dev(p, p_tw[i])
                    mu = to_dev(mu, mu_tw[i])
                    nu = to_dev(nu, nu_tw[i])
                    src = to_dev(ms, ms_tw[i]) if self.master_weights else p
                    s2, mu2, nu2 = self._leaf_update_impl(src, g, mu, nu, clip_scale, count, True)
                    new_p.append(s2.astype(p.dtype) if self.master_weights else s2)
                    new_mu.append(mu2)
                    new_nu.append(nu2)
                    if self.master_weights:
                        new_ms.append(s2)
                return tuple(new_p), tuple(new_mu), tuple(new_nu), tuple(new_ms)

            self._group_jits[sig] = jax.jit(fn, out_shardings=outs, donate_argnums=(2, 3, 4, 5, 6))
        return self._group_jits[sig]

    def _leaf_groups(self, p_leaves, mask_leaves):
        """Bounded groups of trainable leaf indices (f32 byte budget)."""
        groups: list[list[int]] = []
        size = self.GROUP_BYTES  # force a fresh group at the first leaf
        for i, (p, tr) in enumerate(zip(p_leaves, mask_leaves)):
            nbytes = 4 * int(np.prod(p.shape)) if p.shape else 4
            if not tr:
                continue
            if size + nbytes > self.GROUP_BYTES and size > 0:
                groups.append([])
                size = 0
            groups[-1].append(i)
            size += nbytes
        return groups

    def init_grouped(self, params, *, opt_sharding):
        """Build the host-resident optimizer state in bounded groups.

        One whole-tree ``jit(init)`` materializes the full f32 state (3x
        params) in HBM before the copy-out -- the exact failure the streamed
        update avoids; and pure host-side ``device_put`` per leaf crawls
        through the transfer path (~2 min for a 160m model on this tunnel).
        Instead each group is a tiny device program (zeros + f32 cast of the
        params) whose ``out_shardings`` write straight to pinned host.
        Leaves over the budget are built one row-chunk program at a time,
        mirroring the chunked layout ``init`` declares."""
        p_leaves, treedef = jax.tree_util.tree_flatten(params)
        mask_leaves = (
            treedef.flatten_up_to(self.trainable_mask) if self.trainable_mask is not None else [True] * len(p_leaves)
        )
        mu_sh = treedef.flatten_up_to(opt_sharding["mu"])
        ms_sh = treedef.flatten_up_to(opt_sharding["master"]) if self.master_weights else [None] * len(p_leaves)

        def chunk_sh(sh_entry, c):
            # chunk shardings: either the caller provided per-chunk entries,
            # or the leaf's own sharding applies to each row chunk verbatim
            # (same spec; only dim0's length differs)
            return sh_entry[c] if isinstance(sh_entry, tuple) else sh_entry

        # frozen leaves carry 0-d placeholders (np-built, tiny)
        zero0 = jnp.zeros((), jnp.float32)
        mu_out = [None if m else zero0 for m in mask_leaves]
        nu_out = [None if m else zero0 for m in mask_leaves]
        ms_out = [None if m else zero0 for m in mask_leaves]

        plain = [i for i, (p, m) in enumerate(zip(p_leaves, mask_leaves)) if m and self._chunk_ranges(p.shape) is None]
        chunked = [i for i, (p, m) in enumerate(zip(p_leaves, mask_leaves)) if m and self._chunk_ranges(p.shape)]
        inflight = 0

        def init_program(sig_key, shardings):
            if sig_key not in self._group_jits:
                leaves_ok = all(isinstance(s, jax.sharding.Sharding) for s in jax.tree.leaves(shardings))

                def fn(ps):
                    zeros = tuple(jnp.zeros(p.shape, jnp.float32) for p in ps)
                    masters = tuple(p.astype(jnp.float32) for p in ps) if self.master_weights else ()
                    return zeros, tuple(jnp.zeros(p.shape, jnp.float32) for p in ps), masters

                self._group_jits[sig_key] = jax.jit(fn, out_shardings=shardings if leaves_ok else None)
            return self._group_jits[sig_key]

        for idxs in self._leaf_groups([p_leaves[i] for i in plain], [True] * len(plain)):
            idxs = [plain[j] for j in idxs]
            sig = ("init", tuple((p_leaves[i].shape, str(p_leaves[i].dtype)) for i in idxs),
                   tuple(str(mu_sh[i]) for i in idxs), tuple(str(ms_sh[i]) for i in idxs))
            outs_sh = (
                tuple(mu_sh[i] for i in idxs),
                tuple(mu_sh[i] for i in idxs),
                tuple(ms_sh[i] for i in idxs) if self.master_weights else (),
            )
            mus, nus, mss = init_program(sig, outs_sh)(tuple(p_leaves[i] for i in idxs))
            for j, i in enumerate(idxs):
                mu_out[i], nu_out[i] = mus[j], nus[j]
                if self.master_weights:
                    ms_out[i] = mss[j]
            inflight = self._throttle(nus[-1] if nus else None, inflight + 1)

        for i in chunked:
            p = p_leaves[i]
            mu_cs, nu_cs, ms_cs = [], [], []
            for c, (a, b) in enumerate(self._chunk_ranges(p.shape)):
                sig = ("init-chunk", p.shape, str(p.dtype), a, b,
                       str(chunk_sh(mu_sh[i], c)), str(chunk_sh(ms_sh[i], c)))
                outs_sh = (
                    (chunk_sh(mu_sh[i], c),),
                    (chunk_sh(mu_sh[i], c),),
                    (chunk_sh(ms_sh[i], c),) if self.master_weights else (),
                )

                mus, nus, mss = init_program(sig, outs_sh)((p[a:b],))
                mu_cs.append(mus[0])
                nu_cs.append(nus[0])
                if self.master_weights:
                    ms_cs.append(mss[0])
                inflight = self._throttle(nus[0], inflight + 1)
            mu_out[i], nu_out[i] = tuple(mu_cs), tuple(nu_cs)
            if self.master_weights:
                ms_out[i] = tuple(ms_cs)

        state = {
            "count": jnp.zeros((), jnp.int32),
            "mu": jax.tree_util.tree_unflatten(treedef, mu_out),
            "nu": jax.tree_util.tree_unflatten(treedef, nu_out),
        }
        if self.master_weights:
            state["master"] = jax.tree_util.tree_unflatten(treedef, ms_out)
        return state

    def _chunk_fn(self, sig, out_shardings, twins, a, b):
        """jit of one row-chunk's update for an over-budget leaf (cached).

        The program takes the WHOLE device param and grad leaf (both already
        resident -- no transfer) plus one host chunk of (mu, nu, master);
        only the chunk's f32 state crosses the host link, and the param leaf
        is donated so the row write-back aliases in place."""
        if sig not in self._group_jits:
            mu_tw, nu_tw, ms_tw = twins
            leaves_ok = all(isinstance(s, jax.sharding.Sharding) for s in out_shardings)

            def to_dev(x, t):
                return jax.device_put(x, t) if t is not None else x

            if self.master_weights:
                def fn(clip_scale, count, p, g, mu, nu, ms):
                    src = to_dev(ms, ms_tw)
                    s2, mu2, nu2 = self._leaf_update_impl(
                        src, jax.lax.slice_in_dim(g, a, b, axis=0),
                        to_dev(mu, mu_tw), to_dev(nu, nu_tw), clip_scale, count, True,
                    )
                    new_p = jax.lax.dynamic_update_slice_in_dim(p, s2.astype(p.dtype), a, 0)
                    return new_p, mu2, nu2, s2

                donate = (2, 4, 5, 6)
            else:
                def fn(clip_scale, count, p, g, mu, nu):
                    s2, mu2, nu2 = self._leaf_update_impl(
                        jax.lax.slice_in_dim(p, a, b, axis=0), jax.lax.slice_in_dim(g, a, b, axis=0),
                        to_dev(mu, mu_tw), to_dev(nu, nu_tw), clip_scale, count, True,
                    )
                    new_p = jax.lax.dynamic_update_slice_in_dim(p, s2.astype(p.dtype), a, 0)
                    return new_p, mu2, nu2

                donate = (2, 4, 5)

            self._group_jits[sig] = jax.jit(
                fn, out_shardings=out_shardings if leaves_ok else None, donate_argnums=donate
            )
        return self._group_jits[sig]

    def _acc0(self, shape, dtype, dev_sh):
        """Device-resident zeros to accumulate a host-param leaf's new rows."""
        key = ("acc0", shape, str(dtype), str(dev_sh))
        if key not in self._group_jits:
            self._group_jits[key] = jax.jit(
                lambda: jnp.zeros(shape, dtype),
                out_shardings=dev_sh if isinstance(dev_sh, jax.sharding.Sharding) else None,
            )
        return self._group_jits[key]()

    def _chunk_fn_hostparam(self, sig, out_shardings, twins, pc_twin, a, b, final):
        """Chunk update when the PARAM leaf itself is pinned-host resident
        (offload_params arms: zero_3 / fsdp_full_shard + offloading).

        A host-space array cannot feed ``dynamic_update_slice`` (XLA requires
        all operands in one memory space), so instead of updating the param
        leaf in place the new rows accumulate in a device carry -- the chunk
        walk covers every row, so the old values are never needed (master
        mode) or arrive as the python-sliced host chunk (no-master mode).
        The final chunk's program writes the carry back to the host param
        sharding via out_shardings."""
        if sig not in self._group_jits:
            mu_tw, nu_tw, ms_tw = twins
            leaves = [s for s in out_shardings]
            leaves_ok = all(isinstance(s, jax.sharding.Sharding) for s in leaves)

            def to_dev(x, t):
                return jax.device_put(x, t) if t is not None else x

            if self.master_weights:
                def fn(clip_scale, count, acc, g, mu, nu, ms):
                    src = to_dev(ms, ms_tw)
                    s2, mu2, nu2 = self._leaf_update_impl(
                        src, jax.lax.slice_in_dim(g, a, b, axis=0),
                        to_dev(mu, mu_tw), to_dev(nu, nu_tw), clip_scale, count, True,
                    )
                    acc = jax.lax.dynamic_update_slice_in_dim(acc, s2.astype(acc.dtype), a, 0)
                    return acc, mu2, nu2, s2

                donate = (2, 4, 5, 6)
            else:
                def fn(clip_scale, count, acc, pc, g, mu, nu):
                    s2, mu2, nu2 = self._leaf_update_impl(
                        to_dev(pc, pc_twin), jax.lax.slice_in_dim(g, a, b, axis=0),
                        to_dev(mu, mu_tw), to_dev(nu, nu_tw), clip_scale, count, True,
                    )
                    acc = jax.lax.dynamic_update_slice_in_dim(acc, s2.astype(acc.dtype), a, 0)
                    return acc, mu2, nu2

                donate = (2, 5, 6)
            if final:
                # the carry's output leaves device memory -- donation cannot
                # alias across memory kinds
                donate = tuple(d for d in donate if d != 2)
            self._group_jits[sig] = jax.jit(
                fn, out_shardings=out_shardings if leaves_ok else None, donate_argnums=donate
            )
        return self._group_jits[sig]

    def _update_chunked_leaf(self, clip_scale, count, p, g, mu_t, nu_t, ms_t,
                             p_out_sh, mu_sh_entry, ms_sh_entry, inflight, mesh=None):
        """Stream one over-budget leaf's update, chunk by chunk.

        Device-resident param leaf: each chunk program slices/updates/writes
        the donated device leaf in place via dynamic_update_slice. Host-
        resident param leaf: device-carry accumulation (_chunk_fn_hostparam).
        Returns (new_p, mu_chunks, nu_chunks, ms_chunks, inflight)."""
        ranges = self._chunk_ranges(p.shape)

        def csh(entry, c):
            return entry[c] if isinstance(entry, tuple) else entry

        def twin(x):
            sh = getattr(x, "sharding", None)
            return _device_twin(sh, mesh) if _is_host(sh) else None

        p_host = _is_host(getattr(p, "sharding", None))
        if p_host:
            dev_sh = _device_twin(p_out_sh, mesh) if isinstance(p_out_sh, jax.sharding.Sharding) else None
            p_cur = self._acc0(p.shape, p.dtype, dev_sh)
        else:
            p_cur = p
        mu_cs, nu_cs, ms_cs = [], [], []
        for c, (a, b) in enumerate(ranges):
            final = c == len(ranges) - 1
            twins = (twin(mu_t[c]), twin(nu_t[c]), twin(ms_t[c]) if self.master_weights else None)
            acc_out = p_out_sh if (final or not p_host) else dev_sh
            outs = (acc_out, csh(mu_sh_entry, c), csh(mu_sh_entry, c)) + (
                (csh(ms_sh_entry, c),) if self.master_weights else ()
            )
            if p_host:
                pc = None if self.master_weights else p[a:b]
                pc_tw = None if pc is None else twin(pc)
                sig = ("chunk-hostp", p.shape, str(p.dtype), a, b, final,
                       tuple(str(s) for s in outs), tuple(str(t) for t in twins), str(pc_tw))
                fn = self._chunk_fn_hostparam(sig, outs, twins, pc_tw, a, b, final)
                if self.master_weights:
                    p_cur, mu2, nu2, ms2 = fn(clip_scale, count, p_cur, g, mu_t[c], nu_t[c], ms_t[c])
                    ms_cs.append(ms2)
                else:
                    p_cur, mu2, nu2 = fn(clip_scale, count, p_cur, pc, g, mu_t[c], nu_t[c])
            else:
                sig = ("chunk", p.shape, str(p.dtype), a, b,
                       tuple(str(s) for s in outs), tuple(str(t) for t in twins))
                fn = self._chunk_fn(sig, outs, twins, a, b)
                if self.master_weights:
                    p_cur, mu2, nu2, ms2 = fn(clip_scale, count, p_cur, g, mu_t[c], nu_t[c], ms_t[c])
                    ms_cs.append(ms2)
                else:
                    p_cur, mu2, nu2 = fn(clip_scale, count, p_cur, g, mu_t[c], nu_t[c])
            mu_cs.append(mu2)
            nu_cs.append(nu2)
            inflight = self._throttle(nu2, inflight + 1)
        return p_cur, tuple(mu_cs), tuple(nu_cs), tuple(ms_cs), inflight

    def grouped(self, params, opt_state, grads, acc_steps: float, *, param_sharding, opt_sharding):
        """Streamed update over bounded leaf groups -- the production path.

        Each group is one jitted program taking its host-resident (m, v,
        master) leaves plus device grads and params; out_shardings place the
        new state back in pinned host memory. ~6 tunnel dispatches per LEAF
        (the ``__call__`` fallback) become ~1 per GROUP.
        """
        count = opt_state["count"]
        inv_acc = 1.0 / float(acc_steps)
        if self.max_grad_norm and self.max_grad_norm > 0:
            if "clip" not in self._group_jits:
                self._group_jits["clip"] = jax.jit(
                    lambda gs, inv: jnp.minimum(
                        1.0,
                        self.max_grad_norm
                        / jnp.maximum(
                            jnp.sqrt(sum(jnp.sum(jnp.square(g.astype(jnp.float32))) for g in jax.tree.leaves(gs))) * inv,
                            1e-12,
                        ),
                    )
                    * inv
                )
            clip_scale = self._group_jits["clip"](grads, inv_acc)
        else:
            clip_scale = jnp.asarray(inv_acc, jnp.float32)

        p_leaves, treedef = jax.tree_util.tree_flatten(params)
        g_leaves = treedef.flatten_up_to(grads)
        mu_leaves = treedef.flatten_up_to(opt_state["mu"])
        nu_leaves = treedef.flatten_up_to(opt_state["nu"])
        master_leaves = treedef.flatten_up_to(opt_state["master"]) if self.master_weights else [None] * len(p_leaves)
        mask_leaves = (
            treedef.flatten_up_to(self.trainable_mask) if self.trainable_mask is not None else [True] * len(p_leaves)
        )
        p_sh = treedef.flatten_up_to(param_sharding)
        mu_sh = treedef.flatten_up_to(opt_sharding["mu"])
        ms_sh = treedef.flatten_up_to(opt_sharding["master"]) if self.master_weights else [None] * len(p_leaves)

        new_p = list(p_leaves)
        new_mu = list(mu_leaves)
        new_nu = list(nu_leaves)
        new_ms = list(master_leaves)

        def twin(x):
            sh = getattr(x, "sharding", None)
            return _device_twin(sh, None) if _is_host(sh) else None

        chunked = {i for i, (p, m) in enumerate(zip(p_leaves, mask_leaves)) if m and self._chunk_ranges(p.shape)}
        groups = self._leaf_groups(p_leaves, [m and i not in chunked for i, m in enumerate(mask_leaves)])
        inflight = 0

        for idxs in groups:
            sig = tuple((p_leaves[i].shape, str(p_leaves[i].dtype)) for i in idxs)
            outs = (
                tuple(p_sh[i] for i in idxs),
                tuple(mu_sh[i] for i in idxs),
                tuple(mu_sh[i] for i in idxs),
                tuple(ms_sh[i] for i in idxs) if self.master_weights else (),
            )
            twins = (
                tuple(twin(p_leaves[i]) for i in idxs),
                tuple(twin(mu_leaves[i]) for i in idxs),
                tuple(twin(nu_leaves[i]) for i in idxs),
                tuple(twin(master_leaves[i]) for i in idxs)
                if self.master_weights
                else tuple(None for _ in idxs),
            )
            fn = self._group_fn(sig, outs, twins)
            ps2, mus2, nus2, mss2 = fn(
                clip_scale,
                count,
                tuple(p_leaves[i] for i in idxs),
                tuple(g_leaves[i] for i in idxs),
                tuple(mu_leaves[i] for i in idxs),
                tuple(nu_leaves[i] for i in idxs),
                tuple(master_leaves[i] for i in idxs) if self.master_weights else (),
            )
            for j, i in enumerate(idxs):
                new_p[i] = ps2[j]
                new_mu[i] = mus2[j]
                new_nu[i] = nus2[j]
                if self.master_weights:
                    new_ms[i] = mss2[j]
            inflight = self._throttle(nus2[-1] if nus2 else None, inflight + 1)

        # over-budget leaves: one program per row chunk, streaming only that
        # chunk's f32 state through HBM (device params update in place via
        # donation; host-resident params accumulate in a device carry)
        for i in sorted(chunked):
            new_p[i], new_mu[i], new_nu[i], ms_cs, inflight = self._update_chunked_leaf(
                clip_scale, count, p_leaves[i], g_leaves[i],
                mu_leaves[i], nu_leaves[i], master_leaves[i] if self.master_weights else None,
                p_sh[i], mu_sh[i], ms_sh[i], inflight,
            )
            if self.master_weights:
                new_ms[i] = ms_cs

        out_state = {
            "count": count + 1,
            "mu": jax.tree_util.tree_unflatten(treedef, new_mu),
            "nu": jax.tree_util.tree_unflatten(treedef, new_nu),
        }
        if self.master_weights:
            out_state["master"] = jax.tree_util.tree_unflatten(treedef, new_ms)
        return jax.tree_util.tree_unflatten(treedef, new_p), out_state

    def __call__(self, params, opt_state, grads, acc_steps: float, mesh=None):
        """Streaming update, one small program per leaf (fallback/reference
        path; production steps use ``fused_impl`` under a single jit).
        params/grads on device; mu/nu wherever their shardings put them
        (pinned host under offload)."""
        count = opt_state["count"]
        inv_acc = 1.0 / float(acc_steps)

        if self.max_grad_norm and self.max_grad_norm > 0:
            sq = jnp.sum(jnp.stack([self._sq_sum(g) for g in jax.tree.leaves(grads)]))
            gnorm = jnp.sqrt(sq) * inv_acc
            clip_scale = jnp.minimum(1.0, self.max_grad_norm / jnp.maximum(gnorm, 1e-12)) * inv_acc
        else:
            clip_scale = jnp.asarray(inv_acc, jnp.float32)

        p_leaves, treedef = jax.tree_util.tree_flatten(params)
        g_leaves = treedef.flatten_up_to(grads)
        mu_leaves = treedef.flatten_up_to(opt_state["mu"])
        nu_leaves = treedef.flatten_up_to(opt_state["nu"])
        master_leaves = treedef.flatten_up_to(opt_state["master"]) if self.master_weights else [None] * len(p_leaves)
        mask_leaves = (
            treedef.flatten_up_to(self.trainable_mask) if self.trainable_mask is not None else [True] * len(p_leaves)
        )

        new_p, new_mu, new_nu, new_master = [], [], [], []
        for p, g, mu, nu, ms, tr in zip(p_leaves, g_leaves, mu_leaves, nu_leaves, master_leaves, mask_leaves):
            if tr and isinstance(mu, tuple):
                # over-budget leaf stored as row chunks: same math, chunk at
                # a time (shared with the grouped path)
                p2, mu_cs, nu_cs, ms_cs, _ = self._update_chunked_leaf(
                    clip_scale, count, p, g, mu, nu, ms if self.master_weights else None,
                    getattr(p, "sharding", None),
                    tuple(getattr(m, "sharding", None) for m in mu),
                    tuple(getattr(m, "sharding", None) for m in ms) if self.master_weights else None,
                    inflight=0, mesh=mesh,
                )
                new_p.append(p2)
                new_mu.append(mu_cs)
                new_nu.append(nu_cs)
                new_master.append(ms_cs if self.master_weights else ms)
                continue
            mu_sh = getattr(mu, "sharding", None)
            mu_d = jax.device_put(mu, _device_twin(mu_sh, mesh)) if _is_host(mu_sh) else mu
            nu_d = jax.device_put(nu, _device_twin(mu_sh, mesh)) if _is_host(mu_sh) else nu
            if self.master_weights and tr:
                # f32 master streams host->device, updates, streams back; the
                # device-resident bf16 copy is re-cast from the new master
                ms_sh = getattr(ms, "sharding", None)
                ms_d = jax.device_put(ms, _device_twin(ms_sh, mesh)) if _is_host(ms_sh) else ms
                ms2, mu2, nu2 = self._leaf_update(ms_d, g, mu_d, nu_d, clip_scale, count, True)
                p2 = self._cast(ms2, p.dtype)
                if _is_host(ms_sh):
                    ms2 = jax.device_put(ms2, ms_sh)
                new_master.append(ms2)
            else:
                p_sh = getattr(p, "sharding", None)
                p_d = jax.device_put(p, _device_twin(p_sh, mesh)) if _is_host(p_sh) else p
                p2, mu2, nu2 = self._leaf_update(p_d, g, mu_d, nu_d, clip_scale, count, bool(tr))
                if _is_host(p_sh):
                    p2 = jax.device_put(p2, p_sh)
                new_master.append(ms)
            if _is_host(mu_sh):
                mu2 = jax.device_put(mu2, mu_sh)
                nu2 = jax.device_put(nu2, mu_sh)
            new_p.append(p2)
            new_mu.append(mu2)
            new_nu.append(nu2)

        out_state = {
            "count": count + 1,
            "mu": jax.tree_util.tree_unflatten(treedef, new_mu),
            "nu": jax.tree_util.tree_unflatten(treedef, new_nu),
        }
        if self.master_weights:
            out_state["master"] = jax.tree_util.tree_unflatten(treedef, new_master)
        return jax.tree_util.tree_unflatten(treedef, new_p), out_state


def _is_host(sharding) -> bool:
    return getattr(sharding, "memory_kind", None) == "pinned_host"


def _device_twin(sharding, mesh):
    from jax.sharding import NamedSharding

    if isinstance(sharding, NamedSharding):
        return NamedSharding(sharding.mesh, sharding.spec)
    if mesh is not None:
        from jax.sharding import PartitionSpec as P

        return named_sharding(mesh, P())
    return jax.devices()[0]
