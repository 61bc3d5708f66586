"""The jitted, sharded training step -- the core of the framework.

Replaces the entire reference runtime delegation stack (HF ``Trainer`` +
Accelerate + DeepSpeed engine + torch FSDP wrapping; ``src/train.py:57-89``,
``src/benchmarking/utils.py:40-80``) with three pure jitted functions over an
explicit device mesh:

- ``train_step``       -- fused: grad-accum scan + optimizer update (used for
                          real training; one XLA program, collectives overlap
                          compute via the latency-hiding scheduler)
- ``accumulate_step``  -- one microbatch fwd+bwd added into a grad buffer
                          (``ManualTrainer.manual_training_step`` analog)
- ``optimizer_step``   -- clip + optax update + zero-grads
                          (``manual_optimization_step`` analog); the split
                          exists so step timing can mirror the reference's
                          ``acc_time x acc_steps + optim_time`` protocol
                          (``src/benchmarking/step_time.py:95``)

Sharding: params/grads/optimizer state get partition specs from the plan's
``ShardingPolicy``; batches shard over the data axes; XLA inserts the
all-gathers / reduce-scatters that DeepSpeed/FSDP would do by hand.
"""

import functools
from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..parallel.mesh import DATA_AXES, build_mesh
from ..parallel.sharding import host_offload_supported, named_sharding, tree_shardings
from ..utils import get_logger
from .optimizer import build_optimizer

logger = get_logger()


@flax.struct.dataclass
class TrainState:
    step: jax.Array
    params: Any
    opt_state: Any


class TrainSession:
    """Builds and caches the jitted functions for one (plan, model) pair."""

    def __init__(self, plan, model_class, mesh=None, devices=None):
        self.plan = plan
        self.model_class = model_class
        plan.configure_compilation_cache()

        self.mesh = mesh if mesh is not None else build_mesh(plan.mesh_config(), devices=devices)
        self.policy = plan.sharding_policy()

        build_kwargs: dict[str, Any] = {}
        # optional build knobs: only models that expose them accept them, and
        # each default matches the plan default so omitting is equivalent
        import inspect

        build_params = inspect.signature(model_class.build_model).parameters
        if getattr(plan, "checkpoint_policy", "flash") != "flash" and "checkpoint_policy" in build_params:
            build_kwargs["checkpoint_policy"] = plan.checkpoint_policy
        if getattr(plan, "unroll_layers", False) and "unroll_layers" in build_params:
            build_kwargs["unroll_layers"] = True
        self.bundle = model_class.build_model(
            use_custom_kernels=plan.use_custom_kernels,
            activation_checkpointing=plan.activation_checkpointing,
            compute_dtype=plan.compute_dtype,
            **build_kwargs,
        )
        self.dataset = model_class.load_dummy_dataset()

        # Host-offloaded optimizer state uses the streaming leaf-by-leaf
        # updater (training/offload_update.py): fetching the whole Adam state
        # to HBM would defeat the offload.
        self.streaming_offload = self.policy.offload_optimizer and host_offload_supported()
        # Freeze-dominated models (llava-pretrain: projector-only, 47 MB of
        # state on a 1.5B tree) have nothing worth offloading -- frozen
        # leaves carry no moments/masters, so the streamed host round-trip
        # is pure overhead (and the grouped host-state programs trip the
        # axon AOT compiler's "Unimplemented DMA from hbm to hbm" on these
        # layouts). Keep their state on device; the offload arm then
        # measures the program DeepSpeed's offload would effectively run.
        if self.streaming_offload and self.bundle.trainable_mask is not None:
            shapes_probe = jax.eval_shape(self.bundle.init_fn, jax.random.key(0))
            leaves = list(zip(jax.tree.leaves(shapes_probe), jax.tree.leaves(self.bundle.trainable_mask)))
            trainable_f32 = sum(4 * int(np.prod(s.shape)) for s, m in leaves if m)
            total_f32 = sum(4 * int(np.prod(s.shape)) for s, _ in leaves)
            if trainable_f32 * 3 < 2**30 and trainable_f32 < 0.1 * total_f32:
                logger.info(
                    f"offload arm: trainable optimizer state is {trainable_f32 * 3 / 2**20:.0f} MB "
                    "on a freeze-dominated tree; whole-tree host fetch per update "
                    "(leaf-group streaming disabled)"
                )
                self.streaming_offload = False
        # DeepSpeed ZeRO-Offload bf16 layout: under a host-offloaded optimizer
        # with bf16 compute, the device keeps ONLY the bf16 model copy and the
        # f32 master parameters live on the host with the moments.
        self.master_offload = self.streaming_offload and plan.compute_dtype == jnp.bfloat16
        opt_kwargs = plan.optimizer_kwargs or model_class.optimizer_kwargs
        if self.streaming_offload:
            from .offload_update import StreamingOffloadUpdater

            self.updater = StreamingOffloadUpdater(
                plan.optimizer,
                opt_kwargs,
                plan.scheduler_type,
                plan.scheduler_kwargs,
                num_training_steps=plan.num_training_steps,
                max_grad_norm=plan.max_grad_norm,
                trainable_mask=self.bundle.trainable_mask,
                master_weights=self.master_offload,
            )
            self.tx = type("TxFacade", (), {"init": staticmethod(self.updater.init)})()
        else:
            self.updater = None
            osd = getattr(plan, "opt_state_dtype", None)
            self.tx = build_optimizer(
                plan.optimizer,
                opt_kwargs,
                plan.scheduler_type,
                plan.scheduler_kwargs,
                num_training_steps=plan.num_training_steps,
                max_grad_norm=plan.max_grad_norm,
                trainable_mask=self.bundle.trainable_mask,
                opt_state_dtype=jnp.bfloat16 if osd == "bf16" else None,
            )
        # On-device master-weights layout (plan.master_weights): the live
        # model copy is bf16 so the scan-transpose emits NATIVE bf16 grads
        # (an f32 param tree makes every microbatch materialize a 4 GB f32
        # grad tree at pythia-1b scale -- the allocation that pushed the
        # all-on-device step past HBM); the f32 master rides in opt_state
        # ON DEVICE. Combined with bf16 stored moments this keeps the whole
        # optimizer resident -- no host round-trip at all. "sr" drops the
        # master entirely and applies updates with stochastic rounding.
        mw = getattr(plan, "master_weights", False)
        self.sr_params = mw == "sr" and plan.compute_dtype == jnp.bfloat16 and not self.streaming_offload
        self.master_device = (
            bool(mw) and not self.sr_params
            and plan.compute_dtype == jnp.bfloat16
            and not self.streaming_offload
        )

        # Shardings from abstract shapes (no allocation).
        rng = jax.random.key(0)
        self.repl_sharding = named_sharding(self.mesh, P())
        param_shapes_f32 = jax.eval_shape(self.bundle.init_fn, rng)
        if self.master_offload or self.master_device or self.sr_params:
            # the live model copy is bf16; the f32 master (if any) rides in
            # opt_state
            param_shapes = jax.tree.map(
                lambda s: jax.ShapeDtypeStruct(s.shape, plan.compute_dtype), param_shapes_f32
            )
        elif self.bundle.trainable_mask is not None and plan.compute_dtype != jnp.float32:
            # Frozen leaves never update, so an f32 copy buys nothing: store
            # them in the compute dtype. This is what makes llava-pretrain
            # fit one chip -- the frozen tower+LM is ~99.6% of its 1.5B
            # params; f32 storage plus the per-step f32->bf16 convert copies
            # (hoisted across the whole grad-accum scan by XLA) cost ~8 GiB
            # at mbs 1. TRAINABLE leaves keep the f32 master semantics.
            param_shapes = jax.tree.map(
                lambda s, m: s if m else jax.ShapeDtypeStruct(s.shape, plan.compute_dtype),
                param_shapes_f32,
                self.bundle.trainable_mask,
            )
        else:
            param_shapes = param_shapes_f32
        opt_shapes = jax.eval_shape(self.opt_init, param_shapes)
        tp = self.bundle.tp_rules
        self.param_sharding = tree_shardings(
            param_shapes, self.mesh, self.policy.params, offload=self.policy.offload_params, tp_rules=tp
        )
        self.grad_sharding = tree_shardings(param_shapes, self.mesh, self.policy.grads, tp_rules=tp)
        if self.streaming_offload:
            # moments (and f32 masters) host-resident; the step counter stays
            # on device
            self.opt_sharding = {
                "count": self.repl_sharding,
                "mu": tree_shardings(param_shapes, self.mesh, self.policy.opt_state, offload=True, tp_rules=tp),
                "nu": tree_shardings(param_shapes, self.mesh, self.policy.opt_state, offload=True, tp_rules=tp),
            }
            if self.master_offload:
                self.opt_sharding["master"] = tree_shardings(
                    param_shapes, self.mesh, self.policy.opt_state, offload=True, tp_rules=tp
                )
        else:
            self.opt_sharding = tree_shardings(
                opt_shapes, self.mesh, self.policy.opt_state, offload=self.policy.offload_optimizer, tp_rules=tp
            )
        # device-memory twins for offloaded state: computation happens in HBM,
        # in/out shardings carry the host<->device transfers
        self.param_device_sharding = tree_shardings(param_shapes, self.mesh, self.policy.params, tp_rules=tp)
        self.opt_device_sharding = tree_shardings(opt_shapes, self.mesh, self.policy.opt_state, tp_rules=tp)
        self.param_shapes = param_shapes

        # Gradients exist only for trainable leaves (requires_grad parity:
        # torch never allocates frozen grads -- 6 GB of zeros for LLaVA's
        # frozen tower+LM otherwise). Frozen slots carry 0-d placeholders,
        # which broadcast harmlessly through both optimizer paths.
        # Accumulation buffers default to f32 when the live model copy is
        # bf16 (master offload): per-microbatch grads round to bf16 once
        # (torch bf16 parity) but summing across many microbatches must not.
        # plan.grad_accum_dtype overrides (bf16 halves the buffer -- the
        # only way a 2.8b-param model's grads fit next to its bf16 params
        # on a 16 GB chip).
        override = getattr(plan, "grad_accum_dtype", None)
        if override == "bf16":
            grad_dtype = jnp.bfloat16
        elif override == "f32":
            grad_dtype = jnp.float32
        else:
            grad_dtype = jnp.float32 if self.master_offload else None
        if self.bundle.trainable_mask is not None:
            self.grad_shapes = jax.tree.map(
                lambda s, m: (
                    jax.ShapeDtypeStruct(s.shape, grad_dtype or s.dtype)
                    if m
                    else jax.ShapeDtypeStruct((), grad_dtype or s.dtype)
                ),
                param_shapes,
                self.bundle.trainable_mask,
            )
            self.grad_sharding = tree_shardings(self.grad_shapes, self.mesh, self.policy.grads, tp_rules=tp)
        else:
            self.grad_shapes = jax.tree.map(
                lambda s: jax.ShapeDtypeStruct(s.shape, grad_dtype or s.dtype), param_shapes
            )

        self._jitted: dict[str, Any] = {}

    # ----------------------------------------------------------- data plumbing

    @property
    def dp_size(self) -> int:
        return self.mesh.shape["replica"] * self.mesh.shape["data"]

    def global_micro_batch_size(self, micro_batch_size: int | None = None) -> int:
        mbs = micro_batch_size if micro_batch_size is not None else self.plan.micro_batch_size
        return mbs * self.dp_size

    def batch_sharding(self, ndim: int, leading_acc_dim: bool = False):
        if leading_acc_dim:
            return named_sharding(self.mesh, P(None, DATA_AXES, *([None] * (ndim - 2))))
        return named_sharding(self.mesh, P(DATA_AXES, *([None] * (ndim - 1))))

    def put_batch_array(self, v, leading_acc_dim: bool = False):
        """Host array -> global sharded device array.

        Single process: plain device_put. Multi-host: every process holds the
        full batch (synthesized or collated identically from the shared seed)
        and contributes only the slice its local devices own
        (``make_array_from_process_local_data``) -- the torchrunx-free
        equivalent of per-rank dataloaders.
        """
        sharding = self.batch_sharding(v.ndim, leading_acc_dim=leading_acc_dim)
        if jax.process_count() == 1:
            return jax.device_put(v, sharding)
        dim = 1 if leading_acc_dim else 0
        per = v.shape[dim] // jax.process_count()
        start = jax.process_index() * per
        index = (slice(None),) * dim + (slice(start, start + per),)
        return jax.make_array_from_process_local_data(sharding, v[index], v.shape)

    def make_micro_batch(self, micro_batch_size: int | None = None, seed: int = 0):
        """One global microbatch, host->device with data-axis sharding."""
        gbs = self.global_micro_batch_size(micro_batch_size)
        host = self.dataset.sample_batch(gbs, seed=seed)
        return {k: self.put_batch_array(v) for k, v in host.items()}

    def make_train_batch(self, seed: int = 0):
        """[acc, global_mbs, ...] stacked batch for the fused step."""
        acc = self.plan.gradient_accumulation_steps
        gbs = self.global_micro_batch_size()
        host = self.dataset.sample_batch(acc * gbs, seed=seed)
        out = {}
        for k, v in host.items():
            v = v.reshape(acc, gbs, *v.shape[1:])
            out[k] = self.put_batch_array(v, leading_acc_dim=True)
        return out

    def micro_batch_specs(self, micro_batch_size: int | None = None, leading_acc_dim: bool = False):
        """ShapeDtypeStructs (with shardings) for AOT compilation."""
        gbs = self.global_micro_batch_size(micro_batch_size)
        spec = self.dataset.element_spec()
        out = {}
        for k, (shape, dtype) in spec.items():
            if leading_acc_dim:
                full = (self.plan.gradient_accumulation_steps, gbs, *shape)
            else:
                full = (gbs, *shape)
            out[k] = jax.ShapeDtypeStruct(full, dtype, sharding=self.batch_sharding(len(full), leading_acc_dim))
        return out

    # ----------------------------------------------------------- state

    def opt_init(self, params):
        """Optimizer-state init; under the on-device master-weights layout
        the f32 master is part of the state."""
        if self.master_device:
            master = jax.tree.map(lambda p: p.astype(jnp.float32), params)
            return {"master": master, "inner": self.tx.init(master)}
        return self.tx.init(params)

    def init_state(self, seed: int = 0) -> TrainState:
        rng = jax.random.key(seed)

        # cast each leaf to its declared storage dtype (bf16 live copies under
        # the master/SR layouts; bf16 FROZEN leaves under a trainable mask;
        # no-op where storage is f32) -- opt_init upcasts into masters later
        def init_fn(r):
            return jax.tree.map(lambda p, s: p.astype(s.dtype), self.bundle.init_fn(r), self.param_shapes)
        params = jax.jit(init_fn, out_shardings=self.param_sharding)(rng)
        if self.streaming_offload and not self._whole_tree_init_fits():
            # One jitted whole-tree init materializes the full f32 Adam
            # state in HBM before the host copy-out (3x params -- the same
            # reason the update streams); past ~80% of HBM it cannot run.
            # Stream the init in bounded groups instead.
            opt_state = self._init_opt_streamed(params)
        else:
            opt_state = jax.jit(self.opt_init, out_shardings=self.opt_sharding)(params)
        step = jnp.zeros((), jnp.int32)
        return TrainState(step=step, params=params, opt_state=opt_state)

    def _whole_tree_init_fits(self) -> bool:
        """True when device HBM can hold params + the full f32 Adam state at
        once (the whole-tree init program's peak). pythia-1b fits (14 GB of
        15.75); pythia-2.8b (39 GB) must stream."""
        from ..parallel.sharding import fake_host_offload
        from ..tpus import detect_local_tpu, device_hbm_bytes

        if fake_host_offload():
            return False  # CI: force the streamed init path so it executes
        tpu = detect_local_tpu()
        if tpu is None:
            return True  # CPU tests: no HBM ceiling
        # frozen leaves carry NO moments/masters (0-d placeholders): count
        # only trainable leaves, or llava's 99.6%-frozen tree books 18.7 GB
        # of phantom state and takes the streamed-init path -- which the
        # axon AOT compiler rejects with "Unimplemented DMA from hbm to hbm"
        # when its host arrays later feed the group update programs
        if self.bundle.trainable_mask is not None:
            sizes = [
                int(np.prod(s.shape))
                for s, m in zip(jax.tree.leaves(self.param_shapes), jax.tree.leaves(self.bundle.trainable_mask))
                if m
            ]
        else:
            sizes = [int(np.prod(s.shape)) for s in jax.tree.leaves(self.param_shapes)]
        f32_state = sum(4 * n for n in sizes) * (3 if self.master_offload else 2)
        params_bytes = sum(
            int(np.prod(s.shape)) * s.dtype.itemsize for s in jax.tree.leaves(self.param_shapes)
        )
        return f32_state + params_bytes < 0.85 * device_hbm_bytes(tpu)

    def _init_opt_streamed(self, params):
        from ..utils import block_on

        # let the (async) param-init program fully retire first: its runtime
        # peak plus the first queued state-init programs can transiently
        # exceed HBM on a chip the final state barely fits
        block_on(params)
        return self.updater.init_grouped(params, opt_sharding=self.opt_sharding)

    def zero_grads(self):
        if "zeros" not in self._jitted:
            zeros = functools.partial(jax.tree.map, lambda s: jnp.zeros(s.shape, s.dtype), self.grad_shapes)
            self._jitted["zeros"] = jax.jit(zeros, out_shardings=self.grad_sharding)
        return self._jitted["zeros"]()

    # ----------------------------------------------------------- pure fns

    def _fetch_params(self, params):
        """Host-offloaded params (ZeRO-3 offload_param analog) stream to HBM
        at the top of the step; zero_3++ gathers sharded params with int8
        communication (``ops/quantized_comm.py``); otherwise identity (GSPMD
        inserts plain all-gathers from the sharding specs)."""
        if self.policy.offload_params and host_offload_supported():
            params = jax.device_put(params, self.param_device_sharding)
        if self.policy.quantized_comms and self.mesh.shape["data"] > 1:
            from ..ops.quantized_comm import quantized_gather_tree

            params = quantized_gather_tree(
                params,
                self.param_device_sharding,
                self.mesh,
                out_dtype=self.plan.compute_dtype,
                quantized_grads=self.policy.quantized_grads,
            )
        return params

    def _fetch_opt(self, opt_state):
        if self.policy.offload_optimizer and host_offload_supported():
            return jax.device_put(opt_state, self.opt_device_sharding)
        return opt_state

    def _loss(self, params, batch, rng):
        params = self._fetch_params(params)
        if self.bundle.trainable_mask is not None:
            # requires_grad=False analog (src/models/llava.py:49-52): stop
            # gradients at frozen subtrees so XLA dead-code-eliminates their
            # backward entirely (projector-only LLaVA pretraining backprops
            # through ~0.4% of the parameters)
            params = jax.tree.map(
                lambda p, t: p if t else jax.lax.stop_gradient(p), params, self.bundle.trainable_mask
            )
        with jax.default_matmul_precision(self.plan.matmul_precision):
            loss, metrics = self.bundle.loss_fn(params, batch, rng=rng, train=True)
        return loss, metrics

    def _value_and_grad(self, params, batch, rng):
        """value_and_grad over trainable leaves only; frozen slots come back
        as 0-d zeros so the grads pytree keeps the params treedef."""
        mask = self.bundle.trainable_mask
        if mask is None:
            return jax.value_and_grad(self._loss, has_aux=True)(params, batch, rng)

        leaves, treedef = jax.tree_util.tree_flatten(params)
        mask_leaves = treedef.flatten_up_to(mask)
        trainable = [l for l, m in zip(leaves, mask_leaves) if m]
        frozen = [l for l, m in zip(leaves, mask_leaves) if not m]

        def merge(t_list, f_list):
            it, if_ = iter(t_list), iter(f_list)
            return jax.tree_util.tree_unflatten(treedef, [next(it) if m else next(if_) for m in mask_leaves])

        def loss_of_trainable(t_list):
            return self._loss(merge(t_list, frozen), batch, rng)

        (loss, aux), g_t = jax.value_and_grad(loss_of_trainable, has_aux=True)(trainable)
        zeros = [jnp.zeros((), l.dtype) for l in frozen]
        return (loss, aux), merge(g_t, zeros)

    def _accumulate(self, params, grads, batch, rng):
        (loss, _metrics), g = self._value_and_grad(params, batch, rng)
        # keep the accumulator's declared dtype (bf16 under grad_accum_dtype
        # override; the add itself promotes, so round once per microbatch)
        grads = jax.tree.map(lambda a, x: (a + x).astype(a.dtype), grads, g)
        return grads, loss

    @staticmethod
    def _opt_count(opt_state):
        """The Adam step counter buried in an (optionally masked) optax
        chain state; 0 if absent."""
        import optax

        for s in jax.tree_util.tree_leaves(opt_state, is_leaf=lambda x: isinstance(x, optax.ScaleByAdamState)):
            if isinstance(s, optax.ScaleByAdamState):
                return s.count
        return jnp.zeros((), jnp.int32)

    def _optimizer_update(self, params, opt_state, grads, acc_steps):
        import optax

        params_c = self._fetch_params(params)
        opt_state = self._fetch_opt(opt_state)
        grads = jax.tree.map(lambda g: g / acc_steps, grads)
        if self.master_device:
            # update math against the f32 master; the live bf16 copy is
            # re-derived by rounding the new master once (exact master
            # semantics, no delta round-trip through bf16)
            delta, inner = self.tx.update(grads, opt_state["inner"], opt_state["master"])
            new_master = jax.tree.map(jnp.add, opt_state["master"], delta)
            params = jax.tree.map(lambda m, p: m.astype(p.dtype), new_master, params_c)
            return params, {"master": new_master, "inner": inner}
        if self.sr_params:
            # masterless bf16 params: unbiased stochastic rounding of p + d
            # (zero-mean noise accumulates tiny deltas in expectation; a
            # frozen leaf's zero delta rounds exactly). Key is derived from
            # the post-update Adam count, so every step rounds differently.
            from .optimizer import stochastic_round_to

            delta, new_opt = self.tx.update(grads, opt_state, params_c)
            base = jax.random.fold_in(jax.random.key(17), self._opt_count(new_opt))
            leaves, treedef = jax.tree_util.tree_flatten(params_c)
            deltas = treedef.flatten_up_to(delta)
            new_leaves = [
                stochastic_round_to(p.astype(jnp.float32) + d, p.dtype, jax.random.fold_in(base, i))
                if p.dtype == jnp.bfloat16
                else p + d
                for i, (p, d) in enumerate(zip(leaves, deltas))
            ]
            return jax.tree_util.tree_unflatten(treedef, new_leaves), new_opt
        updates, opt_state = self.tx.update(grads, opt_state, params_c)
        params = optax.apply_updates(params_c, updates)
        # out_shardings (host memory kinds) move offloaded state back
        return params, opt_state

    def _compute_grads(self, params, batch, rng, step, grads0=None):
        """Grad-accumulation over the batch's leading dim; returns summed
        grads and summed loss.

        ``grads0`` lets the caller pass a (donated) zeroed buffer as the scan
        init so the accumulator aliases in place -- without it the scan carry
        and the program output are distinct f32 buffers, an extra
        params-sized allocation that pushed pythia-1b past HBM."""
        acc = self.plan.gradient_accumulation_steps
        rng = jax.random.fold_in(rng, step)

        if acc == 1:
            # no accumulation buffer needed: grads flow straight to the update
            micro_batch = {k: v[0] for k, v in batch.items()}
            (loss_sum, _m), grads = self._value_and_grad(params, micro_batch, rng)
            if grads0 is not None:
                # keep the declared grads dtype (f32 buffers under bf16 params)
                grads = jax.tree.map(jnp.add, grads0, grads)
        else:
            def micro(carry, mb):
                grads, loss_sum = carry
                g, loss = self._accumulate(params, grads, mb, rng)
                return (g, loss_sum + loss), None

            if grads0 is None:
                grads0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), self.grad_shapes)
            (grads, loss_sum), _ = jax.lax.scan(micro, (grads0, jnp.zeros((), jnp.float32)), batch)
        grads = jax.lax.with_sharding_constraint(grads, self.grad_sharding)
        return grads, loss_sum

    def _train_step(self, state: TrainState, batch, rng):
        acc = self.plan.gradient_accumulation_steps
        grads, loss_sum = self._compute_grads(state.params, batch, rng, state.step)
        params, opt_state = self._optimizer_update(state.params, state.opt_state, grads, float(acc))
        new_state = TrainState(step=state.step + 1, params=params, opt_state=opt_state)
        return new_state, {"loss": loss_sum / acc}

    # ----------------------------------------------------------- jitted entry points

    def accumulate_fn(self):
        """jit of one microbatch fwd+bwd accumulated into a grads buffer."""
        if "acc" not in self._jitted:
            self._jitted["acc"] = jax.jit(
                self._accumulate,
                in_shardings=(self.param_sharding, self.grad_sharding, None, self.repl_sharding),
                out_shardings=(self.grad_sharding, self.repl_sharding),
                donate_argnums=(1,),
            )
        return self._jitted["acc"]

    def optimizer_update_fn(self):
        if self.streaming_offload:
            def streamed(params, opt_state, grads, acc_steps):
                return self.updater.grouped(
                    params,
                    opt_state,
                    grads,
                    acc_steps,
                    param_sharding=self.param_sharding,
                    opt_sharding=self.opt_sharding,
                )

            return streamed
        if "upd" not in self._jitted:
            self._jitted["upd"] = jax.jit(
                self._optimizer_update,
                in_shardings=(self.param_sharding, self.opt_sharding, self.grad_sharding),
                out_shardings=(self.param_sharding, self.opt_sharding),
                donate_argnums=(0, 1, 2),
                static_argnums=(3,),
            )
        return self._jitted["upd"]

    def grads_fn(self):
        """jit of the full grad-accumulation pass (no update). Takes a
        donated zeroed grads buffer (``zero_grads()``) so the accumulator
        aliases in place."""
        if "grads" not in self._jitted:
            self._jitted["grads"] = jax.jit(
                lambda params, grads0, batch, rng, step: self._compute_grads(params, batch, rng, step, grads0),
                in_shardings=(self.param_sharding, self.grad_sharding, None, self.repl_sharding, self.repl_sharding),
                out_shardings=(self.grad_sharding, self.repl_sharding),
                donate_argnums=(1,),
            )
        return self._jitted["grads"]

    def train_step_fn(self):
        """The production step: scan over microbatches + optimizer update.

        Fused into one XLA program normally; with a host-offloaded optimizer
        the update runs as the streaming leaf-by-leaf pass instead (the
        moments never fit in HBM all at once)."""
        if self.streaming_offload:
            acc = self.plan.gradient_accumulation_steps
            gfn = self.grads_fn()
            update = self.optimizer_update_fn()

            def stepped(state: TrainState, batch, rng):
                grads, loss_sum = gfn(state.params, self.zero_grads(), batch, rng, state.step)
                params, opt_state = update(state.params, state.opt_state, grads, float(acc))
                return TrainState(step=state.step + 1, params=params, opt_state=opt_state), {"loss": loss_sum / acc}

            return stepped
        if "step" not in self._jitted:
            state_shardings = TrainState(step=self.repl_sharding, params=self.param_sharding, opt_state=self.opt_sharding)
            self._jitted["step"] = jax.jit(
                self._train_step,
                in_shardings=(state_shardings, None, self.repl_sharding),
                out_shardings=(state_shardings, None),
                donate_argnums=(0,),
            )
        return self._jitted["step"]

    # ----------------------------------------------------------- AOT analysis

    def lower_accumulate(self, micro_batch_size: int):
        params_s = jax.tree.map(lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), self.param_shapes, self.param_sharding)
        grads_s = jax.tree.map(lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sh), self.grad_shapes, self.grad_sharding)
        batch_s = self.micro_batch_specs(micro_batch_size)
        rng_s = jax.ShapeDtypeStruct((), jax.random.key(0).dtype, sharding=self.repl_sharding)
        fn = jax.jit(
            self._accumulate,
            in_shardings=(self.param_sharding, self.grad_sharding, None, self.repl_sharding),
            out_shardings=(self.grad_sharding, self.repl_sharding),
            donate_argnums=(1,),
        )
        return fn.lower(params_s, grads_s, batch_s, rng_s)

    def count_step_flops(self, micro_batch_size: int = 1) -> float | None:
        """FLOPs of one fwd+bwd microstep from XLA cost analysis -- the
        ``FlopCounterMode`` replacement (``src/benchmarking/flops.py:28-36``)."""
        try:
            compiled = self.lower_accumulate(micro_batch_size).compile()
            cost = compiled.cost_analysis()
            if isinstance(cost, list):
                cost = cost[0]
            return float(cost.get("flops", None)) if cost else None
        except Exception as e:  # pragma: no cover
            logger.info(f"cost_analysis failed: {e}")
            return None
