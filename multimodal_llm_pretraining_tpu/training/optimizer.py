"""Optimizers and LR schedules (optax).

Replaces the reference's torch optimizer classes + HF scheduler registry
(``src/models/__init__.py:117-139``) and the DeepSpeed fused-Adam swap rule
(``src/train.py:79-81`` -- irrelevant here: XLA fuses the optax update into
one kernel regardless of sharding). Semantics preserved:

- ``"adam"``  == torch.optim.Adam: weight_decay is L2 folded into the
  gradient *before* the moment update.
- ``"adamw"`` == torch.optim.AdamW: decoupled decay after the moment update.
- schedules: linear / cosine / cosine_with_min_lr with warmup, matching the
  HF SchedulerType variants the model zoo uses.
- ``max_grad_norm`` > 0 prepends global-norm clipping
  (``Trainer.manual_optimization_step`` parity, ``src/benchmarking/utils.py:66-71``).
- frozen params (LLaVA tower/LM freezing, ``src/models/llava.py:49-52``) get
  ``optax.set_to_zero`` via masking, so they carry no optimizer state at all.
"""

from typing import Any

import jax
import jax.numpy as jnp
import optax

from ..models import OptimizerT, SchedulerType


def clip_by_global_norm_keep_dtype(max_norm: float) -> optax.GradientTransformation:
    """``optax.clip_by_global_norm`` promotes bf16 grads to f32 (leaf * f32
    scale) -- a full extra grads-tree at pythia-1b scale. This variant casts
    the scale to each leaf's dtype so the tree's storage never widens; the
    norm itself is still computed in f32."""

    def update(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-16))
        return jax.tree.map(lambda g: g * scale.astype(g.dtype), updates), state

    return optax.GradientTransformation(lambda params: optax.EmptyState(), update)


def fused_adam_lowp(
    b1: float,
    b2: float,
    eps: float,
    schedule: optax.Schedule,
    weight_decay: float,
    decoupled: bool,
    state_dtype,
) -> optax.GradientTransformation:
    """Adam with low-precision (bf16) stored moments, fused per leaf.

    Weight decay (L2-into-grad for "adam", decoupled for "adamw"), both
    moment updates, bias correction, and the LR scale all happen in ONE
    ``tree.map`` returning (update, mu', nu') per leaf -- so XLA schedules
    each leaf's f32 temporaries independently and frees them before the
    next leaf, instead of keeping tree-wide f32 mu/nu/update temporaries
    live at once (a chained-transform program OOMs pythia-1b by ~3.6 GB on
    a 16 GB chip). Math runs in f32 every step; mu/nu round to
    ``state_dtype`` once when stored (8-bit-Adam lineage; bf16 keeps f32's
    exponent range, so nu's 1e-12..1e+4 span is safe and only mantissa
    noise ~2^-8 enters the denominator). State layout matches
    ``optax.scale_by_adam`` (count/mu/nu) so shardings and checkpoints are
    indifferent to the precision choice."""

    def init(params):
        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, state_dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.copy, zeros))

    def update(updates, state, params=None):
        if weight_decay and params is None:
            raise ValueError("fused_adam_lowp with weight_decay needs params")
        count = optax.safe_increment(state.count)
        c = count.astype(jnp.float32)
        neg_lr = -schedule(count)
        bc1 = 1 - b1**c
        bc2 = 1 - b2**c

        def one(g, m, v, p):
            g32 = g.astype(jnp.float32)
            if weight_decay and not decoupled:
                g32 = g32 + weight_decay * p.astype(jnp.float32)
            m32 = b1 * m.astype(jnp.float32) + (1 - b1) * g32
            v32 = b2 * v.astype(jnp.float32) + (1 - b2) * jnp.square(g32)
            d = (m32 / bc1) / (jnp.sqrt(v32 / bc2) + eps)
            if weight_decay and decoupled:
                d = d + weight_decay * p.astype(jnp.float32)
            return neg_lr * d, m32.astype(state_dtype), v32.astype(state_dtype)

        params = params if params is not None else updates
        triples = jax.tree.map(one, updates, state.mu, state.nu, params)
        # exact-type check: optax.MaskedNode is an EMPTY NamedTuple, so an
        # isinstance tuple test would mark frozen-leaf sentinels as leaves
        # and t[0] would IndexError (hit by every state_layout arm of a
        # freeze-masked model -- llava, roberta)
        flat, treedef = jax.tree_util.tree_flatten(triples, is_leaf=lambda x: type(x) is tuple)
        out = treedef.unflatten([t[0] for t in flat])
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=treedef.unflatten([t[1] for t in flat]),
            nu=treedef.unflatten([t[2] for t in flat]),
        )
        return out, new_state

    return optax.GradientTransformation(init, update)


def stochastic_round_to(x32, dtype, key):
    """Unbiased stochastic rounding f32 -> bf16 (TPU-native bf16 training:
    SR on the weight update replaces the f32 master copy -- the rounding
    noise is zero-mean, so tiny per-step deltas accumulate correctly in
    expectation instead of being swallowed by round-to-nearest at 2^-9).

    Adds uniform random bits to the truncated mantissa, then truncates:
    carries propagate into the kept mantissa with probability equal to the
    dropped fraction (sign-magnitude encoding makes this correct for
    negatives too)."""
    assert jnp.dtype(dtype) == jnp.bfloat16
    bits = jax.random.bits(key, x32.shape, jnp.uint16).astype(jnp.uint32)
    u = jax.lax.bitcast_convert_type(x32.astype(jnp.float32), jnp.uint32)
    u = (u + bits) & jnp.uint32(0xFFFF0000)
    return jax.lax.bitcast_convert_type(u, jnp.float32).astype(jnp.bfloat16)


def build_schedule(
    scheduler_type: SchedulerType,
    scheduler_kwargs: dict[str, Any],
    base_lr: float,
    num_training_steps: int,
) -> optax.Schedule:
    kwargs = dict(scheduler_kwargs)
    warmup = int(kwargs.pop("num_warmup_steps", 0))
    # benchmark plans run a handful of steps with the real recipe's warmup
    warmup = min(warmup, max(num_training_steps - 1, 0))
    match scheduler_type:
        case SchedulerType.LINEAR:
            return optax.join_schedules(
                [
                    optax.linear_schedule(0.0, base_lr, max(warmup, 1)),
                    optax.linear_schedule(base_lr, 0.0, max(num_training_steps - warmup, 1)),
                ],
                [warmup],
            )
        case SchedulerType.COSINE:
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=base_lr, warmup_steps=warmup, decay_steps=num_training_steps, end_value=0.0
            )
        case SchedulerType.COSINE_WITH_MIN_LR:
            if "min_lr" in kwargs:
                end = float(kwargs.pop("min_lr"))
            else:
                end = base_lr * float(kwargs.pop("min_lr_rate", 0.0))
            return optax.warmup_cosine_decay_schedule(
                init_value=0.0, peak_value=base_lr, warmup_steps=warmup, decay_steps=num_training_steps, end_value=end
            )
    raise ValueError(f"unknown scheduler {scheduler_type}")


def build_optimizer(
    optimizer: OptimizerT,
    optimizer_kwargs: dict[str, Any],
    scheduler_type: SchedulerType,
    scheduler_kwargs: dict[str, Any],
    num_training_steps: int,
    max_grad_norm: float = 0.0,
    trainable_mask=None,
    opt_state_dtype=None,
) -> optax.GradientTransformation:
    kwargs = dict(optimizer_kwargs)
    lr = float(kwargs.pop("lr"))
    b1, b2 = kwargs.pop("betas", (0.9, 0.999))
    eps = float(kwargs.pop("eps", 1e-8))
    weight_decay = float(kwargs.pop("weight_decay", 0.0))

    schedule = build_schedule(scheduler_type, scheduler_kwargs, lr, num_training_steps)

    parts: list[optax.GradientTransformation] = []
    if opt_state_dtype is not None and jnp.dtype(opt_state_dtype) != jnp.float32:
        # memory-lean fused path: dtype-preserving clip + one per-leaf op
        if max_grad_norm and max_grad_norm > 0:
            parts.append(clip_by_global_norm_keep_dtype(max_grad_norm))
        parts.append(
            fused_adam_lowp(
                b1=b1,
                b2=b2,
                eps=eps,
                schedule=schedule,
                weight_decay=weight_decay,
                decoupled=(optimizer == "adamw"),
                state_dtype=opt_state_dtype,
            )
        )
    else:
        if max_grad_norm and max_grad_norm > 0:
            parts.append(optax.clip_by_global_norm(max_grad_norm))
        if optimizer == "adam" and weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))  # L2 into grad
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        if optimizer == "adamw" and weight_decay:
            parts.append(optax.add_decayed_weights(weight_decay))  # decoupled
        parts.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*parts)

    if trainable_mask is not None:
        inverted = jax.tree.map(lambda t: not t, trainable_mask)
        tx = optax.chain(
            optax.masked(tx, trainable_mask),
            optax.masked(optax.set_to_zero(), inverted),
        )
    return tx
