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


def scale_by_adam_lowp(b1: float, b2: float, eps: float, state_dtype) -> optax.GradientTransformation:
    """Adam moment tracking with low-precision (bf16) stored state.

    Math runs in f32 every step; mu/nu round to ``state_dtype`` once per
    step when stored. Halves optimizer-state HBM versus f32 moments -- the
    on-device alternative to host-offloading the moments (8-bit-Adam lineage;
    bf16 keeps f32's exponent range, so nu's 1e-12..1e+4 span is safe and
    only mantissa noise ~2^-8 enters the denominator). State layout matches
    ``optax.scale_by_adam`` (count/mu/nu) so shardings and checkpoints are
    indifferent to the precision choice."""

    def init(params):
        zeros = jax.tree.map(lambda p: jnp.zeros(p.shape, state_dtype), params)
        return optax.ScaleByAdamState(count=jnp.zeros((), jnp.int32), mu=zeros, nu=jax.tree.map(jnp.copy, zeros))

    def update(updates, state, params=None):
        del params
        count = optax.safe_increment(state.count)
        mu32 = jax.tree.map(lambda m, g: b1 * m.astype(jnp.float32) + (1 - b1) * g.astype(jnp.float32), state.mu, updates)
        nu32 = jax.tree.map(
            lambda v, g: b2 * v.astype(jnp.float32) + (1 - b2) * jnp.square(g.astype(jnp.float32)), state.nu, updates
        )
        c = count.astype(jnp.float32)
        out = jax.tree.map(
            lambda m, v: (m / (1 - b1**c)) / (jnp.sqrt(v / (1 - b2**c)) + eps),
            mu32,
            nu32,
        )
        new_state = optax.ScaleByAdamState(
            count=count,
            mu=jax.tree.map(lambda m: m.astype(state_dtype), mu32),
            nu=jax.tree.map(lambda v: v.astype(state_dtype), nu32),
        )
        return out, new_state

    return optax.GradientTransformation(init, update)


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
    if max_grad_norm and max_grad_norm > 0:
        parts.append(optax.clip_by_global_norm(max_grad_norm))
    if optimizer == "adam" and weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))  # L2 into grad
    if opt_state_dtype is not None and jnp.dtype(opt_state_dtype) != jnp.float32:
        parts.append(scale_by_adam_lowp(b1=b1, b2=b2, eps=eps, state_dtype=opt_state_dtype))
    else:
        parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    if optimizer == "adamw" and weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))  # decoupled
    parts.append(optax.scale_by_learning_rate(schedule))
    tx = optax.chain(*parts)

    if trainable_mask is not None:
        import jax

        inverted = jax.tree.map(lambda t: not t, trainable_mask)
        tx = optax.chain(
            optax.masked(tx, trainable_mask),
            optax.masked(optax.set_to_zero(), inverted),
        )
    return tx
