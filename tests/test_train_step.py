"""End-to-end train-step tests over every sharding method on the CPU mesh."""

import jax
import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.models import get_model_class
from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
from multimodal_llm_pretraining_tpu.train import TrainingPlan


def tiny_plan(model_class, sharding="", offloading=False, mesh=None, acc=2, mbs=2, **kw):
    return TrainingPlan(
        num_training_steps=5,
        micro_batch_size=mbs,
        gradient_accumulation_steps=acc,
        optimizer=model_class.optimizer,
        optimizer_kwargs=model_class.optimizer_kwargs,
        scheduler_type=model_class.scheduler_type,
        scheduler_kwargs=model_class.scheduler_kwargs,
        sharding=sharding,
        offloading=offloading,
        max_grad_norm=model_class.max_grad_norm,
        mesh=mesh or MeshConfig(num_hosts=1, chips_per_host=8),
        use_custom_kernels=False,
        **kw,
    )


def run_two_steps(sess):
    state = sess.init_state()
    step = sess.train_step_fn()
    for i in range(2):
        state, metrics = step(state, sess.make_train_batch(seed=i), jax.random.key(0))
    return float(metrics["loss"])


_baseline_loss_cache: dict[str, float] = {}


def _baseline_loss() -> float:
    if "loss" not in _baseline_loss_cache:
        mc = get_model_class("pythia-14m")
        base = tiny_plan(mc, sharding="").build_session(mc)
        base.dataset.sequence_length = 33
        _baseline_loss_cache["loss"] = run_two_steps(base)
    return _baseline_loss_cache["loss"]


@pytest.mark.parametrize(
    "sharding",
    ["", "zero_1", "zero_2", "zero_3", "fsdp_shard_grad_op", "fsdp_full_shard"],
)
def test_sharding_methods_agree(sharding):
    """Every ZeRO/FSDP method must compute the same training trajectory --
    sharding is a layout decision, not a numerics decision."""
    mc = get_model_class("pythia-14m")
    plan = tiny_plan(mc, sharding=sharding)
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 33
    loss = run_two_steps(sess)
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, _baseline_loss(), rtol=2e-4)


@pytest.mark.parametrize("sharding", ["fsdp_hybrid_shard", "fsdp_hybrid_shard_zero2", "zero_3++"])
def test_hybrid_sharding(sharding):
    """Hybrid methods need a 2D (replica x data) mesh: 2 'hosts' x 4 chips --
    and must reproduce the unsharded trajectory. zero_3++ deliberately
    perturbs it (int8 weight gathers + int8 grad reduce-scatter), so it gets
    a quantization-error bound instead of float tolerance."""
    mc = get_model_class("pythia-14m")
    plan = tiny_plan(mc, sharding=sharding, mesh=MeshConfig(num_hosts=2, chips_per_host=4))
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 33
    assert sess.mesh.shape["replica"] == 2
    assert sess.mesh.shape["data"] == 4
    loss = run_two_steps(sess)
    assert np.isfinite(loss)
    if sharding == "zero_3++":
        assert abs(loss - _baseline_loss()) / _baseline_loss() < 0.02
    else:
        np.testing.assert_allclose(loss, _baseline_loss(), rtol=2e-4)


@pytest.mark.parametrize("policy", ["flash", "dots"])
def test_checkpoint_policies_agree(policy):
    """Remat is a memory decision, not a numerics decision: both checkpoint
    policies (full remat keeping flash residuals; save-dots light remat) must
    reproduce the no-remat trajectory."""
    mc = get_model_class("pythia-14m")
    plan = tiny_plan(mc, sharding="", activation_checkpointing=True, checkpoint_policy=policy)
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 33
    loss = run_two_steps(sess)
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, _baseline_loss(), rtol=2e-4)


def test_split_acc_optim_path_matches_fused():
    """The benchmarking split (accumulate_fn + optimizer_update_fn) must be
    numerically equivalent to the fused train step."""
    mc = get_model_class("pythia-14m")
    plan = tiny_plan(mc, acc=1, mbs=2)
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 33

    state = sess.init_state()
    batch = sess.make_train_batch(seed=0)
    fused_state, metrics = sess.train_step_fn()(state, batch, jax.random.key(0))

    state2 = sess.init_state()
    grads = sess.zero_grads()
    micro = {k: v[0] for k, v in sess.make_train_batch(seed=0).items()}
    rng = jax.random.fold_in(jax.random.key(0), state2.step)
    grads, loss = sess.accumulate_fn()(state2.params, grads, micro, rng)
    params, _ = sess.optimizer_update_fn()(state2.params, state2.opt_state, grads, 1.0)

    np.testing.assert_allclose(float(loss), float(metrics["loss"]), rtol=1e-5)
    a = jax.tree.leaves(fused_state.params)[0]
    b = jax.tree.leaves(params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_chained_grads_executions_equal_fused_step():
    """bench.py's workload-scale protocol: N chained grads_fn executions
    carrying the accumulator buffer + one optimizer update at the TOTAL
    accumulation must equal ONE fused step at that accumulation (the
    backend's per-execution deadline forbids a single acc-256 program, so
    the workload step is measured as chained chunks)."""
    mc = get_model_class("pythia-14m")

    sess4 = tiny_plan(mc, acc=4, mbs=2).build_session(mc)
    sess4.dataset.sequence_length = 33
    state4 = sess4.init_state(seed=0)
    batch4 = sess4.make_train_batch(seed=7)
    fused_state, metrics = sess4.train_step_fn()(state4, batch4, jax.random.key(0))

    sess2 = tiny_plan(mc, acc=2, mbs=2).build_session(mc)
    sess2.dataset.sequence_length = 33
    state2 = sess2.init_state(seed=0)
    gfn = sess2.grads_fn()
    update = sess2.optimizer_update_fn()
    grads = sess2.zero_grads()
    # same data, same rng: the fused step scans all 4 microbatches under one
    # step rng, so both chunks get that rng
    b1 = {k: v[:2] for k, v in batch4.items()}
    b2 = {k: v[2:] for k, v in batch4.items()}
    grads, l1 = gfn(state2.params, grads, b1, jax.random.key(0), state2.step)
    grads, l2 = gfn(state2.params, grads, b2, jax.random.key(0), state2.step)
    params, _ = update(state2.params, state2.opt_state, grads, 4.0)

    np.testing.assert_allclose(float((l1 + l2) / 4.0), float(metrics["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(fused_state.params), jax.tree.leaves(params)):
        np.testing.assert_allclose(
            np.asarray(a, dtype=np.float32), np.asarray(b, dtype=np.float32), rtol=1e-4, atol=1e-6
        )


def test_tensor_parallel_axis():
    """GSPMD tensor parallelism via tp_rules: 4-way data x 2-way model.
    Partitioned matmuls are layout, not numerics: the trajectory must match
    a data-parallel baseline with the SAME global batch (4 data shards)."""
    mc = get_model_class("pythia-14m")
    base = tiny_plan(mc, sharding="", mesh=MeshConfig(num_hosts=1, chips_per_host=4)).build_session(mc)
    base.dataset.sequence_length = 33
    base_loss = run_two_steps(base)

    plan = tiny_plan(mc, sharding="zero_3", mesh=MeshConfig(num_hosts=1, chips_per_host=8, tensor_parallel=2))
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 33
    assert sess.mesh.shape["model"] == 2
    assert sess.global_micro_batch_size() == base.global_micro_batch_size()
    loss = run_two_steps(sess)
    assert np.isfinite(loss)
    np.testing.assert_allclose(loss, base_loss, rtol=2e-4)


def test_grad_accum_equivalence():
    """acc=2 at mbs=1 must match acc=1 at mbs=2 (same global batch)."""
    mc = get_model_class("pythia-14m")

    p1 = tiny_plan(mc, acc=1, mbs=2)
    s1 = p1.build_session(mc)
    s1.dataset.sequence_length = 33
    st1 = s1.init_state()
    # build the acc=1 batch, then feed the same examples as two microbatches
    b1 = s1.make_train_batch(seed=0)

    p2 = tiny_plan(mc, acc=2, mbs=1)
    s2 = p2.build_session(mc)
    s2.dataset.sequence_length = 33
    st2 = s2.init_state()
    b2 = {k: v.reshape(2, v.shape[1] // 2, *v.shape[2:]) for k, v in b1.items()}

    st1, m1 = s1.train_step_fn()(st1, b1, jax.random.key(0))
    st2, m2 = s2.train_step_fn()(st2, b2, jax.random.key(0))
    a = np.asarray(jax.tree.leaves(st1.params)[0])
    b = np.asarray(jax.tree.leaves(st2.params)[0])
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_frozen_params_under_sharded_optimizer():
    """LLaVA-style freezing: masked params get no updates and no optimizer
    state, even when optimizer state is ZeRO-sharded."""
    mc = get_model_class("pythia-14m")
    plan = tiny_plan(mc, sharding="zero_1", acc=1, mbs=2)
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 33

    # freeze the embedding table via the bundle's trainable mask
    shapes = jax.eval_shape(sess.bundle.init_fn, jax.random.key(0))
    mask = jax.tree_util.tree_map_with_path(
        lambda path, _: not any(str(getattr(p, "key", "")) == "embed_in" for p in path), shapes
    )
    sess.bundle.trainable_mask = mask
    from multimodal_llm_pretraining_tpu.training.optimizer import build_optimizer

    sess.tx = build_optimizer(
        plan.optimizer, plan.optimizer_kwargs, plan.scheduler_type, plan.scheduler_kwargs,
        num_training_steps=plan.num_training_steps, max_grad_norm=plan.max_grad_norm,
        trainable_mask=mask,
    )
    from multimodal_llm_pretraining_tpu.parallel.sharding import tree_shardings

    opt_shapes = jax.eval_shape(sess.tx.init, shapes)
    sess.opt_sharding = tree_shardings(opt_shapes, sess.mesh, sess.policy.opt_state)

    state = sess.init_state()
    embed_before = np.asarray(state.params["embed_in"]["embedding"])
    step = sess.train_step_fn()
    # two steps: LR at step 0 is zero (warmup), so movement shows from step 2
    for i in range(2):
        state, _ = step(state, sess.make_train_batch(seed=i), jax.random.key(0))
    embed_after = np.asarray(state.params["embed_in"]["embedding"])
    np.testing.assert_array_equal(embed_before, embed_after)
    # a trainable param did move
    moved = np.asarray(state.params["final_ln"]["scale"])
    assert not np.array_equal(moved, np.ones_like(moved))


def test_bf16_grad_accum_dtype_knob():
    """grad_accum_dtype='bf16' halves the accumulator (the knob that fits
    mamba-2.8b's grads on a 16 GB chip) and must stay close to the f32
    trajectory over a few steps."""
    mc = get_model_class("pythia-14m")
    losses = {}
    for dtype in ("f32", "bf16"):
        plan = tiny_plan(mc, sharding="", bf16=True, grad_accum_dtype=dtype)
        sess = plan.build_session(mc)
        sess.dataset.sequence_length = 33
        import jax.numpy as jnp

        want = jnp.bfloat16 if dtype == "bf16" else jnp.float32
        assert all(g.dtype == want for g in jax.tree.leaves(sess.grad_shapes))
        losses[dtype] = run_two_steps(sess)
    # bf16 accumulation rounds each microbatch add; trajectories agree loosely
    assert abs(losses["bf16"] - losses["f32"]) / abs(losses["f32"]) < 2e-2


def test_unrolled_layer_stack_matches_scan():
    """unroll_layers removes the XLA while-loop (so layer-grad accumulation
    aliases in place -- the pythia-2.8b single-chip lever) but must be a pure
    scheduling change: same params layout, same trajectory."""
    mc = get_model_class("pythia-14m")
    losses = {}
    for unroll in (False, True):
        plan = tiny_plan(mc, sharding="", unroll_layers=unroll)
        sess = plan.build_session(mc)
        sess.dataset.sequence_length = 33
        losses[unroll] = run_two_steps(sess)
    assert abs(losses[True] - losses[False]) <= 2e-4 * abs(losses[False])


def test_master_weights_device_layout():
    """master_weights=True: live params bf16, f32 master in opt_state on
    device; trajectory tracks the f32 baseline to bf16-compute tolerance."""
    import jax.numpy as jnp

    mc = get_model_class("pythia-14m")
    sess = tiny_plan(mc, bf16=True, master_weights=True, opt_state_dtype="bf16", grad_accum_dtype="bf16").build_session(mc)
    sess.dataset.sequence_length = 33
    assert sess.master_device
    state = sess.init_state()
    assert jax.tree.leaves(state.params)[0].dtype == jnp.bfloat16
    masters = [x for x in jax.tree.leaves(state.opt_state["master"]) if x.ndim > 0]
    assert masters and all(m.dtype == jnp.float32 for m in masters)
    step = sess.train_step_fn()
    for i in range(2):
        state, metrics = step(state, sess.make_train_batch(seed=i), jax.random.key(i))
    # params must equal the rounded master after every step
    for p, m in zip(jax.tree.leaves(state.params), jax.tree.leaves(state.opt_state["master"])):
        np.testing.assert_array_equal(np.asarray(p), np.asarray(m.astype(jnp.bfloat16)))
    assert np.isfinite(float(metrics["loss"]))


def test_sr_params_masterless_layout():
    """master_weights="sr": no master anywhere in the state; params update
    by stochastic rounding, trajectory stays near the f32 path over two
    steps, and the rounding is deterministic given the step count."""
    import jax.numpy as jnp

    mc = get_model_class("pythia-14m")

    def build():
        sess = tiny_plan(mc, bf16=True, master_weights="sr", opt_state_dtype="bf16", grad_accum_dtype="bf16").build_session(mc)
        sess.dataset.sequence_length = 33
        return sess

    sess = build()
    assert sess.sr_params and not sess.master_device
    state = sess.init_state()
    assert "master" not in jax.tree_util.tree_structure(state.opt_state).__str__()
    step = sess.train_step_fn()
    for i in range(2):
        state, metrics = step(state, sess.make_train_batch(seed=i), jax.random.key(i))
    loss = float(metrics["loss"])
    assert np.isfinite(loss)
    # bf16-compute + SR noise on a 2-step toy trajectory stays near f32
    assert abs(loss - _baseline_loss()) < 0.08
    # determinism: the SR key derives from the Adam count, not host state
    sess2 = build()
    state2 = sess2.init_state()
    step2 = sess2.train_step_fn()
    for i in range(2):
        state2, metrics2 = step2(state2, sess2.make_train_batch(seed=i), jax.random.key(i))
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.params)[0]), np.asarray(jax.tree.leaves(state2.params)[0])
    )


def test_stochastic_round_unbiased_and_exact():
    """The SR primitive: exact on representable values, unbiased in the
    mean on a half-ulp value."""
    import jax.numpy as jnp

    from multimodal_llm_pretraining_tpu.training.optimizer import stochastic_round_to

    key = jax.random.key(0)
    exact = jnp.asarray([1.0, -2.5, 0.0, 3.140625], jnp.float32)  # bf16-representable
    np.testing.assert_array_equal(
        np.asarray(stochastic_round_to(exact, jnp.bfloat16, key)), np.asarray(exact.astype(jnp.bfloat16))
    )
    # 1 + 2^-8 sits exactly halfway between bf16 neighbors 1.0 and 1 + 2^-7
    half = jnp.full((4096,), 1.0 + 2.0**-8, jnp.float32)
    rounded = stochastic_round_to(half, jnp.bfloat16, key).astype(jnp.float32)
    up = float(jnp.mean((rounded > 1.0).astype(jnp.float32)))
    assert 0.4 < up < 0.6, up
    mean = float(jnp.mean(rounded))
    assert abs(mean - (1.0 + 2.0**-8)) < 4e-4, mean
    # quarter-ulp: 1 + 2^-9 must round up with probability ~1/4
    quarter = jnp.full((4096,), 1.0 + 2.0**-9, jnp.float32)
    upq = float(jnp.mean((stochastic_round_to(quarter, jnp.bfloat16, key) > 1.0).astype(jnp.float32)))
    assert 0.17 < upq < 0.33, upq


def test_bf16_opt_state_dtype_knob():
    """opt_state_dtype="bf16" halves the stored moments; trajectory stays
    close to the f32 path (math is f32 per step, storage rounds once)."""
    mc = get_model_class("pythia-14m")
    sess = tiny_plan(mc, sharding="zero_2", opt_state_dtype="bf16").build_session(mc)
    sess.dataset.sequence_length = 33
    state = sess.init_state()
    import jax.numpy as jnp

    moments = [
        x
        for name in ("mu", "nu")
        for x in jax.tree.leaves(getattr(jax.tree.leaves(state.opt_state, is_leaf=lambda s: hasattr(s, "mu"))[0], name))
        if hasattr(x, "dtype") and x.ndim > 0
    ]
    assert moments and all(m.dtype == jnp.bfloat16 for m in moments)
    loss_lowp = run_two_steps(sess)
    assert np.isfinite(loss_lowp)
    assert abs(loss_lowp - _baseline_loss()) < 0.05  # bf16 moment rounding only


def test_bf16_state_layout_with_freeze_mask():
    """fused_adam_lowp under optax.masked: MaskedNode is an EMPTY NamedTuple,
    which an isinstance-tuple is_leaf marked as a leaf and IndexError'd --
    every state_layout arm of a freeze-masked model (llava, roberta) died in
    its probe worker (round-4 grid, logs/chain_r4.log). The masked fused
    update must step and leave frozen leaves untouched."""
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_llm_pretraining_tpu.models import SchedulerType
    from multimodal_llm_pretraining_tpu.training.optimizer import build_optimizer

    params = {"frozen": jnp.ones((4, 4), jnp.bfloat16), "train": jnp.ones((4, 4), jnp.bfloat16)}
    mask = {"frozen": False, "train": True}
    tx = build_optimizer(
        "adamw",
        {"lr": 1e-2, "weight_decay": 0.01},
        SchedulerType.COSINE,
        {"num_warmup_steps": 0},
        num_training_steps=10,
        max_grad_norm=1.0,
        trainable_mask=mask,
        opt_state_dtype=jnp.bfloat16,
    )
    state = tx.init(params)
    grads = {"frozen": jnp.zeros((), jnp.bfloat16), "train": jnp.full((4, 4), 0.5, jnp.bfloat16)}
    updates, state = tx.update(grads, state, params)
    new_params = optax.apply_updates(params, updates)
    assert jnp.all(new_params["frozen"] == params["frozen"])
    assert not jnp.all(new_params["train"] == params["train"])
    # moments exist only for the trainable leaf
    masked_state = jax.tree_util.tree_leaves(state, is_leaf=lambda x: isinstance(x, optax.MaskedNode))
    assert any(isinstance(leaf, optax.MaskedNode) for leaf in masked_state)
