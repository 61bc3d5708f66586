"""Streaming offload updater: numerical parity with the optax path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.models import SchedulerType
from multimodal_llm_pretraining_tpu.training.offload_update import StreamingOffloadUpdater
from multimodal_llm_pretraining_tpu.training.optimizer import build_optimizer


def make_tree(seed=0):
    rng = np.random.default_rng(seed)
    return {
        "w": jnp.asarray(rng.normal(size=(16, 8)), jnp.float32),
        "b": jnp.asarray(rng.normal(size=(8,)), jnp.float32),
        "stack": jnp.asarray(rng.normal(size=(4, 8, 8)), jnp.float32),
    }


@pytest.mark.parametrize("optimizer,max_grad_norm", [("adam", 1.0), ("adamw", 0.0), ("adam", 0.0), ("adamw", 1.0)])
def test_streaming_matches_optax(optimizer, max_grad_norm):
    kwargs = {"lr": 1e-2, "betas": (0.9, 0.95), "eps": 1e-8, "weight_decay": 0.01}
    sched = SchedulerType.LINEAR
    sched_kwargs = {"num_warmup_steps": 2}
    steps = 6

    params_a = make_tree()
    params_b = jax.tree.map(jnp.copy, params_a)

    tx = build_optimizer(optimizer, dict(kwargs), sched, dict(sched_kwargs), num_training_steps=steps, max_grad_norm=max_grad_norm)
    opt_a = tx.init(params_a)

    upd = StreamingOffloadUpdater(optimizer, dict(kwargs), sched, dict(sched_kwargs), num_training_steps=steps, max_grad_norm=max_grad_norm)
    opt_b = upd.init(params_b)

    import optax

    for i in range(4):
        grads = jax.tree.map(lambda p: jnp.sin(p + i) * 3.0, params_a)  # big grads exercise clipping
        updates, opt_a = tx.update(grads, opt_a, params_a)
        params_a = optax.apply_updates(params_a, updates)
        params_b, opt_b = upd(params_b, opt_b, grads, acc_steps=1.0)

        for ka, kb in zip(jax.tree.leaves(params_a), jax.tree.leaves(params_b)):
            np.testing.assert_allclose(np.asarray(ka), np.asarray(kb), rtol=2e-5, atol=1e-7)


def test_master_weights_mode_matches_f32_trajectory():
    """ZeRO-Offload bf16 layout: updates computed on the f32 master must
    track the plain-f32 updater exactly; the returned params are the bf16
    cast of that master (not a bf16-resolution random walk)."""
    kwargs = {"lr": 1e-2, "betas": (0.9, 0.95), "eps": 1e-8, "weight_decay": 0.01}
    sched, sched_kwargs, steps = SchedulerType.LINEAR, {"num_warmup_steps": 1}, 8

    params_f32 = make_tree(3)
    upd_ref = StreamingOffloadUpdater("adam", dict(kwargs), sched, dict(sched_kwargs), num_training_steps=steps, max_grad_norm=1.0)
    upd_master = StreamingOffloadUpdater(
        "adam", dict(kwargs), sched, dict(sched_kwargs), num_training_steps=steps, max_grad_norm=1.0, master_weights=True
    )

    p_ref = jax.tree.map(jnp.copy, params_f32)
    opt_ref = upd_ref.init(p_ref)
    p_bf16 = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params_f32)
    opt_m = upd_master.init(p_bf16)
    # master initialized as the f32 upcast of the bf16 model copy
    ref_master = jax.tree.map(lambda x: x.astype(jnp.bfloat16).astype(jnp.float32), params_f32)
    p_ref = jax.tree.map(jnp.copy, ref_master)
    opt_ref = upd_ref.init(p_ref)

    for i in range(3):
        grads = jax.tree.map(lambda p: jnp.cos(p.astype(jnp.float32) + i), params_f32)
        p_ref, opt_ref = upd_ref(p_ref, opt_ref, grads, acc_steps=1.0)
        p_bf16, opt_m = upd_master(p_bf16, opt_m, grads, acc_steps=1.0)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(opt_m["master"])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8)
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_bf16)):
            np.testing.assert_array_equal(np.asarray(a, dtype=np.float32).astype(jnp.bfloat16), np.asarray(b))
        assert all(l.dtype == jnp.bfloat16 for l in jax.tree.leaves(p_bf16))


def test_grouped_update_matches_per_leaf():
    """grouped() (one jitted program per bounded leaf group) must be
    numerically identical to the per-leaf dispatch path -- including when the
    byte budget forces several groups."""
    from types import SimpleNamespace

    kwargs = {"lr": 1e-2, "betas": (0.9, 0.95), "eps": 1e-8, "weight_decay": 0.01}
    upd = StreamingOffloadUpdater(
        "adam", dict(kwargs), SchedulerType.LINEAR, {"num_warmup_steps": 1},
        num_training_steps=8, max_grad_norm=1.0, master_weights=True,
    )
    upd.GROUP_BYTES = 256  # tiny budget: every leaf pair lands in its own group
    params_f32 = make_tree(5)
    p_a = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params_f32)
    p_b = jax.tree.map(jnp.copy, p_a)
    opt_a = upd.init(p_a)
    opt_b = upd.init(p_b)

    dummy = jax.tree.map(lambda _: SimpleNamespace(), params_f32)
    for i in range(3):
        grads = jax.tree.map(lambda p: jnp.sin(p.astype(jnp.float32) * 7 + i), params_f32)
        p_a, opt_a = upd(p_a, opt_a, grads, acc_steps=2.0)
        p_b, opt_b = upd.grouped(
            p_b, opt_b, grads, 2.0, param_sharding=dummy,
            opt_sharding={"mu": dummy, "nu": dummy, "master": dummy},
        )
        for a, b in zip(jax.tree.leaves((p_a, opt_a)), jax.tree.leaves((p_b, opt_b))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_streaming_respects_trainable_mask():
    params = make_tree()
    mask = {"w": False, "b": True, "stack": True}
    upd = StreamingOffloadUpdater(
        "adamw", {"lr": 1e-2}, SchedulerType.LINEAR, {"num_warmup_steps": 0}, num_training_steps=10, max_grad_norm=0.0, trainable_mask=mask
    )
    opt = upd.init(params)
    grads = jax.tree.map(jnp.ones_like, params)
    before = {k: np.asarray(v) for k, v in params.items()}  # updater donates its inputs
    new_params, _ = upd(params, opt, grads, acc_steps=1.0)
    np.testing.assert_array_equal(np.asarray(new_params["w"]), before["w"])
    assert not np.array_equal(np.asarray(new_params["b"]), before["b"])


def test_streaming_grad_accum_scaling():
    """acc_steps divides the summed grads (mean semantics)."""
    params = make_tree(1)
    upd = StreamingOffloadUpdater("adamw", {"lr": 1e-2}, SchedulerType.LINEAR, {"num_warmup_steps": 0}, num_training_steps=10, max_grad_norm=0.0)
    g = jax.tree.map(jnp.ones_like, params)
    p1, _ = upd(jax.tree.map(jnp.copy, params), upd.init(params), g, acc_steps=1.0)
    g2 = jax.tree.map(lambda x: 2 * x, g)
    p2, _ = upd(jax.tree.map(jnp.copy, params), upd.init(params), g2, acc_steps=2.0)
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_session_offload_path_on_cpu_mesh():
    """End-to-end: a session with offloading uses the streaming path (host
    memory unsupported on CPU, so moments stay on device, but the update
    machinery and step composition are exercised)."""
    from multimodal_llm_pretraining_tpu.models import get_model_class
    from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
    from multimodal_llm_pretraining_tpu.parallel.sharding import host_offload_supported
    from multimodal_llm_pretraining_tpu.train import TrainingPlan

    mc = get_model_class("pythia-14m")
    plan = TrainingPlan(
        num_training_steps=4,
        micro_batch_size=1,
        gradient_accumulation_steps=2,
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        sharding="zero_1",
        offloading=True,
        max_grad_norm=mc.max_grad_norm,
        use_custom_kernels=False,
        mesh=MeshConfig(num_hosts=1, chips_per_host=8),
    )
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 17
    assert sess.streaming_offload == host_offload_supported()
    state = sess.init_state()
    step = sess.train_step_fn()
    for i in range(2):
        state, m = step(state, sess.make_train_batch(seed=i), jax.random.key(0))
    assert np.isfinite(float(m["loss"]))
    assert int(jax.tree.leaves(state.opt_state if not sess.streaming_offload else state.opt_state["count"])[0].sum() if not sess.streaming_offload else state.opt_state["count"]) == 2


def test_init_grouped_matches_init():
    """init_grouped (bounded device programs writing host state) must equal
    the plain init tree: same structure, zeros moments, f32 master copies."""
    from types import SimpleNamespace

    kwargs = {"lr": 1e-2, "betas": (0.9, 0.95), "eps": 1e-8, "weight_decay": 0.0}
    upd = StreamingOffloadUpdater(
        "adam", dict(kwargs), SchedulerType.LINEAR, {"num_warmup_steps": 1},
        num_training_steps=4, max_grad_norm=0.0, master_weights=True,
        trainable_mask={"w": True, "b": False, "stack": True},
    )
    upd.GROUP_BYTES = 256
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), make_tree(3))
    want = upd.init(params)
    dummy = jax.tree.map(lambda _: SimpleNamespace(), params)
    got = upd.init_grouped(params, opt_sharding={"mu": dummy, "nu": dummy, "master": dummy})
    assert jax.tree_util.tree_structure(want) == jax.tree_util.tree_structure(got)
    for a, b in zip(jax.tree.leaves(want), jax.tree.leaves(got)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_chunked_leaves_match_unchunked():
    """Leaves over GROUP_BYTES split into row-chunk host arrays (the
    pythia-2.8b stacked-layer case); the chunked update must reproduce the
    unchunked trajectory exactly, through both grouped() and __call__()."""
    from types import SimpleNamespace

    kwargs = {"lr": 1e-2, "betas": (0.9, 0.95), "eps": 1e-8, "weight_decay": 0.01}

    def make(chunk_bytes):
        upd = StreamingOffloadUpdater(
            "adamw", dict(kwargs), SchedulerType.LINEAR, {"num_warmup_steps": 1},
            num_training_steps=8, max_grad_norm=1.0, master_weights=True,
        )
        upd.GROUP_BYTES = chunk_bytes
        return upd

    params = {"big": jnp.arange(96, dtype=jnp.float32).reshape(12, 8) / 37.0, "small": jnp.ones((4,)) * 0.5}
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    upd_ref = make(1 << 30)  # nothing chunks
    upd_chunk = make(5 * 8 * 4)  # "big" splits into 5-row chunks (12 rows -> 3 chunks)
    upd_chunk.CHUNK_THRESHOLD = 0  # chunk at the group budget for the test
    assert upd_chunk._chunk_ranges((12, 8)) == [(0, 5), (5, 10), (10, 12)]

    p_ref, p_grp, p_call = params, jax.tree.map(jnp.copy, params), jax.tree.map(jnp.copy, params)
    s_ref, s_grp, s_call = upd_ref.init(p_ref), upd_chunk.init(p_grp), upd_chunk.init(p_call)
    assert isinstance(s_grp["mu"]["big"], tuple) and len(s_grp["mu"]["big"]) == 3

    dummy = jax.tree.map(lambda _: SimpleNamespace(), p_ref)
    dummy_chunk = jax.tree.map(lambda x: SimpleNamespace(), s_grp["mu"])
    for i in range(3):
        base = p_ref  # pre-update params: identical across the three paths

        def mk_grads():
            return jax.tree.map(lambda p: jnp.cos(p.astype(jnp.float32) * 3 + i), base)

        p_ref, s_ref = upd_ref(p_ref, s_ref, mk_grads(), acc_steps=2.0)
        # grouped() donates the grads buffers -- each consumer gets its own
        p_grp, s_grp = upd_chunk.grouped(
            p_grp, s_grp, mk_grads(), 2.0, param_sharding=dummy,
            opt_sharding={"mu": dummy_chunk, "nu": dummy_chunk, "master": dummy_chunk},
        )
        p_call, s_call = upd_chunk(p_call, s_call, mk_grads(), acc_steps=2.0)

    for name, p_other in [("grouped", p_grp), ("call", p_call)]:
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_other)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=name)
    # chunked state, concatenated, equals the unchunked moments
    for key in ("mu", "nu", "master"):
        cat = jnp.concatenate([np.asarray(c) for c in s_grp[key]["big"]], axis=0)
        np.testing.assert_array_equal(np.asarray(s_ref[key]["big"]), np.asarray(cat))


@pytest.mark.parametrize("master", [True, False])
def test_chunked_host_resident_params_match(monkeypatch, master):
    """offload_params arms (zero_3 / fsdp_full_shard + offloading) keep the
    LIVE param leaf in pinned host memory. A host-space array cannot feed
    dynamic_update_slice, so the chunked update accumulates new rows in a
    device carry instead (offload_update._chunk_fn_hostparam); the trajectory
    must match the plain chunked path exactly. _is_host is forced True so the
    CPU run takes the host-param branch."""
    from multimodal_llm_pretraining_tpu.training import offload_update as ou
    from types import SimpleNamespace

    kwargs = {"lr": 1e-2, "betas": (0.9, 0.95), "eps": 1e-8, "weight_decay": 0.01}

    def make():
        upd = StreamingOffloadUpdater(
            "adamw", dict(kwargs), SchedulerType.LINEAR, {"num_warmup_steps": 1},
            num_training_steps=8, max_grad_norm=1.0, master_weights=master,
        )
        upd.GROUP_BYTES = 5 * 8 * 4  # "big" (12 rows) -> 3 chunks
        upd.CHUNK_THRESHOLD = 0
        return upd

    params = {"big": jnp.arange(96, dtype=jnp.float32).reshape(12, 8) / 37.0, "small": jnp.ones((4,)) * 0.5}
    params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)

    # reference trajectory: plain chunked path (params "on device")
    upd_ref = make()
    p_ref = params
    s_ref = upd_ref.init(p_ref)

    upd_host = make()
    p_host = jax.tree.map(jnp.copy, params)
    s_host = upd_host.init(p_host)

    dummy = jax.tree.map(lambda _: SimpleNamespace(), params)
    dummy_chunk = jax.tree.map(lambda x: SimpleNamespace(), s_ref["mu"])
    opt_sh = {"mu": dummy_chunk, "nu": dummy_chunk, "master": dummy_chunk}

    for i in range(3):
        # numpy snapshot: grouped() donates both param and grad buffers
        base = jax.tree.map(lambda p: np.asarray(p.astype(jnp.float32)), p_ref)

        def mk_grads():
            return jax.tree.map(lambda p: jnp.cos(jnp.asarray(p) * 3 + i), base)

        p_ref, s_ref = upd_ref.grouped(p_ref, s_ref, mk_grads(), 2.0, param_sharding=dummy, opt_sharding=opt_sh)
        monkeypatch.setattr(ou, "_is_host", lambda sh: True)
        p_host, s_host = upd_host.grouped(p_host, s_host, mk_grads(), 2.0, param_sharding=dummy, opt_sharding=opt_sh)
        monkeypatch.setattr(ou, "_is_host", lambda sh: getattr(sh, "memory_kind", None) == "pinned_host")

    for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_host)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    keys = ("mu", "nu", "master") if master else ("mu", "nu")
    for key in keys:
        for a, b in zip(jax.tree.leaves(s_ref[key]), jax.tree.leaves(s_host[key])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
