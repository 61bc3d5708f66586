"""Execute the streaming-offload orchestration off-chip (round-2 verdict #5).

``MLPT_FAKE_HOST_OFFLOAD=1`` makes ``host_offload_supported()`` true on the
CPU mesh while mapping "host" shardings to device memory (the CPU backend
cannot execute ``annotate_device_placement``). Everything else -- the grouped
device-twin programs, chunked host state, streamed init, the MAX_INFLIGHT
throttle, and the real-Sharding ``out_shardings`` invariant
(``training/offload_update.py``, ``training/step.py``) -- runs exactly the
production code path, which previously executed only on the live chip.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.models import get_model_class
from multimodal_llm_pretraining_tpu.parallel import sharding as sharding_mod
from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
from multimodal_llm_pretraining_tpu.train import TrainingPlan
from multimodal_llm_pretraining_tpu.training.offload_update import StreamingOffloadUpdater


@pytest.fixture(autouse=True)
def fake_offload(monkeypatch):
    monkeypatch.setenv("MLPT_FAKE_HOST_OFFLOAD", "1")
    assert sharding_mod.host_offload_supported()
    yield
    monkeypatch.delenv("MLPT_FAKE_HOST_OFFLOAD", raising=False)


def _session(sharding="zero_2", bf16=False, **plan_kw):
    mc = get_model_class("pythia-14m")
    plan = TrainingPlan(
        num_training_steps=4,
        micro_batch_size=1,
        gradient_accumulation_steps=2,
        bf16=bf16,
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        sharding=sharding,
        offloading=True,
        max_grad_norm=mc.max_grad_norm,
        use_custom_kernels=False,
        mesh=MeshConfig(num_hosts=1, chips_per_host=8),
        **plan_kw,
    )
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 33
    return sess


def test_streaming_offload_step_executes_on_cpu():
    sess = _session()
    assert sess.streaming_offload, "fake offload must engage the streaming updater"
    state = sess.init_state()  # forced through init_grouped (streamed)
    assert set(state.opt_state.keys()) == {"count", "mu", "nu"}
    step = sess.train_step_fn()
    p0 = jax.tree.leaves(state.params)[0].copy()
    for i in range(2):
        state, metrics = step(state, sess.make_train_batch(seed=i), jax.random.key(i))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.opt_state["count"]) == 2
    assert not np.allclose(np.asarray(p0), np.asarray(jax.tree.leaves(state.params)[0]))
    # grouped programs were built and carried REAL Sharding out_shardings
    # (the round-2 silent failure: out_shardings=None sends host state to HBM)
    group_sigs = [s for s in sess.updater._group_jits if s != "clip"]
    assert group_sigs, "no grouped update programs were compiled"
    for sh in jax.tree.leaves(sess.opt_sharding):
        assert isinstance(sh, jax.sharding.Sharding)


def test_master_offload_bf16_layout_executes_on_cpu():
    sess = _session(bf16=True)
    assert sess.master_offload
    state = sess.init_state()
    assert "master" in state.opt_state
    # device copy bf16, f32 master rides in opt_state (ZeRO-Offload layout)
    assert jax.tree.leaves(state.params)[0].dtype == jnp.bfloat16
    masters = [x for x in jax.tree.leaves(state.opt_state["master"]) if x.ndim > 0]
    assert masters and all(m.dtype == jnp.float32 for m in masters)
    step = sess.train_step_fn()
    state, metrics = step(state, sess.make_train_batch(seed=0), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # master stays f32 and in sync: bf16 params == master.astype(bf16)
    p_l, treedef = jax.tree_util.tree_flatten(state.params)
    m_l = treedef.flatten_up_to(state.opt_state["master"])
    mask_l = treedef.flatten_up_to(sess.bundle.trainable_mask) if sess.bundle.trainable_mask is not None else [True] * len(p_l)
    for p, m, tr in zip(p_l, m_l, mask_l):
        if tr and m.ndim > 0:
            np.testing.assert_array_equal(np.asarray(p), np.asarray(m.astype(jnp.bfloat16)))


def test_chunked_host_state_and_throttle_execute_on_cpu(monkeypatch):
    """Shrink the group/chunk budgets so even pythia-14m's leaves split into
    row chunks: exercises the chunk programs, the per-chunk shardings, and
    the MAX_INFLIGHT throttle (block_on sync)."""
    monkeypatch.setattr(StreamingOffloadUpdater, "GROUP_BYTES", 64 * 1024)
    monkeypatch.setattr(StreamingOffloadUpdater, "CHUNK_THRESHOLD", 128 * 1024)
    throttled = []
    orig = StreamingOffloadUpdater._throttle

    def counting_throttle(self, probe, dispatched):
        out = orig(self, probe, dispatched)
        if out == 0 and dispatched >= self.MAX_INFLIGHT:
            throttled.append(1)
        return out

    monkeypatch.setattr(StreamingOffloadUpdater, "_throttle", counting_throttle)

    sess = _session()
    state = sess.init_state()
    # chunked leaves materialized as tuples of row chunks
    chunked = [x for x in jax.tree.leaves(state.opt_state["mu"], is_leaf=lambda x: isinstance(x, tuple)) if isinstance(x, tuple)]
    assert chunked, "no leaf chunked despite the tiny threshold"
    assert throttled, "MAX_INFLIGHT throttle never engaged during streamed init"
    step = sess.train_step_fn()
    state, metrics = step(state, sess.make_train_batch(seed=0), jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(state.opt_state["count"]) == 1
    # chunk-update programs were compiled
    assert any(isinstance(s, tuple) and s and s[0] == "chunk" for s in sess.updater._group_jits)


def test_offload_matches_plain_optimizer_trajectory():
    """Two steps of the streamed path == two steps of the fused optax path
    (same seeds, fp32): the offload machinery must be numerically invisible."""
    sess_off = _session()
    mc = get_model_class("pythia-14m")
    plan_plain = TrainingPlan(
        num_training_steps=4,
        micro_batch_size=1,
        gradient_accumulation_steps=2,
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        sharding="zero_2",
        max_grad_norm=mc.max_grad_norm,
        use_custom_kernels=False,
        mesh=MeshConfig(num_hosts=1, chips_per_host=8),
    )
    sess_plain = plan_plain.build_session(mc)
    sess_plain.dataset.sequence_length = 33

    s_off, s_plain = sess_off.init_state(), sess_plain.init_state()
    step_off, step_plain = sess_off.train_step_fn(), sess_plain.train_step_fn()
    for i in range(2):
        s_off, m_off = step_off(s_off, sess_off.make_train_batch(seed=i), jax.random.key(i))
        s_plain, m_plain = step_plain(s_plain, sess_plain.make_train_batch(seed=i), jax.random.key(i))
    np.testing.assert_allclose(float(m_off["loss"]), float(m_plain["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_off.params), jax.tree.leaves(s_plain.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
