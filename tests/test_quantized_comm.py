"""Int8 quantized all-gather (zero_3++ analog) on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from multimodal_llm_pretraining_tpu.ops.quantized_comm import quantized_all_gather
from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig, build_mesh


@pytest.fixture()
def mesh():
    return build_mesh(MeshConfig(num_hosts=1, chips_per_host=8))


def test_quantized_gather_accuracy(mesh):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))
    out = quantized_all_gather(xs, mesh, P("data", None))
    # int8 symmetric quantization: relative error bounded by ~1/127 of row max
    err = np.abs(np.asarray(out) - np.asarray(x))
    row_max = np.abs(np.asarray(x)).max(axis=1, keepdims=True)
    assert (err <= row_max / 127.0 + 1e-6).all()
    # and the gather really replicated over the data axis
    assert out.sharding.is_fully_replicated or "data" not in jax.tree.leaves(out.sharding.spec)


def test_quantized_gather_second_dim(mesh):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(16, 64)), jnp.float32)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, "data")))
    out = quantized_all_gather(xs, mesh, P(None, "data"))
    err = np.abs(np.asarray(out) - np.asarray(x))
    assert err.max() < np.abs(np.asarray(x)).max() / 100


def test_zero_3pp_end_to_end():
    """zero_3++ trains with int8 param gathers on a hybrid 2x4 mesh and the
    loss stays close to the exact zero_3 trajectory."""
    from multimodal_llm_pretraining_tpu.models import get_model_class
    from multimodal_llm_pretraining_tpu.train import TrainingPlan

    mc = get_model_class("pythia-14m")

    def run(sharding, mesh_cfg):
        plan = TrainingPlan(
            num_training_steps=3,
            micro_batch_size=1,
            gradient_accumulation_steps=1,
            optimizer=mc.optimizer,
            optimizer_kwargs=mc.optimizer_kwargs,
            scheduler_type=mc.scheduler_type,
            scheduler_kwargs=mc.scheduler_kwargs,
            sharding=sharding,
            max_grad_norm=mc.max_grad_norm,
            use_custom_kernels=False,
            mesh=mesh_cfg,
        )
        sess = plan.build_session(mc)
        sess.dataset.sequence_length = 17
        state = sess.init_state()
        step = sess.train_step_fn()
        for i in range(2):
            state, m = step(state, sess.make_train_batch(seed=i), jax.random.key(0))
        return float(m["loss"])

    exact = run("zero_3", MeshConfig(num_hosts=2, chips_per_host=4))
    quantized = run("zero_3++", MeshConfig(num_hosts=2, chips_per_host=4))
    assert np.isfinite(quantized)
    # int8 weight communication perturbs the trajectory slightly, not wildly
    assert abs(quantized - exact) / exact < 0.02
