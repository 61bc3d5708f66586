"""Benchmark harness + trainer tests on the CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_llm_pretraining_tpu.benchmarking.max_batch_size import find_max_mbs_pow2
from multimodal_llm_pretraining_tpu.benchmarking.step_time import estimate_step_time, measure_phase_times
from multimodal_llm_pretraining_tpu.benchmarking.utils import BenchmarkHarness
from multimodal_llm_pretraining_tpu.models import get_model_class
from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
from multimodal_llm_pretraining_tpu.train import TrainingPlan


def small_harness(limit_seq=17, mbs=1):
    mc = get_model_class("pythia-14m")
    plan = TrainingPlan(
        num_training_steps=1,
        micro_batch_size=mbs,
        gradient_accumulation_steps=1,
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        max_grad_norm=mc.max_grad_norm,
        use_custom_kernels=False,
        mesh=MeshConfig(num_hosts=1, chips_per_host=8),
    )
    h = BenchmarkHarness(plan, mc)
    h.session.dataset.sequence_length = limit_seq
    return h


def test_manual_steps_and_timing():
    h = small_harness()
    h.setup()
    times = measure_phase_times(h, micro_batch_size=1, samples=2)
    assert times.accumulate_s > 0 and times.optimizer_s > 0
    # step-time extrapolation: acc x gas + optim (reference protocol)
    st = estimate_step_time(h, micro_batch_size=1, target_micro_batch_size=4, num_benchmarking_steps=1)
    assert st > 0
    # the extrapolation is linear in accumulation steps by construction
    assert abs(times.step_time(4) - (4 * times.accumulate_s + times.optimizer_s)) < 1e-9


def test_max_mbs_search_respects_budget():
    h = small_harness()
    h.setup()
    # a tiny artificial budget forces the predictive path to cap the search
    tiny_budget = h.persistent_state_bytes() + 2 * 1024 * 1024
    best_tiny = find_max_mbs_pow2(h, limit=8, hbm_budget_bytes=tiny_budget)
    big = find_max_mbs_pow2(h, limit=4, hbm_budget_bytes=1 << 40)
    assert best_tiny <= big
    assert big == 4  # limit-capped on CPU


def test_trainer_runs_and_resumes(tmp_path):
    from multimodal_llm_pretraining_tpu.training.trainer import Trainer

    mc = get_model_class("pythia-14m")
    plan = TrainingPlan(
        num_training_steps=4,
        micro_batch_size=1,
        gradient_accumulation_steps=1,
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        max_grad_norm=mc.max_grad_norm,
        use_custom_kernels=False,
        mesh=MeshConfig(num_hosts=1, chips_per_host=8),
    )
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 17
    out = str(tmp_path / "ckpt")
    trainer = Trainer(sess, output_dir=out, save_steps=2, log_steps=1)
    metrics = trainer.train(max_steps=2)
    assert np.isfinite(metrics["loss"])
    assert trainer.checkpointer.latest_step() == 2

    # resume: a fresh trainer picks up from step 2 and finishes step 4
    sess2 = plan.build_session(mc)
    sess2.dataset.sequence_length = 17
    trainer2 = Trainer(sess2, output_dir=out, save_steps=10, log_steps=1)
    trainer2.train(max_steps=4)
    assert int(trainer2.final_state.step) == 4

    # pretrain -> finetune chain: a NEW run initializes its params from the
    # finished run's checkpoint but starts with fresh step/optimizer state
    # (reference from_pretrained chaining, src/models/llava.py:151-152)
    from multimodal_llm_pretraining_tpu.training.checkpoint import restore_params

    sess3 = plan.build_session(mc)
    sess3.dataset.sequence_length = 17
    fresh = sess3.init_state()
    chained = restore_params(out, fresh.params)
    a = np.asarray(jax.tree.leaves(chained)[0])
    b = np.asarray(jax.tree.leaves(trainer2.final_state.params)[0])
    np.testing.assert_array_equal(a, b)
    ft_dir = str(tmp_path / "finetune")
    trainer3 = Trainer(sess3, output_dir=ft_dir, save_steps=10, log_steps=1, init_params_from=out)
    trainer3.train(max_steps=1)
    assert int(trainer3.final_state.step) == 1  # fresh counter, not 4 + 1


def test_trainer_profiler_trace(tmp_path):
    """profile_dir writes a jax.profiler trace of steps 2-4 (aux subsystem
    5.1): the trace directory must exist and be non-empty after training."""
    import os

    from multimodal_llm_pretraining_tpu.training.trainer import Trainer

    mc = get_model_class("pythia-14m")
    plan = TrainingPlan(
        num_training_steps=4,
        micro_batch_size=1,
        gradient_accumulation_steps=1,
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        max_grad_norm=mc.max_grad_norm,
        use_custom_kernels=False,
        mesh=MeshConfig(num_hosts=1, chips_per_host=8),
    )
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 17
    prof = str(tmp_path / "trace")
    trainer = Trainer(sess, output_dir=str(tmp_path / "ckpt"), save_steps=100, log_steps=1, profile_dir=prof)
    trainer.train(max_steps=4)
    entries = [os.path.join(dp, f) for dp, _, fs in os.walk(prof) for f in fs]
    assert entries, "profiler trace directory is empty"


def test_trainer_resumes_bf16_sr_state_layout(tmp_path):
    """Checkpoint/resume under the headline all-bf16 state recipe (SR
    params, bf16 Adam moments, no master): orbax must round-trip the
    low-precision state tree exactly."""
    from multimodal_llm_pretraining_tpu.training.trainer import Trainer

    mc = get_model_class("pythia-14m")
    plan = TrainingPlan(
        num_training_steps=4,
        micro_batch_size=1,
        gradient_accumulation_steps=1,
        bf16=True,
        grad_accum_dtype="bf16",
        opt_state_dtype="bf16",
        master_weights="sr",
        optimizer=mc.optimizer,
        optimizer_kwargs=mc.optimizer_kwargs,
        scheduler_type=mc.scheduler_type,
        scheduler_kwargs=mc.scheduler_kwargs,
        max_grad_norm=mc.max_grad_norm,
        use_custom_kernels=False,
        mesh=MeshConfig(num_hosts=1, chips_per_host=8),
    )
    sess = plan.build_session(mc)
    sess.dataset.sequence_length = 17
    out = str(tmp_path / "ckpt")
    trainer = Trainer(sess, output_dir=out, save_steps=2, log_steps=1)
    trainer.train(max_steps=2)
    saved_params = jax.tree.leaves(trainer.final_state.params)
    assert all(p.dtype == jnp.bfloat16 for p in saved_params if p.ndim)

    sess2 = plan.build_session(mc)
    sess2.dataset.sequence_length = 17
    trainer2 = Trainer(sess2, output_dir=out, save_steps=10, log_steps=1)
    trainer2.train(max_steps=3)
    assert int(trainer2.final_state.step) == 3
    # the resumed step-2 params were bit-identical to the saved ones: the
    # step-3 state must stay bf16 end to end (no silent f32 promotion)
    resumed = jax.tree.leaves(trainer2.final_state.params)
    assert all(p.dtype == jnp.bfloat16 for p in resumed if p.ndim)
