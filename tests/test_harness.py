"""Benchmark harness + trainer tests on the CPU mesh."""

import numpy as np

from multimodal_llm_pretraining_tpu.benchmarking.max_batch_size import find_max_mbs_pow2
from multimodal_llm_pretraining_tpu.benchmarking.step_time import benchmark_acc_optim_times, estimate_step_time
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
    acc_t, opt_t = benchmark_acc_optim_times(h, micro_batch_size=1, training_steps=2, accumulations=2, warmup=True)
    assert acc_t > 0 and opt_t > 0
    # step-time extrapolation: acc x gas + optim (reference protocol)
    st = estimate_step_time(h, micro_batch_size=1, target_micro_batch_size=4, num_benchmarking_steps=1)
    assert st > 0


def test_max_mbs_search_respects_budget():
    h = small_harness()
    h.setup()
    # a tiny artificial budget forces the predictive path to cap the search
    tiny_budget = h.persistent_state_bytes() + 2 * 1024 * 1024
    best_tiny = find_max_mbs_pow2(h, limit=8, hbm_budget_bytes=tiny_budget, confirm_with_step=False)
    big = find_max_mbs_pow2(h, limit=4, hbm_budget_bytes=1 << 40, confirm_with_step=False)
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
