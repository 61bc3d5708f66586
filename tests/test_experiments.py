"""Harness tests: step cache, config expansion, analytic estimates, sweeps."""

import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.experiments.cache import MemoryWorkspace, step, set_workspace
from multimodal_llm_pretraining_tpu.experiments.config import TrainingConfig
from multimodal_llm_pretraining_tpu.experiments.sweeps import TrainingTimeEmpiricalSweep
from multimodal_llm_pretraining_tpu.experiments.training_time_empirical import TrainingTimeEmpirical
from multimodal_llm_pretraining_tpu.benchmarking.flops import analytic_flops_per_example, transformer_flops_per_token
from multimodal_llm_pretraining_tpu.models import get_model_class
from multimodal_llm_pretraining_tpu.tpus import chip_spec, peak_tflops


@pytest.fixture(autouse=True)
def fresh_workspace():
    ws = MemoryWorkspace()
    set_workspace(ws)
    yield ws
    set_workspace(MemoryWorkspace())


def test_step_cache_memoizes(fresh_workspace):
    calls = []

    @step(cacheable=True, version="001")
    def expensive(x):
        calls.append(x)
        return x * 2

    c1 = expensive(x=21)
    assert c1.result() == 42
    assert c1.result() == 42
    assert calls == [21]
    # different args -> different cache entry
    assert expensive(x=10).result() == 20
    assert calls == [21, 10]


def test_step_cache_version_invalidates(fresh_workspace):
    @step(cacheable=True, version="001")
    def f(x):
        return x

    @step(cacheable=True, version="002")
    def f2(x):
        return x + 1

    f2.__wrapped_step__.__name__ = "f"
    assert f(x=1).unique_id() != f2(x=1).unique_id()


def test_step_graph_hashing(fresh_workspace):
    @step()
    def a(x):
        return x + 1

    @step()
    def b(y):
        return y * 10

    upstream = a(x=1)
    downstream = b(y=upstream)
    assert downstream.result() == 20
    # changing upstream input changes downstream id
    assert b(y=a(x=2)).unique_id() != downstream.unique_id()


def test_infrastructure_error_is_never_cached(fresh_workspace):
    """A backend fault must not become a permanent 'arm failed' record:
    re-running the step retries the work (cache.py skips the StepFailure
    store for InfrastructureError)."""
    from multimodal_llm_pretraining_tpu.experiments.cache import StepFailure
    from multimodal_llm_pretraining_tpu.utils import InfrastructureError

    calls = []

    @step(cacheable=True, version="001")
    def flaky(x):
        calls.append(x)
        if len(calls) == 1:
            raise InfrastructureError("UNAVAILABLE: TPU device error")
        return x * 2

    call = flaky(x=3)
    with pytest.raises(InfrastructureError):
        call.result(record_failure=True)
    assert not call.is_cached()  # nothing recorded
    assert call.result(record_failure=True) == 6  # re-run retries
    assert calls == [3, 3]

    # a genuine workload failure IS cached as a StepFailure
    @step(cacheable=True, version="001")
    def broken(x):
        raise ValueError("bad arm")

    bcall = broken(x=1)
    with pytest.raises(ValueError):
        bcall.result(record_failure=True)
    assert bcall.is_cached()
    assert isinstance(bcall.result(), StepFailure)

    # backend faults raised in the MAIN process arrive as plain
    # RuntimeErrors (no InfrastructureError type) -- classified by message
    @step(cacheable=True, version="001")
    def init_fault(x):
        raise RuntimeError(
            "Unable to initialize backend 'axon': UNAVAILABLE: "
            "TPU backend setup/compile error (Unavailable)."
        )

    icall = init_fault(x=1)
    with pytest.raises(RuntimeError):
        icall.result(record_failure=True)
    assert not icall.is_cached()

    # ...but an OOM wrapped in backend-error text is still the ARM failing
    @step(cacheable=True, version="001")
    def oom(x):
        raise RuntimeError("XLA:TPU compile permanent error. Ran out of memory in memory space hbm.")

    ocall = oom(x=1)
    with pytest.raises(RuntimeError):
        ocall.result(record_failure=True)
    assert ocall.is_cached()
    assert isinstance(ocall.result(), StepFailure)


def test_single_chip_offload_arms_share_one_measurement():
    """On one chip zero_1/zero_2/fsdp_shard_grad_op(+offload) compile to the
    same program (sharding over a 1-sized axis is a no-op; only the offload
    flags differ), so their benchmark steps must share one cache entry."""

    def uid(sharding, **kw):
        cfg = TrainingConfig(num_hosts=1, chips_per_host=1, tpu_type="v5e", model="pythia-1b",
                             free_lunch=True, activation_checkpointing=True, sharding=sharding, **kw)
        exp = TrainingTimeEmpirical(config=cfg)
        return exp.step_dict["benchmarking_results"].unique_id()

    # opt-state-offload class
    assert uid("zero_1", offloading=True) == uid("zero_2", offloading=True) == uid("fsdp_shard_grad_op", offloading=True)
    # opt+param-offload class is distinct
    assert uid("zero_3", offloading=True) == uid("fsdp_full_shard", offloading=True)
    assert uid("zero_1", offloading=True) != uid("zero_3", offloading=True)

    # multi-chip arms keep distinct measurements (collectives really differ)
    def uid8(sharding):
        cfg = TrainingConfig(num_hosts=1, chips_per_host=8, tpu_type="v5e", model="pythia-1b",
                             free_lunch=True, activation_checkpointing=True, sharding=sharding, offloading=True)
        return TrainingTimeEmpirical(config=cfg).step_dict["benchmarking_results"].unique_id()

    assert uid8("zero_1") != uid8("zero_2")
    # the grid row itself still reports the arm's own config
    cfg = TrainingConfig(num_hosts=1, chips_per_host=1, tpu_type="v5e", model="pythia-1b",
                         free_lunch=True, activation_checkpointing=True, sharding="zero_2", offloading=True)
    assert TrainingTimeEmpirical(config=cfg).to_dict()["sharding"] == "zero_2"


def test_training_config_expansion():
    cfg = TrainingConfig(
        num_hosts=1, chips_per_host=8, tpu_type="v4", model="pythia-160m", free_lunch=True, sharding="zero_2", offloading=False
    )
    plan = cfg.training_plan()
    assert plan.fp16 and not plan.bf16  # pythia-160m declares fp16
    assert plan.matmul_precision == "high"
    assert plan.use_custom_kernels
    assert plan.sharding == "zero_2"
    policy = plan.sharding_policy()
    assert policy.opt_state == "sharded" and policy.grads == "sharded" and policy.params == "replicated"
    assert plan.is_valid()


def test_validity_rules_match_reference():
    def make(**kw):
        base = dict(num_hosts=1, chips_per_host=8, tpu_type="v4", model="pythia-160m")
        base.update(kw)
        return TrainingTimeEmpirical(config=TrainingConfig(**base))

    assert make().is_valid()
    # offloading without sharding invalid (reference :183-185)
    assert not make(offloading=True).is_valid()
    # sharding on one chip invalid unless offloading (reference :177-182)
    assert not make(chips_per_host=1, sharding="zero_1").is_valid()
    assert make(chips_per_host=1, sharding="zero_1", offloading=True).is_valid()
    # hybrid needs >1 host
    assert not make(sharding="fsdp_hybrid_shard").is_valid()
    assert TrainingTimeEmpirical(
        config=TrainingConfig(num_hosts=2, chips_per_host=4, tpu_type="v4", model="pythia-160m", sharding="fsdp_hybrid_shard")
    ).is_valid()
    # unroll_layers is a real arm only for scanned-stack models (pythia,
    # mamba) under free lunch; elsewhere the compiled program is identical
    # to the unroll=False arm, so the grid drops it
    assert make(free_lunch=True, unroll_layers=True).is_valid()
    assert not make(free_lunch=False, unroll_layers=True).is_valid()
    assert not make(model="vit", free_lunch=True, unroll_layers=True).is_valid()
    assert make(model="mamba", free_lunch=True, unroll_layers=True).is_valid()


def test_sweep_grid_counts():
    sweep = TrainingTimeEmpiricalSweep(
        search_space=dict(
            num_hosts=[1],
            chips_per_host=[8],
            tpu_type=["v4"],
            model=["pythia-160m"],
            free_lunch=[True],
            activation_checkpointing=[False, True],
            sharding=["", "zero_1", "zero_2", "zero_3", "fsdp_shard_grad_op", "fsdp_full_shard"],
            offloading=[False, True],
        )
    )
    exps = sweep.experiments()
    # offloading=True with sharding="" filtered: 2 * (6*2 - 1) = 22
    assert len(exps) == 22


def test_analytic_flops_pythia():
    mc = get_model_class("pythia-160m")
    flops = analytic_flops_per_example(mc)
    # ~6 * N * T: 6 * 162e6 * 2049 ~= 2.0e12
    assert 1.5e12 < flops < 3.0e12


def test_analytic_flops_all_families():
    """Closed forms exist for every family but Mamba (round-4 verdict item 7).

    Anchors: ConvNeXt-L forward = 34.4 GMACs (ConvNeXt paper Table 1 =
    68.8 GFLOPs at 2 FLOPs/MAC); llava-finetune > llava-pretrain by exactly
    one extra LM backward pass (trainable vs frozen LM); the custom ViLT
    trunk (40L x 1408H, 3 passes) dwarfs the original B/32 trunk."""
    from multimodal_llm_pretraining_tpu.benchmarking.flops import convnext_flops_per_example

    fwd_l = convnext_flops_per_example((3, 3, 27, 3), (192, 384, 768, 1536), 1000, backward=False)
    assert fwd_l == pytest.approx(68.8e9, rel=0.01)
    assert convnext_flops_per_example((3, 3, 27, 3), (192, 384, 768, 1536), 1000) == pytest.approx(3 * fwd_l)

    vals = {m: analytic_flops_per_example(get_model_class(m)) for m in [
        "convnext-large-1k", "convnext-large-22k", "convnext-xlarge-22k",
        "llava-pretrain", "llava-finetune", "vilt-pretrain", "vilt-original-pretrain",
    ]}
    for m, v in vals.items():
        assert v and v > 0, m
    assert vals["convnext-xlarge-22k"] > vals["convnext-large-22k"] > vals["convnext-large-1k"]
    # finetune adds one ~2.84 TFLOP LM fwd-equivalent (stack + head) on top
    assert 1.2 < vals["llava-finetune"] / vals["llava-pretrain"] < 1.6
    assert vals["vilt-pretrain"] / vals["vilt-original-pretrain"] > 10
    assert analytic_flops_per_example(get_model_class("mamba")) is None


def test_chip_registry():
    assert chip_spec("v5p").peak_bf16_tflops == 459.0
    assert peak_tflops("v4", "bf16") == 275.0
    assert peak_tflops("v4", "fp32_high") == pytest.approx(275.0 / 3)
    f = transformer_flops_per_token(12, 768, 2049, vocab=50304)
    assert f > 0


def test_analytic_training_days():
    from multimodal_llm_pretraining_tpu.experiments.training_time_analytic import estimate_training_days_from_flops

    cfg = TrainingConfig(num_hosts=1, chips_per_host=4, tpu_type="v4", model="pythia-160m", free_lunch=True)
    call = estimate_training_days_from_flops(total_flops=1e21, config=cfg)
    days = call.result()
    # 1e21 / (4 * 275e12 * 86400) ~= 10.5 days
    assert np.isclose(days, 1e21 / (4 * 275e12 * 86400), rtol=1e-6)
