"""Model-zoo contract tests: every model type builds, traces, and has the
reference's workload hyperparameters (cited sizes from BASELINE.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.models import MODEL_TYPES, get_model_class
from multimodal_llm_pretraining_tpu.utils import param_count

# published parameter counts (millions, +-2%)
EXPECTED_PARAMS_M = {
    "pythia-14m": 14.1,
    "pythia-70m": 70.4,
    "pythia-160m": 162.3,
    "pythia-410m": 405.3,
    "pythia-1b": 1011.8,
    "pythia-2.8b": 2775.2,
    "mamba": 2768.3,
    "roberta": 355.4,
    "vit": 325.6,
    "convnext-large-1k": 197.8,
    "vilt-original-pretrain": 137.7,
}


@pytest.mark.parametrize("model_type", MODEL_TYPES)
def test_model_builds_and_traces(model_type):
    mc = get_model_class(model_type)
    bundle = mc.build_model(use_custom_kernels=False)
    shapes = jax.eval_shape(bundle.init_fn, jax.random.key(0))
    assert param_count(shapes) > 1e6

    ds = mc.load_dummy_dataset()
    if hasattr(ds, "sequence_length"):
        ds.sequence_length = min(ds.sequence_length, 64)
    batch = {k: jnp.asarray(v) for k, v in ds.sample_batch(2, seed=0).items()}
    loss_shape = jax.eval_shape(lambda p: bundle.loss_fn(p, batch, rng=jax.random.key(0), train=True)[0], shapes)
    assert loss_shape.shape == ()

    # workload hyperparameters exist and are sane
    assert mc.batch_size > 0 and mc.training_steps > 0
    assert mc.optimizer in ("adam", "adamw")
    assert "lr" in mc.optimizer_kwargs


@pytest.mark.parametrize("model_type,expected", sorted(EXPECTED_PARAMS_M.items()))
def test_param_counts_match_published(model_type, expected):
    mc = get_model_class(model_type)
    shapes = jax.eval_shape(mc.build_model(use_custom_kernels=False).init_fn, jax.random.key(0))
    actual = param_count(shapes) / 1e6
    assert abs(actual - expected) / expected < 0.02, f"{model_type}: {actual:.1f}M vs {expected}M"


def test_llava_pretrain_freezes_tower_and_lm():
    mc = get_model_class("llava-pretrain")
    bundle = mc.build_model(use_custom_kernels=False)
    mask_leaves = jax.tree_util.tree_flatten_with_path(bundle.trainable_mask)[0]
    trainable = [p for p, v in mask_leaves if v]
    frozen = [p for p, v in mask_leaves if not v]
    assert frozen, "tower/LM must be frozen"
    names = ["/".join(str(getattr(k, "key", k)) for k in p) for p in trainable]
    assert all("projector" in n for n in names), names
    # projector-only trainable params ~= 6.3M (reference prints this count)
    shapes = jax.eval_shape(bundle.init_fn, jax.random.key(0))
    n = sum(
        int(np.prod(l.shape))
        for (p, l), (_, t) in zip(jax.tree_util.tree_flatten_with_path(shapes)[0], mask_leaves)
        if t
    )
    assert 5e6 < n < 8e6


def test_vilt_finetune_is_mlm_only():
    mc = get_model_class("vilt-finetune")
    assert mc.target_tasks == ("mlm",)


def test_small_model_real_loss():
    """One real (non-abstract) forward+loss on the smallest model."""
    mc = get_model_class("pythia-14m")
    bundle = mc.build_model(use_custom_kernels=False)
    params = bundle.init_fn(jax.random.key(0))
    ds = mc.load_dummy_dataset()
    ds.sequence_length = 33
    batch = {k: jnp.asarray(v) for k, v in ds.sample_batch(2).items()}
    loss, metrics = bundle.loss_fn(params, batch, rng=jax.random.key(1))
    assert np.isfinite(float(loss))
    # initial CE should be near ln(vocab)
    assert 9.0 < float(loss) < 13.0
