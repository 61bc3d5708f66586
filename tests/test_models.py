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


def test_llava_merge_expands_attention_mask():
    """Padding positions survive the <image> expansion: text mask entries map
    through the same gather as labels, patch positions always attend."""
    from multimodal_llm_pretraining_tpu.models.llava import merge_image_features

    b, s, h, p = 1, 6, 4, 3
    image_token = 99
    ids = jnp.array([[7, 99, 8, 9, 0, 0]])  # image at pos 1, pad at 4..5
    am = jnp.array([[1, 1, 1, 1, 0, 0]])
    labels = jnp.array([[-100, -100, 8, 9, -100, -100]])
    embeds = jnp.arange(b * s * h, dtype=jnp.float32).reshape(b, s, h)
    feats = jnp.ones((b, p, h))
    merged, mlab, mmask = merge_image_features(embeds, feats, ids, labels, image_token, am)
    assert merged.shape == (b, s - 1 + p, h)
    # out positions: 0=text0, 1..3=patches, 4=text2, 5=text3, 6..7=pad
    np.testing.assert_array_equal(np.asarray(mmask), [[1, 1, 1, 1, 1, 1, 0, 0]])
    np.testing.assert_array_equal(np.asarray(mlab), [[-100, -100, -100, -100, 8, 9, -100, -100]])


def test_stack_broadcasts_attention_mask():
    """A padding mask threaded through a scanned layer stack changes outputs
    at positions that attend to the padded keys (and the stack traces with a
    single broadcast mask, not one slice per layer)."""
    import flax.linen as nn

    from multimodal_llm_pretraining_tpu.models.layers import SelfAttention, make_stack

    class Block(nn.Module):
        @nn.compact
        def __call__(self, x, mask=None):
            h = SelfAttention(num_heads=2, head_dim=4, causal=True, dtype=jnp.float32, name="attn")(x, mask=mask)
            return x + h, None


    class Net(nn.Module):
        @nn.compact
        def __call__(self, x, mask=None):
            out, _ = make_stack(Block, 2, remat=False)(x, mask)
            return out

    x = jnp.asarray(np.random.default_rng(0).normal(size=(1, 6, 8)), jnp.float32)
    net = Net()
    params = net.init(jax.random.key(0), x)
    dense = net.apply(params, x)
    mask = jnp.array([[1, 1, 1, 1, 0, 0]])
    masked = net.apply(params, x, mask=mask)
    # position 5 attends to padded key 4 only in the dense run
    assert not np.allclose(np.asarray(dense[0, 5]), np.asarray(masked[0, 5]))
    # position 0 sees only itself either way (causal)
    np.testing.assert_allclose(np.asarray(dense[0, 0]), np.asarray(masked[0, 0]), rtol=1e-5)


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
