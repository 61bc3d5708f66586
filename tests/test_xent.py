"""Chunked cross-entropy: numerics and gradients vs the direct computation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.ops.xent import chunked_lm_cross_entropy, lm_head_loss


def direct_xent(hidden, kernel, labels, bias=None):
    logits = (hidden @ kernel).astype(jnp.float32)
    if bias is not None:
        logits = logits + bias
    valid = labels != -100
    safe = jnp.where(valid, labels, 0)
    logz = jax.nn.logsumexp(logits, axis=-1)
    gold = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
    return ((logz - gold) * valid).sum() / jnp.maximum(valid.sum(), 1)


@pytest.mark.parametrize("n,chunk", [(100, 32), (64, 64), (7, 16)])
def test_chunked_matches_direct(n, chunk):
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(16, 50)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 50, n), jnp.int32)
    labels = labels.at[::3].set(-100)  # mix in ignored positions
    got = chunked_lm_cross_entropy(h, k, labels, chunk_size=chunk)
    want = direct_xent(h, k, labels)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_chunked_grads_match_direct():
    rng = np.random.default_rng(1)
    h = jnp.asarray(rng.normal(size=(40, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(8, 30)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 30, 40), jnp.int32)
    g1 = jax.grad(lambda h, k: chunked_lm_cross_entropy(h, k, labels, chunk_size=16), argnums=(0, 1))(h, k)
    g2 = jax.grad(lambda h, k: direct_xent(h, k, labels), argnums=(0, 1))(h, k)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_lm_head_loss_shift_semantics():
    """Causal shift: position t predicts token t+1 (HF CausalLM parity)."""
    rng = np.random.default_rng(2)
    h = jnp.asarray(rng.normal(size=(2, 10, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(8, 20)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 20, (2, 10)), jnp.int32)
    got = lm_head_loss(h, k, labels, shift=True, chunk_size=8)
    want = direct_xent(h[:, :-1].reshape(-1, 8), k, labels[:, 1:].reshape(-1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_lm_head_loss_bias_fold():
    rng = np.random.default_rng(3)
    h = jnp.asarray(rng.normal(size=(1, 12, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(8, 20)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(20,)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 20, (1, 12)), jnp.int32)
    got = lm_head_loss(h, k, labels, shift=False, bias=bias, chunk_size=8)
    want = direct_xent(h.reshape(-1, 8), k, labels.reshape(-1), bias=bias)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)


def test_rotary_rotation_property():
    """Rotary embedding preserves norms and equals the closed form at pos 0/1."""
    from multimodal_llm_pretraining_tpu.models.layers import apply_rotary, rotary_angles

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.normal(size=(1, 2, 6, 8)), jnp.float32)
    cos, sin = rotary_angles(jnp.arange(6), 8)
    y = apply_rotary(x, cos, sin)
    # rotation preserves per-pair norms
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(x), axis=-1), np.linalg.norm(np.asarray(y), axis=-1), rtol=1e-5
    )
    # position 0: identity
    np.testing.assert_allclose(np.asarray(y[:, :, 0]), np.asarray(x[:, :, 0]), atol=1e-6)


def test_patchify_matches_manual():
    from multimodal_llm_pretraining_tpu.ops.image_ops import patchify

    rng = np.random.default_rng(5)
    img = jnp.asarray(rng.normal(size=(1, 8, 8, 3)), jnp.float32)
    p = np.asarray(patchify(img, 4))
    assert p.shape == (1, 4, 48)
    manual = np.asarray(img)[0, :4, :4, :].reshape(16, 3).reshape(-1)
    np.testing.assert_allclose(p[0, 0], manual)
