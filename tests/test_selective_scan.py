"""Selective-scan (Mamba S6) correctness: chunked scan vs naive recurrence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.ops.selective_scan import causal_conv1d, selective_scan


def naive_selective_scan(u, delta, A, B, C, D):
    bsz, L, I = u.shape
    N = A.shape[1]
    h = np.zeros((bsz, I, N), np.float64)
    ys = []
    u64, d64 = np.asarray(u, np.float64), np.asarray(delta, np.float64)
    A64, B64, C64 = np.asarray(A, np.float64), np.asarray(B, np.float64), np.asarray(C, np.float64)
    for t in range(L):
        a = np.exp(d64[:, t, :, None] * A64[None])
        b = (d64[:, t] * u64[:, t])[:, :, None] * B64[:, t, None, :]
        h = a * h + b
        ys.append(np.einsum("bin,bn->bi", h, C64[:, t]))
    y = np.stack(ys, axis=1)
    return y + np.asarray(D, np.float64) * u64


@pytest.mark.parametrize("use_custom_kernels", [False, True])
def test_selective_scan_matches_naive(use_custom_kernels):
    rng = np.random.default_rng(0)
    bsz, L, I, N = 2, 70, 8, 4
    u = jnp.asarray(rng.normal(size=(bsz, L, I)), jnp.float32)
    delta = jnp.asarray(rng.random((bsz, L, I)) * 0.5 + 0.01, jnp.float32)
    A = -jnp.asarray(rng.random((I, N)) + 0.5, jnp.float32)
    B = jnp.asarray(rng.normal(size=(bsz, L, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(bsz, L, N)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(I,)), jnp.float32)

    y = selective_scan(u, delta, A, B, C, D, chunk_size=16, use_custom_kernels=use_custom_kernels)
    ref = naive_selective_scan(u, delta, A, B, C, D)
    np.testing.assert_allclose(np.asarray(y), ref, atol=1e-4)


def test_selective_scan_differentiable():
    rng = np.random.default_rng(1)
    bsz, L, I, N = 1, 40, 4, 2
    u = jnp.asarray(rng.normal(size=(bsz, L, I)), jnp.float32)
    delta = jnp.asarray(rng.random((bsz, L, I)) * 0.5 + 0.01, jnp.float32)
    A = -jnp.asarray(rng.random((I, N)) + 0.5, jnp.float32)
    B = jnp.asarray(rng.normal(size=(bsz, L, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(bsz, L, N)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(I,)), jnp.float32)

    def f(u):
        return (selective_scan(u, delta, A, B, C, D, chunk_size=16) ** 2).sum()

    g = jax.grad(f)(u)
    assert np.isfinite(np.asarray(g)).all()


def test_fused_pallas_backward_matches_xla_grads():
    """The fully fused Pallas reverse-time scan (interpret mode off-TPU) must
    produce the same cotangents as the XLA chunked scan's autodiff VJP for
    every input -- including shapes that exercise L-padding, multiple
    sub-chunks, and several I-blocks."""
    from multimodal_llm_pretraining_tpu.ops.selective_scan import selective_scan_xla
    from multimodal_llm_pretraining_tpu.ops.selective_scan_pallas import selective_scan_fused

    rng = np.random.default_rng(3)
    bsz, L, I, N = 2, 100, 12, 4  # L pads to one 100-wide chunk; gcd sub_l
    u = jnp.asarray(rng.normal(size=(bsz, L, I)), jnp.float32)
    delta = jnp.asarray(rng.random((bsz, L, I)) * 0.5 + 0.01, jnp.float32)
    A = -jnp.asarray(rng.random((I, N)) + 0.5, jnp.float32)
    B = jnp.asarray(rng.normal(size=(bsz, L, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(bsz, L, N)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(I,)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(bsz, L, I)), jnp.float32)  # cotangent mix

    def loss(fn):
        return lambda *args: jnp.sum(fn(*args) * w)

    got = jax.grad(loss(selective_scan_fused), argnums=(0, 1, 2, 3, 4, 5))(u, delta, A, B, C, D)
    want = jax.grad(
        loss(lambda *a: selective_scan_xla(*a, chunk_size=16)), argnums=(0, 1, 2, 3, 4, 5)
    )(u, delta, A, B, C, D)
    for name, g, r in zip("u delta A B C D".split(), got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name)


def test_fused_pallas_backward_multichunk():
    """Reverse carry G must chain correctly across several L-chunks."""
    from multimodal_llm_pretraining_tpu.ops.selective_scan import selective_scan_xla
    from multimodal_llm_pretraining_tpu.ops.selective_scan_pallas import (
        selective_scan_pallas_bwd,
        selective_scan_pallas_fwd,
    )

    rng = np.random.default_rng(4)
    bsz, L, I, N = 1, 64, 8, 2
    u = jnp.asarray(rng.normal(size=(bsz, L, I)), jnp.float32)
    delta = jnp.asarray(rng.random((bsz, L, I)) * 0.5 + 0.01, jnp.float32)
    A = -jnp.asarray(rng.random((I, N)) + 0.5, jnp.float32)
    B = jnp.asarray(rng.normal(size=(bsz, L, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(bsz, L, N)), jnp.float32)
    D = jnp.zeros((I,), jnp.float32)
    dy = jnp.asarray(rng.normal(size=(bsz, L, I)), jnp.float32)

    _, ckpt = selective_scan_pallas_fwd(u, delta, A, B, C, D, block_l=16, with_checkpoints=True)
    du, ddelta, dA, dB, dC = selective_scan_pallas_bwd(u, delta, A, B, C, dy, ckpt, block_i=4, block_l=16)

    _, vjp = jax.vjp(lambda *a: selective_scan_xla(*a, chunk_size=16), u, delta, A, B, C, D)
    wu, wdelta, wA, wB, wC, _ = vjp(dy)
    # remove the D-skip contribution the XLA VJP includes in du (D == 0 here)
    for g, r, name in [(du, wu, "u"), (ddelta, wdelta, "delta"), (dA, wA, "A"), (dB, wB, "B"), (dC, wC, "C")]:
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), rtol=2e-4, atol=2e-4, err_msg=name)


def test_causal_conv1d_matches_numpy():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 10, 3)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)
    b = jnp.asarray(rng.normal(size=(3,)), jnp.float32)
    out = causal_conv1d(x, w, b)
    # naive: out[t, c] = sum_k w[k, c] * x[t - (K-1) + k, c] + b[c]
    xp = np.pad(np.asarray(x), ((0, 0), (3, 0), (0, 0)))
    expected = np.zeros((2, 10, 3))
    for t in range(10):
        for k in range(4):
            expected[:, t] += np.asarray(w)[k] * xp[:, t + k]
    expected += np.asarray(b)
    np.testing.assert_allclose(np.asarray(out), expected, atol=1e-5)


def test_causal_conv1d_is_causal():
    x = jnp.zeros((1, 8, 2)).at[0, 4, :].set(1.0)
    w = jnp.ones((4, 2))
    out = causal_conv1d(x, w)
    assert np.allclose(np.asarray(out)[0, :4], 0.0)  # nothing before t=4
    assert np.asarray(out)[0, 4, 0] == 1.0
