"""Memory-efficient LM cross-entropy: chunked logits with rematerialization.

The reference (HF ``*ForCausalLM``/``*ForMaskedLM``) materializes the full
[B, S, V] fp32 logits tensor plus its gradient -- for pythia at seq 2049 and
vocab 50304 that is ~1.6 GB per 4 examples, the single biggest activation in
every LM's step. Here the vocab projection + softmax-xent runs in token
chunks under ``jax.checkpoint``: forward keeps only the per-chunk loss,
backward recomputes each chunk's logits. Peak logits memory drops from
O(B*S*V) to O(chunk*V) at ~4% extra FLOPs (one recomputed vocab matmul).
"""

import jax
import jax.numpy as jnp


def chunked_lm_cross_entropy(
    hidden: jax.Array,  # [N, H] (token-major, any dtype)
    kernel: jax.Array,  # [H, V] output-projection weights
    labels: jax.Array,  # [N] int labels, ignore_index masked
    *,
    chunk_size: int = 1024,
    ignore_index: int = -100,
) -> jax.Array:
    """Mean cross entropy over valid tokens, computed chunk-by-chunk."""
    n, h = hidden.shape

    pad = (-n) % chunk_size
    if pad:
        hidden = jnp.pad(hidden, ((0, pad), (0, 0)))
        labels = jnp.pad(labels, (0, pad), constant_values=ignore_index)
    num_chunks = hidden.shape[0] // chunk_size
    hidden = hidden.reshape(num_chunks, chunk_size, h)
    labels = labels.reshape(num_chunks, chunk_size)

    @jax.checkpoint
    def chunk_loss(kernel, h_c, l_c):
        logits = jnp.dot(h_c, kernel, preferred_element_type=jnp.float32)
        valid = l_c != ignore_index
        safe = jnp.where(valid, l_c, 0)
        logz = jax.nn.logsumexp(logits, axis=-1)
        gold = jnp.take_along_axis(logits, safe[:, None], axis=-1)[:, 0]
        nll = (logz - gold) * valid
        return nll.sum(), valid.sum()

    def body(carry, xs):
        loss_sum, count = carry
        h_c, l_c = xs
        s, c = chunk_loss(kernel, h_c, l_c)
        return (loss_sum + s, count + c), None

    (loss_sum, count), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32)), (hidden, labels))
    return loss_sum / jnp.maximum(count, 1)


def lm_head_loss(
    hidden: jax.Array,  # [B, S, H]
    kernel: jax.Array,  # [H, V]
    labels: jax.Array,  # [B, S]
    *,
    shift: bool = True,
    chunk_size: int = 1024,
    ignore_index: int = -100,
    bias: jax.Array | None = None,
) -> jax.Array:
    """Causal-LM loss: optionally shift (predict token t+1 from t), then
    chunked xent over all tokens. ``bias`` folds an output-head bias in by
    augmenting the hidden states with a ones column (keeps chunking simple)."""
    if shift:
        hidden = hidden[:, :-1]
        labels = labels[:, 1:]
    b, s, h = hidden.shape
    flat_h = hidden.reshape(b * s, h)
    flat_l = labels.reshape(b * s)
    if bias is not None:
        flat_h = jnp.concatenate([flat_h, jnp.ones((b * s, 1), flat_h.dtype)], axis=-1)
        kernel = jnp.concatenate([kernel, bias[None, :].astype(kernel.dtype)], axis=0)
    return chunked_lm_cross_entropy(flat_h, kernel, flat_l, chunk_size=chunk_size, ignore_index=ignore_index)
