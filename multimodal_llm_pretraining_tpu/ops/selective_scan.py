"""Selective-state-space scan (Mamba S6) for TPU.

The reference delegates to the mamba-ssm + causal-conv1d CUDA wheels and
toggles ``is_fast_path_available`` (``src/models/mamba.py:15-25``,
``pyproject.toml:33-37``). TPU equivalents:

- ``selective_scan``: chunked parallel scan. Within a chunk the linear
  recurrence h_t = a_t * h_{t-1} + b_t runs as ``jax.lax.associative_scan``
  (log-depth, MXU/VPU friendly); chunks chain through a tiny carry via
  ``lax.scan``. Chunking bounds the materialized state to
  O(chunk * d_inner * d_state) instead of O(seq * d_inner * d_state) --
  the same reason the CUDA kernel exists. ``jax.checkpoint`` on the chunk
  body keeps the backward at one extra recompute.
- ``causal_conv1d``: depthwise causal conv as pad + grouped conv (XLA fuses
  this into a handful of VPU ops).

The ``use_custom_kernels=False`` branch uses the same math with a plain
(unchunked) associative scan -- the "slow path" parity branch.
"""

import jax
import jax.numpy as jnp


def causal_conv1d(x: jax.Array, weight: jax.Array, bias: jax.Array | None = None) -> jax.Array:
    """Depthwise causal 1D conv. x: [B, L, C]; weight: [K, C]; bias: [C]."""
    k = weight.shape[0]
    x_pad = jnp.pad(x, ((0, 0), (k - 1, 0), (0, 0)))
    out = jax.lax.conv_general_dilated(
        x_pad,
        weight[:, None, :],  # [K, 1, C] : (spatial, in_per_group, features)
        window_strides=(1,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=x.shape[-1],
    )
    if bias is not None:
        out = out + bias
    return out


def _scan_combine(left, right):
    a_l, b_l = left
    a_r, b_r = right
    return a_l * a_r, a_r * b_l + b_r


def _chunk_scan(a_c, b_c, h0):
    """One chunk of the recurrence, log-depth. a_c/b_c: [C, ...]; h0: [...]."""
    a_cum, b_cum = jax.lax.associative_scan(_scan_combine, (a_c, b_c), axis=0)
    h = a_cum * h0[None] + b_cum
    return h, h[-1]


def selective_scan(
    u: jax.Array,  # [B, L, I] input (post conv+silu)
    delta: jax.Array,  # [B, L, I] positive step sizes
    A: jax.Array,  # [I, N] (negative real)
    B: jax.Array,  # [B, L, N] input matrix (input-dependent)
    C: jax.Array,  # [B, L, N] output matrix (input-dependent)
    D: jax.Array,  # [I] skip
    *,
    chunk_size: int = 256,
    use_custom_kernels: bool = True,
) -> jax.Array:
    """y[b,l,i] = sum_n C[b,l,n] * h[b,l,i,n] + D[i]*u[b,l,i] where
    h_t = exp(delta_t A) h_{t-1} + delta_t B_t u_t."""
    if use_custom_kernels and jax.default_backend() == "tpu" and u.shape[1] > chunk_size:
        # fused Pallas fast path: fwd AND bwd kernels (discretization never
        # hits HBM; see selective_scan_pallas.py:325-352 for the custom VJP)
        from .selective_scan_pallas import selective_scan_fused

        return selective_scan_fused(u, delta, A, B, C, D).astype(u.dtype)
    return selective_scan_xla(u, delta, A, B, C, D, chunk_size=chunk_size, use_custom_kernels=use_custom_kernels)


def selective_scan_xla(
    u: jax.Array,
    delta: jax.Array,
    A: jax.Array,
    B: jax.Array,
    C: jax.Array,
    D: jax.Array,
    *,
    chunk_size: int = 256,
    use_custom_kernels: bool = True,
) -> jax.Array:
    """Pure-XLA chunked/full associative-scan implementation (also the
    backward path of the fused Pallas kernel)."""
    bsz, L, I = u.shape
    N = A.shape[1]
    dtype = u.dtype

    # discretize in fp32 for stability
    delta_f = delta.astype(jnp.float32)
    a = jnp.exp(delta_f[..., None] * A.astype(jnp.float32)[None, None])  # [B, L, I, N]
    b = (delta_f * u.astype(jnp.float32))[..., None] * B.astype(jnp.float32)[:, :, None, :]  # [B, L, I, N]

    if not use_custom_kernels or L <= chunk_size:
        # slow-path parity branch: single full-length associative scan
        a_t = jnp.moveaxis(a, 1, 0)
        b_t = jnp.moveaxis(b, 1, 0)
        h0 = jnp.zeros((bsz, I, N), jnp.float32)
        h, _ = _chunk_scan(a_t, b_t, h0)
        h = jnp.moveaxis(h, 0, 1)  # [B, L, I, N]
        y = jnp.einsum("blin,bln->bli", h, C.astype(jnp.float32))
    else:
        pad = (-L) % chunk_size
        if pad:
            a = jnp.pad(a, ((0, 0), (0, pad), (0, 0), (0, 0)), constant_values=1.0)
            b = jnp.pad(b, ((0, 0), (0, pad), (0, 0), (0, 0)))
        nc = a.shape[1] // chunk_size
        a = a.reshape(bsz, nc, chunk_size, I, N).transpose(1, 2, 0, 3, 4)  # [nc, C, B, I, N]
        b = b.reshape(bsz, nc, chunk_size, I, N).transpose(1, 2, 0, 3, 4)
        C_f = C.astype(jnp.float32)
        if pad:
            C_f = jnp.pad(C_f, ((0, 0), (0, pad), (0, 0)))
        C_ch = C_f.reshape(bsz, nc, chunk_size, N).transpose(1, 2, 0, 3)  # [nc, C, B, N]

        @jax.checkpoint
        def body(h0, xs):
            a_c, b_c, c_c = xs
            h, h_last = _chunk_scan(a_c, b_c, h0)
            y_c = jnp.einsum("cbin,cbn->cbi", h, c_c)
            return h_last, y_c

        h0 = jnp.zeros((bsz, I, N), jnp.float32)
        _, y = jax.lax.scan(body, h0, (a, b, C_ch))  # y: [nc, C, B, I]
        y = y.transpose(2, 0, 1, 3).reshape(bsz, nc * chunk_size, I)[:, :L]

    y = y + D.astype(jnp.float32) * u.astype(jnp.float32)
    return y.astype(dtype)
