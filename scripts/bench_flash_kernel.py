"""Standalone flash-attention kernel sweep at the pythia-1b production shape.

Measures fwd-only and fwd+bwd wall time per call for every kernel variant the
repo can ship (fused/split backward, block sizes, dp-early scheduling) plus
external baselines (stock jax.experimental pallas flash attention, XLA dots).
This is the FILTER stage: standalone rankings are known to disagree with
in-step rankings on this backend (CLAUDE.md kernel-gate lesson), so winners
here must be confirmed inside the production step via scripts/step_bench.py
env knobs before changing any default.

Run on a QUIET chip: python scripts/bench_flash_kernel.py [--b 4] [--h 8]
[--s 2048] [--d 256]
"""

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def median(xs):
    return sorted(xs)[len(xs) // 2]


def time_fn(fn, args, iters, reps=3):
    """Time `iters` chained calls inside ONE jit (amortizes ~13 ms dispatch)."""
    from multimodal_llm_pretraining_tpu.utils import block_on

    @jax.jit
    def run(args):
        def body(carry, _):
            out = fn(*carry)
            # fold a dependency back into q so the loop can't collapse
            # (out is a tuple of grads when fn is jax.grad over argnums)
            leaf = jax.tree_util.tree_leaves(out)[0]
            q = carry[0] + 0.0 * leaf[..., :1, :1].sum().astype(carry[0].dtype)
            return (q,) + carry[1:], None

        carry, _ = jax.lax.scan(body, args, None, length=iters)
        return carry[0][0, 0, 0]

    block_on(run(args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        block_on(run(args))
        ts.append(time.perf_counter() - t0)
    return median(ts) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=4)
    ap.add_argument("--h", type=int, default=8)
    ap.add_argument("--s", type=int, default=2048)
    ap.add_argument("--d", type=int, default=256)
    ap.add_argument("--iters", type=int, default=16)
    args = ap.parse_args()

    import multimodal_llm_pretraining_tpu.ops.flash_attention as fa

    B, H, S, D = args.b, args.h, args.s, args.d
    q = jax.random.normal(jax.random.key(0), (B, H, S, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (B, H, S, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (B, H, S, D), jnp.bfloat16)

    # causal fwd+bwd model FLOPs (fwd 2 matmuls over the lower triangle; bwd
    # 5): 3.5x fwd
    flop_fwd = 4 * B * H * (S * S / 2) * D
    flop_fb = flop_fwd * 4.5  # fwd runs again under grad + 5-matmul bwd? no:
    # value_and_grad re-runs fwd (2) + bwd (5) = 7 matmul passes of S^2/2*D
    flop_fb = 2 * B * H * (S * S / 2) * D * 7

    def loss_fn(attn):
        def f(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32))

        return f

    results = []

    def measure(name, attn_fn, fwd_only_fn=None, settings=None):
        # Apply globals/env for the WHOLE measure: the custom_vjp backward
        # rule traces lazily (after the forward returns), so settings must
        # stay live across trace + timing, not just inside the traced fwd.
        fused, dp_early, bwd_bq = (settings or {}).get("fused", True), (settings or {}).get("dp_early", False), (settings or {}).get("bwd_bq")
        prior = (fa.PREFER_FUSED_BWD, fa.DP_EARLY, os.environ.get("MLPT_FLASH_BWD_BLOCK_Q"))
        fa.PREFER_FUSED_BWD, fa.DP_EARLY = fused, dp_early
        if bwd_bq:
            os.environ["MLPT_FLASH_BWD_BLOCK_Q"] = str(bwd_bq)
        else:
            os.environ.pop("MLPT_FLASH_BWD_BLOCK_Q", None)
        try:
            jax.clear_caches()
            t_fb = time_fn(jax.grad(loss_fn(attn_fn), argnums=(0, 1, 2)), (q, k, v), args.iters)
            jax.clear_caches()
            t_f = time_fn(fwd_only_fn or attn_fn, (q, k, v), args.iters)
        finally:
            fa.PREFER_FUSED_BWD, fa.DP_EARLY = prior[0], prior[1]
            if prior[2] is None:
                os.environ.pop("MLPT_FLASH_BWD_BLOCK_Q", None)
            else:
                os.environ["MLPT_FLASH_BWD_BLOCK_Q"] = prior[2]
        results.append((name, t_f, t_fb))
        print(
            f"{name:38s} fwd {t_f*1e3:7.2f} ms ({flop_fwd/t_f/1e12:6.1f} TF)   "
            f"fwd+bwd {t_fb*1e3:7.2f} ms ({flop_fb/t_fb/1e12:6.1f} TF)",
            flush=True,
        )

    def ours(**kw):
        def f(q, k, v):
            return fa.flash_attention(q, k, v, causal=True, **kw)

        return f

    def with_globals(fused=True, dp_early=False, bwd_bq=None, **kw):
        """Kernel-call kwargs only; fused/dp_early/bwd_bq ride `settings`."""
        return ours(**kw), {"fused": fused, "dp_early": dp_early, "bwd_bq": bwd_bq}

    def measure_ours(name, **kw):
        fn, settings = with_globals(**kw)
        measure(name, fn, settings=settings)

    # ---- ours: shipped default
    measure_ours("ours fused bq512 bk512 (default)")
    # ---- ours: dp-early scheduling
    measure_ours("ours fused + dp_early", dp_early=True)
    # ---- ours: fused inner q-slice variants
    for bq in (256, 1024, 2048):
        measure_ours(f"ours fused bwd_bq={bq}", bwd_bq=bq)
    measure_ours("ours fused bwd_bq=2048 + dp_early", bwd_bq=2048, dp_early=True)
    # ---- ours: k-block variants (fwd AND bwd re-plan from these)
    for bk in (256, 1024):
        measure_ours(f"ours fused bk={bk}", block_k=bk)
    measure_ours("ours fused bq256 (fwd+bwd)", block_q=256)
    # ---- ours: split backward
    measure_ours("ours split bwd", fused=False)
    measure_ours("ours split bwd bq256", fused=False, block_q=256)

    # ---- stock jax pallas flash attention
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            flash_attention as jax_flash,
        )

        measure("jax.experimental pallas flash", lambda q, k, v: jax_flash(q, k, v, causal=True))
    except Exception as e:  # pragma: no cover
        print(f"stock pallas flash unavailable: {e}")

    # ---- splash attention (MaxText production kernel)
    try:
        from jax.experimental.pallas.ops.tpu.splash_attention import (
            splash_attention_kernel as sk,
            splash_attention_mask as sm,
        )

        mask = sm.MultiHeadMask([sm.CausalMask((S, S)) for _ in range(H)])
        kernel = sk.make_splash_mha(mask=mask, head_shards=1, q_seq_shards=1)

        @jax.vmap
        def splash(q, k, v):
            return kernel(q * (D**-0.5), k, v)

        measure("splash attention (vmap batch)", splash)
    except Exception as e:  # pragma: no cover
        print(f"splash attention unavailable: {e}")

    # ---- XLA dots reference
    def xla_attn(q, k, v):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32) * (D**-0.5)
        mask = jnp.tril(jnp.ones((S, S), bool))
        s = jnp.where(mask, s, -1e30)
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)

    measure("XLA dots (materialized scores)", xla_attn)

    print("\nbest fwd+bwd:", min(results, key=lambda r: r[2])[0])


if __name__ == "__main__":
    main()
