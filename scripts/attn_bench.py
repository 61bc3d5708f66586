"""Standalone attention-kernel ablation on the real chip.

Times the Pallas flash kernel (fwd and fwd+bwd) at the shapes the pythia
models actually use, looping inside one jit so the ~13 ms tunnel dispatch
amortizes away. Every output feeds the loop carry (nothing DCE-able).
Prints effective TFLOPS per variant plus a raw matmul ceiling probe.

Usage: python scripts/attn_bench.py [--iters 16]
"""

import argparse
import sys

sys.path.insert(0, ".")
import time

import jax
import jax.numpy as jnp

from multimodal_llm_pretraining_tpu.utils import block_on


def timed_loop(make_fn, args, iters, repeats=3):
    """Run fn in a lax.scan chain (data dependency defeats CSE+DCE); return
    median seconds/iter over `repeats` timed calls."""

    @jax.jit
    def run(args):
        def body(carry, _):
            out = make_fn(*carry)
            outs = out if isinstance(out, tuple) else (out,)
            # every output feeds q: nothing is dead
            bump = sum(jnp.sum(o[..., :1, :1].astype(jnp.float32)) for o in outs)
            q, *rest = carry
            q = q + (0.0 * bump).astype(q.dtype)
            return (q, *rest), None

        carry, _ = jax.lax.scan(body, args, None, length=iters)
        return carry[0][0, 0]

    block_on(run(args))  # compile
    ts = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        block_on(run(args))
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[len(ts) // 2]


def attn_flops(b, h, s, d, causal=True, bwd=False):
    f = 4 * b * h * s * s * d  # qk^T + pv
    if causal:
        f /= 2
    if bwd:
        f *= 3.5  # bwd 2.5x fwd for attention (5 matmuls vs 2)
    return f


def bench_shape(name, b, h, s, d, impl, iters, **kw):
    from multimodal_llm_pretraining_tpu.ops.attention import dot_product_attention

    q = jax.random.normal(jax.random.key(0), (b, h, s, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, h, s, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, h, s, d), jnp.bfloat16)

    if impl == "flash":
        from multimodal_llm_pretraining_tpu.ops.flash_attention import flash_attention

        def attn(q, k, v):
            return flash_attention(q, k, v, causal=True, **kw)
    else:
        def attn(q, k, v):
            return dot_product_attention(q, k, v, causal=True, impl=impl)

    t = timed_loop(lambda q, k, v: attn(q, k, v), (q, k, v), iters)
    fl = attn_flops(b, h, s, d)
    print(f"{name} {impl:5s} fwd  [{b}x{h}x{s}x{d}]: {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TFLOPS", flush=True)

    def fwdbwd(q, k, v):
        def loss(q, k, v):
            return jnp.sum(attn(q, k, v).astype(jnp.float32))

        return jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    t = timed_loop(fwdbwd, (q, k, v), iters)
    fl = attn_flops(b, h, s, d, bwd=True)
    print(f"{name} {impl:5s} f+b  [{b}x{h}x{s}x{d}]: {t*1e3:8.2f} ms  {fl/t/1e12:6.1f} TFLOPS", flush=True)


def matmul_ceiling(iters=32):
    n = 4096
    a = jax.random.normal(jax.random.key(0), (n, n), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (n, n), jnp.bfloat16)

    def mm(a, b):
        return jnp.dot(a, b, preferred_element_type=jnp.bfloat16)

    t = timed_loop(mm, (a, b), iters)
    print(f"matmul ceiling [{n}^3 bf16]: {t*1e3:8.2f} ms  {2*n**3/t/1e12:6.1f} TFLOPS", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=16)
    ap.add_argument("--impls", default="flash")
    ap.add_argument("--shapes", default="410m,1b")
    ap.add_argument("--block-q", type=int, default=None)
    ap.add_argument("--block-k", type=int, default=None)
    ap.add_argument("--matmul", action="store_true")
    args = ap.parse_args()

    if args.matmul:
        matmul_ceiling()

    all_shapes = {
        "410m": ("pythia-410m", 16, 16, 2048, 64),
        "1b": ("pythia-1b", 8, 8, 2048, 256),
    }
    kw = {}
    if args.block_q:
        kw["block_q"] = args.block_q
    if args.block_k:
        kw["block_k"] = args.block_k

    for key in args.shapes.split(","):
        name, b, h, s, d = all_shapes[key]
        for impl in args.impls.split(","):
            bench_shape(name, b, h, s, d, impl, args.iters, **(kw if impl == "flash" else {}))


if __name__ == "__main__":
    main()
