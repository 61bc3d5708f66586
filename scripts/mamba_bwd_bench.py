"""TPU check + timing for the fused selective-scan backward vs XLA VJP.

Compares gradients (fused Pallas reverse scan vs chunked-XLA autodiff) on
mamba-like shapes and times fwd+bwd for both paths.
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_llm_pretraining_tpu.ops.selective_scan import selective_scan_xla
from multimodal_llm_pretraining_tpu.ops.selective_scan_pallas import selective_scan_fused
from multimodal_llm_pretraining_tpu.utils import block_on


def main():
    bsz, L, I, N = int(sys.argv[1]) if len(sys.argv) > 1 else 2, 2048, 2048, 16
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.normal(size=(bsz, L, I)), jnp.float32)
    delta = jnp.asarray(rng.random((bsz, L, I)) * 0.1 + 0.01, jnp.float32)
    A = -jnp.asarray(rng.random((I, N)) + 0.5, jnp.float32)
    B = jnp.asarray(rng.normal(size=(bsz, L, N)), jnp.float32)
    C = jnp.asarray(rng.normal(size=(bsz, L, N)), jnp.float32)
    D = jnp.asarray(rng.normal(size=(I,)), jnp.float32)

    def mk(fn):
        return jax.jit(jax.grad(lambda *a: jnp.sum(jnp.square(fn(*a))), argnums=(0, 1, 2, 3, 4, 5)))

    fused = mk(selective_scan_fused)
    xla = mk(lambda *a: selective_scan_xla(*a, chunk_size=256))

    gf = fused(u, delta, A, B, C, D)
    gx = xla(u, delta, A, B, C, D)
    block_on((gf, gx))
    for name, a, b in zip("u delta A B C D".split(), gf, gx):
        err = float(jnp.max(jnp.abs(a - b)) / (jnp.max(jnp.abs(b)) + 1e-9))
        print(f"  d{name}: rel-max-err {err:.2e}")

    for name, fn in [("fused", fused), ("xla", xla)]:
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            block_on(fn(u, delta, A, B, C, D))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: fwd+bwd {sorted(ts)[1]*1e3:.1f} ms  (B={bsz} L={L} I={I} N={N})")


if __name__ == "__main__":
    main()
