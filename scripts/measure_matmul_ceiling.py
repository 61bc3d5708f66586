"""Measure the chip's sustained matmul ceiling -- the INDEPENDENT
calibration source for the analytic-vs-empirical projection.

Round-2 verdict #4: the <=10% agreement check was circular because
``CALIBRATED_MFU`` was read off the same committed grids the test compared
against. The fix decomposes the projection into independent factors:

    predicted_mfu = ceiling_fraction(chip)        # measured HERE, matmuls only
                  x shape_efficiency(model dims)  # closed form, no timing data
                  x overhead(kappa)               # fitted on SMALL models only

This script measures the first factor: sustained bf16 TFLOPS of large MXU
matmuls, with the k-step loop INSIDE one jit (per-dispatch latency through
the axon tunnel is ~13 ms; see CLAUDE.md) and a data dependence between
iterations so XLA cannot hoist the matmul out of the loop. The result is
committed as ``artifacts/matmul_ceiling_<tpu>.json`` and read by
``scripts/analytic_vs_empirical.py`` -- it contains no model-grid data.

Usage:  python scripts/measure_matmul_ceiling.py [--write]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from multimodal_llm_pretraining_tpu.tpus import detect_local_tpu, peak_tflops
from multimodal_llm_pretraining_tpu.utils import block_on

ITERS = 128
SHAPES = [2048, 4096, 8192]  # square M=N=K


def sustained_tflops(dim: int, iters: int = ITERS, samples: int = 3) -> float:
    """Chained A <- normalize(A @ B) for ``iters`` steps inside one jit."""

    @jax.jit
    def chain(a, b):
        # B's entries have variance 1/dim, so acc @ b keeps unit variance:
        # no per-iteration normalization needed (a reduction would serialize
        # a bandwidth-bound op against the MXU each step)
        def body(_, acc):
            return jnp.dot(acc, b, preferred_element_type=jnp.float32).astype(jnp.bfloat16)

        return lax.fori_loop(0, iters, body, a)

    key = jax.random.key(0)
    a = jax.random.normal(key, (dim, dim), jnp.bfloat16)
    b = jax.random.normal(jax.random.key(1), (dim, dim), jnp.bfloat16) / jnp.sqrt(dim).astype(jnp.bfloat16)
    out = chain(a, b)
    block_on(out)  # compile + warmup
    times = []
    for _ in range(samples):
        t0 = time.perf_counter()
        out = chain(a, b)
        block_on(out)
        times.append(time.perf_counter() - t0)
    t = sorted(times)[len(times) // 2]
    flops = 2.0 * dim**3 * iters
    return flops / t / 1e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true", help="commit artifacts/matmul_ceiling_<tpu>.json")
    args = ap.parse_args()

    tpu = detect_local_tpu()
    if tpu is None:
        raise SystemExit("no TPU attached; the ceiling must be measured on the real chip")
    peak = peak_tflops(tpu, "bf16")

    per_shape = {}
    for dim in SHAPES:
        tf = sustained_tflops(dim)
        per_shape[dim] = tf
        print(f"  {dim}x{dim}x{dim} bf16: {tf:.1f} TFLOPS ({tf / peak * 100:.1f}% of datasheet {peak})")

    ceiling = max(per_shape.values())
    result = {
        "tpu_type": tpu,
        "datasheet_bf16_tflops": peak,
        "sustained_tflops_by_dim": {str(k): round(v, 2) for k, v in per_shape.items()},
        "ceiling_tflops": round(ceiling, 2),
        "ceiling_fraction": round(ceiling / peak, 4),
        "protocol": f"{ITERS}-iter chained bf16 matmul inside one jit, median of 3",
    }
    print(json.dumps(result, indent=1))
    if args.write:
        path = f"artifacts/matmul_ceiling_{tpu}.json"
        with open(path, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
