"""FLOPs accounting: XLA cost analysis with an analytic cross-check.

The reference measures FLOPs/example with torch ``FlopCounterMode`` around
one fwd+bwd (``src/benchmarking/flops.py:9-37``), hardcoding Mamba because
the counter was broken for it. Here the primary counter is XLA's own
``compiled.cost_analysis()`` -- but custom Pallas kernels contribute zero
unless they declare a CostEstimate, and some PJRT transports under-report,
so ``analytic_flops_per_example`` provides the dense-transformer closed form
used for sanity-checking and for MFU math in ``bench.py``.
"""

from ..models import BaseModelClass
from ..utils import get_logger

logger = get_logger()


def transformer_flops_per_token(
    num_layers: int,
    hidden: int,
    seq_len: int,
    vocab: int = 0,
    ffn_mult: float = 4.0,
    num_extra_proj: int = 0,
    backward: bool = True,
    remat: bool = False,
) -> float:
    """Dense-transformer FLOPs per token (fwd, or fwd+bwd when backward).

    Per layer per token: QKVO projections 8H^2, FFN 4*ffn_mult*H^2,
    attention score+value matmuls 4*S*H. LM/class head: 2*H*V.
    backward = 2x forward; full remat re-runs the block forward (+1x).
    """
    per_layer = (8 + 4 * ffn_mult) * hidden * hidden + 4 * seq_len * hidden
    fwd = num_layers * per_layer + 2 * hidden * vocab + num_extra_proj
    total = fwd * (3.0 if backward else 1.0)
    if backward and remat:
        total += num_layers * per_layer
    return total


def analytic_flops_per_example(model_class: BaseModelClass, backward: bool = True, remat: bool = False) -> float | None:
    """Closed-form fwd(+bwd) FLOPs for one example of the model's benchmark
    workload, for families where the dense-transformer form applies."""
    mt = model_class.model_type
    if mt.startswith("pythia"):
        from ..models.pythia import PYTHIA_SIZES

        L, H, _ = PYTHIA_SIZES[mt]
        S = model_class.sequence_length  # type: ignore[attr-defined]
        return S * transformer_flops_per_token(L, H, S, vocab=model_class.vocab_size, backward=backward, remat=remat)  # type: ignore[attr-defined]
    if mt == "roberta":
        S = model_class.sequence_length  # type: ignore[attr-defined]
        return S * transformer_flops_per_token(24, 1024, S, vocab=model_class.vocab_size, backward=backward, remat=remat)  # type: ignore[attr-defined]
    if mt == "vit":
        # 224/16 -> 196 patches + cls
        S = 197
        return S * transformer_flops_per_token(24, 1024, S, vocab=21841, backward=backward, remat=remat)
    return None


def count_flops_per_example(model_class: BaseModelClass, use_xla: bool = True) -> float:
    """FLOPs for one fwd+bwd example -- the ``count_flops`` experiment input
    (reference ``src/benchmarking/flops.py:9-37``; their protocol also runs
    fwd+bwd of a batch-of-1 under mixed precision).

    Prefers XLA cost analysis; falls back to (and sanity-checks against) the
    analytic form, since Pallas kernels don't self-report FLOPs.
    """
    analytic = analytic_flops_per_example(model_class)

    if use_xla:
        try:
            from ..parallel.mesh import MeshConfig
            from ..train import TrainingPlan

            plan = TrainingPlan(
                num_training_steps=1,
                micro_batch_size=1,
                gradient_accumulation_steps=1,
                bf16=(model_class.mixed_precision is not None),
                use_custom_kernels=False,  # XLA-only graph so every op reports FLOPs
                optimizer=model_class.optimizer,
                optimizer_kwargs=model_class.optimizer_kwargs,
                scheduler_type=model_class.scheduler_type,
                scheduler_kwargs=model_class.scheduler_kwargs,
                max_grad_norm=model_class.max_grad_norm,
                mesh=MeshConfig(num_hosts=1, chips_per_host=1),
            )
            sess = plan.build_session(model_class)
            measured = sess.count_step_flops(micro_batch_size=1)
            if measured and measured > 0:
                if analytic and not (0.3 < measured / analytic < 3.0):
                    logger.info(
                        f"XLA flops {measured:.3e} disagrees with analytic {analytic:.3e} for {model_class.model_type}; using analytic"
                    )
                    return analytic
                return measured
        except Exception as e:
            logger.info(f"XLA flop counting failed for {model_class.model_type}: {e}")

    if analytic is not None:
        return analytic
    raise RuntimeError(f"no FLOPs available for {model_class.model_type}")
