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


def convnext_flops_per_example(
    depths: tuple, dims: tuple, num_classes: int, image_size: int = 224, backward: bool = True
) -> float:
    """ConvNeXt fwd(+bwd) FLOPs per image (workload of
    ``src/models/convnext.py:18-115``): 4x4/s4 stem conv, stages of
    (7x7 depthwise + 1x1 C->4C + 1x1 4C->C) blocks with 2x2/s2 downsample
    convs between stages, linear classifier head. 2 FLOPs per MAC;
    backward = 2x forward (all params trainable)."""
    res = image_size // 4
    total = 2.0 * (4 * 4 * 3) * dims[0] * res * res  # stem
    for i, (depth, c) in enumerate(zip(depths, dims)):
        if i > 0:
            res //= 2
            total += 2.0 * (2 * 2 * dims[i - 1]) * c * res * res  # downsample
        # per block: depthwise 49*C + pointwise C->4C and 4C->C (8*C^2)
        total += depth * 2.0 * res * res * c * (49 + 8 * c)
    total += 2.0 * dims[-1] * num_classes
    return total * (3.0 if backward else 1.0)


def _llama_stack_flops(seq: int, layers: int, hidden: int, ffn: int, kv_frac: float) -> float:
    """Forward FLOPs of a Llama-style stack (GQA + swiglu) over ``seq``
    tokens, no head: qkvo (4 + 4*kv_frac)H^2, ffn 6*H*F, attention 4*S*H
    per token per layer."""
    per_tok_layer = (4 + 4 * kv_frac) * hidden * hidden + 6.0 * hidden * ffn + 4.0 * seq * hidden
    return seq * layers * per_tok_layer


def llava_flops_per_example(finetune: bool, text_len: int = 512) -> float:
    """LLaVA fwd+bwd FLOPs per benchmark example (workload of
    ``src/models/llava.py:149-264``; benchmark text seq 512 like the
    reference's dummy data, ``src/models/__init__.py:222``).

    CLIP-L/336 tower (24L, H1024, 577 tokens) -> 2-layer projector ->
    Llama-3.2-1B over the merged 1087-token sequence. Frozen submodules
    mirror torch autograd cost: the tower sits UPSTREAM of every trainable
    param so it contributes forward only; a frozen transformer on the
    gradient path costs ~1x forward extra (activation grads only, dW
    matmuls skipped), a trainable one 2x forward extra.

    - pretrain (projector only trainable): tower fwd + 3x projector +
      2x (LM stack + LM head)
    - finetune (projector + LM trainable, tower frozen): tower fwd +
      3x projector + 3x (LM stack + LM head)
    """
    from ..models.llama import FFN, HEADS, HIDDEN, KV_HEADS, LAYERS
    from ..models.llava import NUM_PATCHES, TOWER_HIDDEN, VOCAB_WITH_IMAGE

    s_tower = NUM_PATCHES + 1  # 577
    tower_fwd = s_tower * transformer_flops_per_token(24, TOWER_HIDDEN, s_tower, vocab=0, backward=False)
    projector_fwd = NUM_PATCHES * 2.0 * (TOWER_HIDDEN * HIDDEN + HIDDEN * HIDDEN)
    s_merged = text_len - 1 + NUM_PATCHES  # 1087
    lm_fwd = _llama_stack_flops(s_merged, LAYERS, HIDDEN, FFN, KV_HEADS / HEADS)
    lm_fwd += 2.0 * HIDDEN * VOCAB_WITH_IMAGE * s_merged  # tied lm head
    lm_mult = 3.0 if finetune else 2.0
    return tower_fwd + 3.0 * projector_fwd + lm_mult * lm_fwd


def vilt_flops_per_example(hidden: int, layers: int, ffn: int, patch: int, vocab: int, text_len: int = 512, image_size: int = 224) -> float:
    """ViLT fwd+bwd FLOPs per benchmark example (3 objective passes/step --
    MLM + ITM + WPA, ``src/models/vilt.py:341-366``): each pass runs the
    full fused-tower trunk over [text; cls+patches] fwd+bwd (3x fwd, all
    trainable); the MLM vocabulary head runs in the MLM pass only. The
    text/patch embedding projections and the IPOT loop (50 iterations of
    [T x P] elementwise/matvec work) are <1% and omitted."""
    s = text_len + (image_size // patch) ** 2 + 1
    trunk_fwd = s * transformer_flops_per_token(layers, hidden, s, vocab=0, ffn_mult=ffn / hidden, backward=False)
    mlm_head_fwd = 2.0 * hidden * vocab * text_len
    return 3.0 * (3.0 * trunk_fwd) + 3.0 * mlm_head_fwd


def analytic_flops_per_example(model_class: BaseModelClass, backward: bool = True, remat: bool = False) -> float | None:
    """Closed-form fwd(+bwd) FLOPs for one example of the model's benchmark
    workload, for families where a closed form applies (everything but
    Mamba, whose selective-scan FLOPs come from XLA cost analysis)."""
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
    if mt.startswith("convnext"):
        from ..models.convnext import CONFIGS

        cfg = CONFIGS[mt]
        return convnext_flops_per_example(cfg["depths"], cfg["dims"], cfg["num_classes"], backward=backward)
    if mt.startswith("llava") and backward:
        return llava_flops_per_example(finetune=(mt == "llava-finetune"))
    if mt.startswith("vilt") and backward:
        if mt.startswith("vilt-original"):
            from ..models.vilt_original import _ORIGINAL_KWARGS as k

            return vilt_flops_per_example(k["hidden"], k["num_layers"], k["intermediate"], k["patch"], k["vocab_size"])
        return vilt_flops_per_example(1408, 40, 6144, 14, 128256)
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
