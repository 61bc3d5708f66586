"""ViLT on the stock dandelin/vilt-b32-mlm architecture.

Reimplements the reference's original-ViLT variant
(``src/models/vilt_original.py``): the same MLM+ITM+WPA multi-task forward
as ``vilt.py`` but on the stock ViLT-B/32 trunk (hidden 768, 12 layers, 12
heads, ffn 3072, patch 32, vocab 30522) with BERT-width text embeddings
(projection 768->768). Recipe: batch 128, 6540 steps (pretrain) / 5197
(finetune, MLM-only), fp32, AdamW 1e-4 wd 0.01, linear 10% warmup.
"""

from .vilt import _ViltBase

_ORIGINAL_KWARGS = dict(
    hidden=768,
    num_layers=12,
    num_heads=12,
    intermediate=3072,
    patch=32,
    vocab_size=30522,
    token_embed_dim=768,
)


class ViltOriginalPretrainModelClass(_ViltBase):
    module_kwargs = _ORIGINAL_KWARGS

    @property
    def training_steps(self) -> int:
        return 6540

    @property
    def vocab_size(self) -> int:
        return 30522


class ViltOriginalFinetuneModelClass(_ViltBase):
    module_kwargs = _ORIGINAL_KWARGS
    target_tasks = ("mlm",)

    @property
    def training_steps(self) -> int:
        return 5197

    @property
    def vocab_size(self) -> int:
        return 30522
