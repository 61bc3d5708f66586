"""Real multimodal data pipelines (LLaVA / ViLT / ScienceQA)."""


def _require_real_tokenizer(collator, model_type: str):
    """Real-data training must not silently run on the hash-tokenizer
    stand-in: the ids would be garbage while every shape looks right.
    ``MLPT_ALLOW_FALLBACK_TOKENIZER=1`` opts out EXPLICITLY (offline e2e
    tests drive the full real-data path on synthetic fixture corpora where
    token identity does not matter) -- the failure mode this guard exists
    for is the silent one."""
    import os

    from .tokenization import SimpleTokenizer

    if os.environ.get("MLPT_ALLOW_FALLBACK_TOKENIZER") == "1":
        return collator
    if isinstance(getattr(collator, "tokenizer", None), SimpleTokenizer):
        raise RuntimeError(
            f"--dataset real for {model_type} requires the real tokenizer, but the offline "
            "hash-tokenizer fallback is active. Save the tokenizer locally "
            "(tokenizer.save_pretrained) and point MLPT_TOKENIZERS_DIR at its parent "
            "directory; scripts/make_tokenizer_fixtures.py documents the layout."
        )
    return collator


def get_real_dataset(model_type: str, data_dir: str | None):
    """Dataset + collator dispatch by model type (the reference's
    ``get_dataset``/``get_data_collator``, ``scripts/training.py:19-56``)."""
    if model_type in ("llava-pretrain", "llava-finetune"):
        from ..models import get_model_class
        from .llava_data import LlavaCollator, LlavaDataset

        split = "pretrain" if model_type == "llava-pretrain" else "instruction_tuning"
        ds = LlavaDataset(split=split, data_dir=data_dir)
        # collator images must match the tower's input size (336 for the
        # published CLIP-L/14-336; env-configured checkpoints may differ)
        image_size = get_model_class(model_type).image_size  # type: ignore[arg-type]
        return ds, _require_real_tokenizer(LlavaCollator(split=split, image_size=image_size), model_type)
    if model_type in ("vilt-pretrain", "vilt-finetune", "vilt-original-pretrain", "vilt-original-finetune"):
        from .vilt_data import LlavaDatasetforVilt, ViltCollator, ViltCollatorForOriginal

        collator_cls = ViltCollatorForOriginal if "original" in model_type else ViltCollator
        if model_type.endswith("-pretrain"):
            ds = LlavaDatasetforVilt(split="pretrain", data_dir=data_dir)
            return ds, _require_real_tokenizer(collator_cls(split="pretrain"), model_type)
        ds = LlavaDatasetforVilt(split="instruction", data_dir=data_dir)
        return ds, _require_real_tokenizer(collator_cls(split="instruction"), model_type)
    raise ValueError(f"no real dataset registered for {model_type}; use --dataset dummy")
