"""Real multimodal data pipelines (LLaVA / ViLT / ScienceQA)."""


def get_real_dataset(model_type: str, data_dir: str | None):
    """Dataset + collator dispatch by model type (the reference's
    ``get_dataset``/``get_data_collator``, ``scripts/training.py:19-56``)."""
    if model_type in ("llava-pretrain", "llava-finetune"):
        from .llava_data import LlavaCollator, LlavaDataset

        split = "pretrain" if model_type == "llava-pretrain" else "instruction_tuning"
        ds = LlavaDataset(split=split, data_dir=data_dir)
        return ds, LlavaCollator(split=split)
    if model_type in ("vilt-pretrain", "vilt-finetune", "vilt-original-pretrain", "vilt-original-finetune"):
        from .vilt_data import LlavaDatasetforVilt, ViltCollator, ViltCollatorForOriginal

        collator_cls = ViltCollatorForOriginal if "original" in model_type else ViltCollator
        if model_type.endswith("-pretrain"):
            ds = LlavaDatasetforVilt(split="pretrain", data_dir=data_dir)
            return ds, collator_cls(split="pretrain")
        ds = LlavaDatasetforVilt(split="instruction", data_dir=data_dir)
        return ds, collator_cls(split="instruction")
    raise ValueError(f"no real dataset registered for {model_type}; use --dataset dummy")
