"""ScienceQA evaluation data (parity: ``/root/reference/src/data/scienceqa.py``).

Multimodal multiple-choice QA used to evaluate LLaVA finetunes; text-only
questions get a blank 336x336 image (reference ``:44-45``).
"""

import numpy as np

from ..ops.image_ops import CLIP_MEAN, CLIP_STD, preprocess_images_host
from .tokenization import IMAGE_TOKEN_ID, load_tokenizer, pad_to

LETTERS = "ABCDE"


class ScienceQADataset:
    def __init__(self, split: str = "validation"):
        from datasets import load_dataset

        self.dataset = load_dataset("derek-thomas/ScienceQA", split=split)

    def __len__(self):
        return len(self.dataset)

    def __getitem__(self, idx):
        return self.dataset[idx]


class ScienceQAMultimodalDataCollator:
    def __init__(self, tokenizer=None, image_size: int = 336, max_length: int = 512):
        self.tokenizer = tokenizer or load_tokenizer("meta-llama/Llama-3.2-1B-Instruct")
        self.image_size = image_size
        self.max_length = max_length
        self.pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0

    def __call__(self, features: list[dict]) -> dict[str, np.ndarray]:
        questions = []
        for item in features:
            choices = ", ".join(f"({LETTERS[i]}) {c}" for i, c in enumerate(item["choices"]))
            questions.append(
                f"\nQuestion: {item['question']} Choices: {choices}. "
                "Answer with the option's letter from the given choices directly."
            )
        images = [
            item["image"] if item["image"] is not None else np.zeros((self.image_size, self.image_size, 3), np.uint8)
            for item in features
        ]
        pixel_values = preprocess_images_host(images, self.image_size, CLIP_MEAN, CLIP_STD)
        seqs = []
        for item, q in zip(features, questions):
            ids = self.tokenizer.encode(q, add_special_tokens=True)[: self.max_length - 1]
            # image token leads when the question has an image (else blank image
            # is still fed, matching the reference's blank substitution)
            seqs.append([IMAGE_TOKEN_ID] + ids)
        input_ids = pad_to(seqs, self.pad_id, self.max_length)
        return {
            "pixel_values": pixel_values,
            "input_ids": input_ids,
            "attention_mask": (input_ids != self.pad_id).astype(np.int32),
            "answers": np.asarray([item["answer"] for item in features], np.int32),
        }


if __name__ == "__main__":
    # smoke block parity (reference :74-93); requires the HF dataset cache
    ds = ScienceQADataset()
    collator = ScienceQAMultimodalDataCollator()
    batch = collator([ds[i] for i in range(8)])
    for k, v in batch.items():
        print(k, v.shape, v.dtype)
