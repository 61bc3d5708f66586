"""LLaVA pretraining / instruction-tuning data pipeline.

Parity with ``/root/reference/src/data/llava_data.py``: loads the
``blip_laion_cc_sbu_558k.json`` (pretrain) or ``llava_v1_5_mix665k.json``
(instruction) corpora + images from ``data_dir``; the collator builds
Llama-3 chat-format sequences with a leading ``<image>`` token and masks
labels so loss lands only on assistant spans and EOT tokens
(``:124-153``). Differences by design:

- images preprocess through the fused numpy/XLA pipeline
  (``ops/image_ops.py``) instead of per-example CLIPImageProcessor calls
- assistant-span masking is computed from role offsets during template
  assembly rather than re-scanning for ``<|end_header_id|>`` -- same label
  semantics, no token-position heuristics
- sequences pad to a fixed ``max_length`` (static shapes for jit)
"""

import json
import os

import numpy as np

from ..ops.image_ops import CLIP_MEAN, CLIP_STD, preprocess_images_host
from .tokenization import IGNORE_INDEX, IMAGE_TOKEN_ID, load_tokenizer, pad_to


def process_conversations(conversations):
    """'from: gpt/human' -> chat roles (reference ``:15-23``)."""
    return [
        {"role": "assistant" if line["from"] == "gpt" else "user", "content": line["value"]}
        for line in conversations
    ]


def load_llava_data(path_to_data: str, split: str) -> list[dict]:
    if split == "pretrain":
        with open(os.path.join(path_to_data, "blip_laion_cc_sbu_558k.json")) as f:
            data = json.load(f)
        for ex in data:
            ex["image_path"] = os.path.join(path_to_data, "images", ex["image"])
            ex["conversations"] = process_conversations(ex["conversations"])
        return data
    if split in ("instruction", "instruction_tuning"):
        with open(os.path.join(path_to_data, "llava_v1_5_mix665k.json")) as f:
            data = json.load(f)
        out = []
        for ex in data:
            if "image" not in ex:
                continue  # text-only examples filtered (reference :44-57)
            ex["image_path"] = os.path.join(path_to_data, ex["image"])
            ex["conversations"] = process_conversations(ex["conversations"])
            out.append(ex)
        return out
    raise NotImplementedError(f"data split {split} not implemented")


class LlavaDataset:
    def __init__(self, split: str, data_dir: str | None = None):
        data_dir = data_dir or os.environ.get("MLPT_LLAVA_DATA_DIR", "data/llava")
        self._all_data = load_llava_data(data_dir, split="pretrain" if split == "pretrain" else "instruction")

    def __len__(self):
        return len(self._all_data)

    def get_image(self, idx):
        from PIL import Image

        return Image.open(self._all_data[idx]["image_path"])

    def __getitem__(self, idx):
        return {"image": self.get_image(idx), "conversations": self._all_data[idx]["conversations"]}


class LlavaCollator:
    """Chat-template tokenization + fused image preprocessing + assistant-
    span label masking."""

    def __init__(self, split: str = "pretrain", tokenizer=None, image_size: int = 336, max_length: int = 512):
        self.split = split
        self.tokenizer = tokenizer or load_tokenizer("meta-llama/Llama-3.2-1B-Instruct")
        self.image_size = image_size
        self.max_length = max_length
        self.pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        self.eot_id = getattr(self.tokenizer, "eos_token_id", 0) or 0

    def _encode_turn(self, role: str, content: str) -> list[int]:
        """Llama-3 chat format: header tokens + content + <|eot_id|>."""
        header = self.tokenizer.encode(f"{role}:", add_special_tokens=False)
        body = self.tokenizer.encode(content, add_special_tokens=False)
        return header + body + [self.eot_id], len(header)

    def _build_example(self, conversations) -> tuple[list[int], list[int]]:
        bos = getattr(self.tokenizer, "bos_token_id", None)
        ids: list[int] = [bos] if bos is not None else []
        labels: list[int] = [IGNORE_INDEX] * len(ids)
        # the <image> placeholder leads the sequence (expanded in-model)
        ids.append(IMAGE_TOKEN_ID)
        labels.append(IGNORE_INDEX)
        for turn in conversations:
            content = turn["content"].replace("<image>\n", "").replace("<image>", "")
            turn_ids, header_len = self._encode_turn(turn["role"], content)
            ids.extend(turn_ids)
            if turn["role"] == "assistant":
                # loss on assistant body + EOT only (reference :138-152)
                labels.extend([IGNORE_INDEX] * header_len + turn_ids[header_len:])
            else:
                labels.extend([IGNORE_INDEX] * len(turn_ids))
        return ids[: self.max_length], labels[: self.max_length]

    def __call__(self, features: list[dict]) -> dict[str, np.ndarray]:
        pixel_values = preprocess_images_host([f["image"] for f in features], self.image_size, CLIP_MEAN, CLIP_STD)
        encoded = [self._build_example(f["conversations"]) for f in features]
        input_ids = pad_to([e[0] for e in encoded], self.pad_id, self.max_length)
        labels = pad_to([e[1] for e in encoded], IGNORE_INDEX, self.max_length)
        attention_mask = (input_ids != self.pad_id).astype(np.int32)
        return {
            "pixel_values": pixel_values,
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "labels": labels,
        }
