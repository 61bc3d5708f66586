"""LLaVA pretraining / instruction-tuning data pipeline.

Parity with ``/root/reference/src/data/llava_data.py``: loads the
``blip_laion_cc_sbu_558k.json`` (pretrain) or ``llava_v1_5_mix665k.json``
(instruction) corpora + images from ``data_dir``; the collator tokenizes
through the Llama-3 chat template (``<|begin_of_text|>`` +
``<|start_header_id|>{role}<|end_header_id|>\\n\\n{content}<|eot_id|>``
blocks, including the template's system-date preamble) and computes labels
with the reference's algorithm (``:102-153``): scan for
``<|end_header_id|>`` preceded by the ``assistant`` token, unmask the
assistant content span, and unmask every ``<|eot_id|>``. When a real HF
tokenizer is available locally the text goes through
``apply_chat_template`` itself -- byte-exact parity; the offline fallback
emits the same special-token structure around the stand-in tokenizer.

Differences by design:

- images preprocess through the fused numpy/XLA pipeline
  (``ops/image_ops.py``) instead of per-example CLIPImageProcessor calls
- ``<image>`` stays ONE token where the conversation places it (the model
  expands it to 576 patch positions with a static gather,
  ``models/llava.py``); the reference's LlavaProcessor pre-expands it in
  the token stream instead
- sequences pad/truncate to a fixed ``max_length`` (static shapes for jit)
"""

import json
import os

import numpy as np

from ..ops.image_ops import CLIP_MEAN, CLIP_STD, preprocess_images_host
from .tokenization import (
    BOS_TOKEN_ID,
    EOT_TOKEN_ID,
    IGNORE_INDEX,
    IMAGE_TOKEN_ID,
    load_tokenizer,
    pad_to,
)

START_HEADER_ID = 128006  # <|start_header_id|>
END_HEADER_ID = 128007  # <|end_header_id|>

# the llama-3.2 chat template's default system preamble (emitted by
# apply_chat_template even with no system message)
SYSTEM_PREAMBLE = "Cutting Knowledge Date: December 2023\nToday Date: 26 Jul 2024\n\n"


def render_chat_template(conversations, system_message: str | None = None) -> str:
    """Byte-exact rendering of the Llama-3.2-Instruct chat template (the
    reference's ``apply_chat_template`` path, ``:91-100``): bos, a system
    block carrying the knowledge/date preamble, then
    ``<|start_header_id|>{role}<|end_header_id|>\\n\\n{content|trim}<|eot_id|>``
    per turn. Golden-tested against committed strings
    (``tests/test_tokenizer_parity.py``); when a real tokenizer is present
    the test additionally asserts equality with the tokenizer's own
    ``apply_chat_template(..., tokenize=False)`` output."""
    out = "<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n"
    out += SYSTEM_PREAMBLE
    if system_message:
        out += system_message.strip()
    out += "<|eot_id|>"
    for turn in conversations:
        out += f"<|start_header_id|>{turn['role']}<|end_header_id|>\n\n{turn['content'].strip()}<|eot_id|>"
    return out


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
    """Llama-3 chat-template tokenization + fused image preprocessing +
    end-header-scan label masking (reference ``:102-153``)."""

    def __init__(self, split: str = "pretrain", tokenizer=None, image_size: int = 336, max_length: int = 512):
        self.split = split
        self.tokenizer = tokenizer or load_tokenizer("meta-llama/Llama-3.2-1B-Instruct")
        self.image_size = image_size
        self.max_length = max_length
        self.pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        self.eot_id = getattr(self.tokenizer, "eos_token_id", EOT_TOKEN_ID) or EOT_TOKEN_ID
        self.has_chat_template = callable(getattr(self.tokenizer, "apply_chat_template", None))
        if self.has_chat_template:
            # the reference registers <image> as a real token (``:97``)
            self.tokenizer.add_tokens("<image>")
        self.assistant_token_id = self.tokenizer.encode("assistant", add_special_tokens=False)[0]

    # ------------------------------------------------------------ encoding

    def _encode_content(self, text: str) -> list[int]:
        """Content tokens with ``<image>`` kept as the single image token
        (surrounding text, including its newline, encodes untouched)."""
        ids: list[int] = []
        for i, piece in enumerate(text.split("<image>")):
            if i:
                ids.append(IMAGE_TOKEN_ID)
            if piece:
                ids.extend(self.tokenizer.encode(piece, add_special_tokens=False))
        return ids

    def _encode_chat(self, conversations) -> list[int]:
        """The llama-3 chat-template token stream."""
        if self.has_chat_template:
            # byte-exact: the template renders and tokenizes itself;
            # <image> is a registered token (id 128256) so it stays single
            return list(self.tokenizer.apply_chat_template(conversations, tokenize=True))

        def header(role: str) -> list[int]:
            return [START_HEADER_ID, *self.tokenizer.encode(role, add_special_tokens=False), END_HEADER_ID,
                    *self.tokenizer.encode("\n\n", add_special_tokens=False)]

        ids = [BOS_TOKEN_ID]
        ids += header("system") + self.tokenizer.encode(SYSTEM_PREAMBLE, add_special_tokens=False) + [self.eot_id]
        for turn in conversations:
            ids += header(turn["role"]) + self._encode_content(turn["content"]) + [self.eot_id]
        return ids

    # -------------------------------------------------------------- labels

    def _assistant_lens(self, conversations) -> list[int]:
        """Tokenized length of each assistant turn's content (reference
        ``_get_tokenized_lens``, ``:102-116``)."""
        return [
            len(self.tokenizer.encode(turn["content"], add_special_tokens=False))
            for turn in conversations
            if turn["role"] == "assistant"
        ]

    def _labels_for(self, ids: np.ndarray, assistant_lens: list[int]) -> np.ndarray:
        """Reference label algorithm (``:118-153``): find every
        ``<|end_header_id|>`` whose predecessor is the ``assistant`` token;
        unmask the content span starting 2 tokens later (past ``\\n\\n``);
        additionally unmask every ``<|eot_id|>``."""
        keep = np.zeros_like(ids, dtype=bool)
        span = 0
        for pos in np.nonzero(ids == END_HEADER_ID)[0]:
            if pos >= 1 and ids[pos - 1] == self.assistant_token_id and span < len(assistant_lens):
                start = pos + 2
                keep[start : start + assistant_lens[span]] = True
                span += 1
        keep |= ids == self.eot_id
        return np.where(keep, ids, IGNORE_INDEX)

    # ------------------------------------------------------------ __call__

    def __call__(self, features: list[dict]) -> dict[str, np.ndarray]:
        pixel_values = preprocess_images_host([f["image"] for f in features], self.image_size, CLIP_MEAN, CLIP_STD)
        all_ids = [self._encode_chat(f["conversations"]) for f in features]
        input_ids = pad_to(all_ids, self.pad_id, self.max_length)
        labels = np.stack(
            [self._labels_for(input_ids[i], self._assistant_lens(f["conversations"]))
             for i, f in enumerate(features)]
        )
        # pad positions never carry loss even when pad_id == some unmasked id
        attention_mask = np.zeros_like(input_ids)
        for i, ids in enumerate(all_ids):
            attention_mask[i, : min(len(ids), self.max_length)] = 1
        labels = np.where(attention_mask > 0, labels, IGNORE_INDEX)
        return {
            "pixel_values": pixel_values,
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "labels": labels,
        }
