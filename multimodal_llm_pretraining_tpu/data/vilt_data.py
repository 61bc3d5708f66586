"""ViLT multi-task data pipeline.

Parity with ``/root/reference/src/data/vilt_data.py``: LLaVA-corpus and
CIFAR-100 datasets adapted to ViLT pretraining, with

- negative-image sampling for ITM (``:111-118,159-163``) -- the ITM set is
  the matched batch + a mismatched copy (2x batch, ``:465-495``)
- whole-word masking at 15% over '##'-marked subwords
  (``_whole_word_mask``, ``:219-260``)
- caption + sep-token text, pad/mask/sep = Llama reserved specials
  (``:180-193``)
- ``ViltCollatorForOriginal`` mirrors the pipeline with BERT-style specials
  for the stock vilt-b32 trunk (``:497-821``)
"""

import json
import os
import random

import numpy as np

from ..ops.image_ops import CLIP_MEAN, CLIP_STD, preprocess_images_host
from .llava_data import process_conversations
from .tokenization import IGNORE_INDEX, SimpleTokenizer, load_tokenizer, pad_to

CIFAR_CAPTION_TEMPLATES = ["An image of a {}"]


def load_llava_data_for_vilt(path_to_data: str, split: str) -> list[dict]:
    if split == "pretrain":
        with open(os.path.join(path_to_data, "blip_laion_cc_sbu_558k.json")) as f:
            data = json.load(f)
        for ex in data:
            ex["image_path"] = os.path.join(path_to_data, "images", ex["image"])
            # pretrain caption = final gpt turn (reference :45-48)
            ex["caption"] = ex["conversations"][-1]["value"]
        return data
    if split == "instruction":
        with open(os.path.join(path_to_data, "llava_v1_5_mix665k.json")) as f:
            data = json.load(f)
        out = []
        for ex in data:
            if "image" not in ex:
                continue
            ex["image_path"] = os.path.join(path_to_data, ex["image"])
            convs = process_conversations(ex["conversations"])
            for c in convs:
                c["content"] = "".join(c["content"].split("<image>\n"))
            ex["conversations"] = convs
            out.append(ex)
        return out
    raise NotImplementedError(f"split {split}")


class LlavaDatasetforVilt:
    def __init__(self, split: str, data_dir: str | None = None, seed: int = 0):
        data_dir = data_dir or os.environ.get("MLPT_LLAVA_DATA_DIR", "data/llava")
        self.split = split
        self._all_data = load_llava_data_for_vilt(data_dir, split)
        self._rng = random.Random(seed)

    def __len__(self):
        return len(self._all_data)

    def get_image(self, idx):
        from PIL import Image

        return Image.open(self._all_data[idx]["image_path"])

    def get_false_image(self, idx):
        other = idx
        while other == idx:
            other = self._rng.randint(0, len(self) - 1)
        return self.get_image(other)

    def __getitem__(self, idx):
        if self.split == "pretrain":
            return {
                "image": self.get_image(idx),
                "caption": self._all_data[idx]["caption"],
                "false_image": self.get_false_image(idx),
            }
        convs = self._all_data[idx]["conversations"]
        turn = self._rng.randint(0, len(convs) // 2 - 1)
        return {"image": self.get_image(idx), "conversations": convs[turn * 2 : turn * 2 + 2]}


class Cifar100DatasetforVilt:
    """CIFAR-100 with caption templates + class-mismatched negatives
    (reference ``:142-177``). Loads from a local CIFAR-100 directory (numpy
    or torchvision layout) -- no downloads in offline TPU environments."""

    def __init__(self, data_dir: str | None = None, seed: int = 0):
        import pickle

        data_dir = data_dir or os.environ.get("MLPT_CIFAR_DATA_DIR", "data/cifar-100-python")
        with open(os.path.join(data_dir, "train"), "rb") as f:
            raw = pickle.load(f, encoding="bytes")
        with open(os.path.join(data_dir, "meta"), "rb") as f:
            meta = pickle.load(f, encoding="bytes")
        self.images = raw[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)  # NHWC
        self.labels = np.asarray(raw[b"fine_labels"])
        self.classes = [" ".join(c.decode().split("_")) for c in meta[b"fine_label_names"]]
        self._rng = random.Random(seed)

    def __len__(self):
        return len(self.images)

    def get_false_image(self, idx):
        other = idx
        while self.labels[other] == self.labels[idx]:
            other = self._rng.randint(0, len(self) - 1)
        return self.images[other]

    def __getitem__(self, idx):
        label = self.classes[self.labels[idx]]
        return {
            "image": self.images[idx],
            "class_label": label,
            "caption": self._rng.choice(CIFAR_CAPTION_TEMPLATES).format(label),
            "false_image": self.get_false_image(idx),
        }


def whole_word_mask(marked_tokens: list[str], mlm_probability: float, rng: random.Random, max_predictions: int = 512) -> list[int]:
    """BERT whole-word masking over '##'-marked tokens (reference
    ``:219-260``; itself from the HF data collator)."""
    cand_indexes: list[list[int]] = []
    for i, token in enumerate(marked_tokens):
        if token in ("<|begin_of_text|>", "<|eot_id|>", "[CLS]", "[SEP]") or token.startswith("<|reserved_special_token"):
            continue
        if cand_indexes and token.startswith("##"):
            cand_indexes[-1].append(i)
        else:
            cand_indexes.append([i])

    rng.shuffle(cand_indexes)
    num_to_predict = min(max_predictions, max(1, int(round(len(marked_tokens) * mlm_probability))))
    covered: set[int] = set()
    masked: list[int] = []
    for index_set in cand_indexes:
        if len(masked) >= num_to_predict:
            break
        if len(masked) + len(index_set) > num_to_predict:
            continue
        if any(i in covered for i in index_set):
            continue
        for i in index_set:
            covered.add(i)
            masked.append(i)
    return [1 if i in covered else 0 for i in range(len(marked_tokens))]


_SPECIAL_TOKENS = ("<|begin_of_text|>", "<|eot_id|>", "[CLS]", "[SEP]")


def whole_word_mask_fast(marked_tokens: list[str], mlm_probability: float, rng: random.Random, max_predictions: int = 512) -> list[int]:
    """Whole-word masking through the native C++ routine when the library is
    loaded (the per-caption python grouping loop dominates collation time at
    production batch sizes); same semantics -- group-together, same expected
    mask count -- with the word grouping computed here and the shuffle/
    selection in C++. Seed derives from the collator's Python rng so a
    seeded collator stays deterministic. Falls back to the pure-python
    reference implementation."""
    from .. import native

    if not native.available():
        return whole_word_mask(marked_tokens, mlm_probability, rng, max_predictions)
    word_ids = np.empty(len(marked_tokens), np.int32)
    wid = -1
    for i, token in enumerate(marked_tokens):
        if token in _SPECIAL_TOKENS or token.startswith("<|reserved_special_token"):
            word_ids[i] = -1
            continue
        if not (i and token.startswith("##") and wid >= 0):
            wid += 1
        word_ids[i] = wid
    mask = native.whole_word_mask_ids(word_ids, mlm_probability, seed=rng.getrandbits(63), max_predictions=max_predictions)
    return mask.tolist()


class ViltCollator:
    """Multi-task collator producing the plain/mlm/itm input triples."""

    def __init__(
        self,
        split: str = "pretrain",
        mlm_probability: float = 0.15,
        tokenizer=None,
        image_size: int = 224,
        max_length: int = 512,
        seed: int = 0,
    ):
        self.split = split
        self.mlm_probability = mlm_probability
        self.tokenizer = tokenizer or load_tokenizer("meta-llama/Llama-3.2-1B-Instruct")
        self.image_size = image_size
        self.max_length = max_length
        self._rng = random.Random(seed)
        self.pad_id = getattr(self.tokenizer, "pad_token_id", 0) or 0
        self.mask_id = getattr(self.tokenizer, "mask_token_id", 1) or 1
        self.sep_id = getattr(self.tokenizer, "sep_token_id", 2) or 2

    # ------------------------------------------------------------ helpers

    def _marked(self, text: str) -> list[str]:
        if hasattr(self.tokenizer, "subword_marked_tokens"):
            return self.tokenizer.subword_marked_tokens(text)
        # HF fast tokenizer: derive marks from word_ids (reference :194-216)
        enc = self.tokenizer([text])
        tokens = enc.tokens(0)
        word_ids = enc.word_ids(0)
        marked, current = [], -1
        for token, wid in zip(tokens, word_ids):
            if wid is None:
                marked.append(token)
            elif wid > current:
                marked.append(token)
                current = wid
            else:
                marked.append(f"##{token}")
        return marked

    def _encode(self, text: str) -> list[int]:
        return self.tokenizer.encode(text, add_special_tokens=True)[: self.max_length]

    def _images(self, images) -> np.ndarray:
        return preprocess_images_host(images, self.image_size, CLIP_MEAN, CLIP_STD)

    # ------------------------------------------------------------ calls

    def __call__(self, features: list[dict]) -> dict[str, np.ndarray]:
        if self.split == "pretrain":
            return self._pretrain_call(features)
        return self._instruction_call(features)

    def _pretrain_call(self, features):
        bsz = len(features)
        pixel_values = self._images([f["image"] for f in features])
        captions = [f["caption"] for f in features]
        enc = [self._encode(c) + [self.sep_id] for c in captions]
        input_ids = pad_to(enc, self.pad_id, self.max_length)
        attention_mask = (input_ids != self.pad_id).astype(np.int32)
        zeros = np.zeros_like(input_ids)
        pixel_mask = np.ones((bsz, self.image_size, self.image_size), np.int32)

        out = {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "token_type_ids": zeros,
            "pixel_values": pixel_values,
            "pixel_mask": pixel_mask,
            "labels": input_ids.copy(),
        }

        # MLM triple: whole-word masking over the caption tokens
        mlm_ids = input_ids.copy()
        mlm_labels = np.full_like(input_ids, IGNORE_INDEX)
        for i, cap in enumerate(captions):
            marks = whole_word_mask_fast(self._marked(cap), self.mlm_probability, self._rng)
            L = min(len(marks), len(enc[i]), input_ids.shape[1])
            m = np.asarray(marks[:L], bool)
            mlm_labels[i, :L][m] = input_ids[i, :L][m]
            mlm_ids[i, :L][m] = self.mask_id
        out.update(
            mlm_input_ids=mlm_ids,
            mlm_attention_mask=attention_mask,
            mlm_token_type_ids=zeros,
            mlm_pixel_values=pixel_values,
            mlm_pixel_mask=pixel_mask,
            mlm_labels=mlm_labels,
        )

        # ITM triple: matched batch + mismatched copy (2x batch)
        false_pixels = self._images([f["false_image"] for f in features])
        out.update(
            itm_input_ids=np.concatenate([input_ids, input_ids], axis=0),
            itm_attention_mask=np.concatenate([attention_mask, attention_mask], axis=0),
            itm_token_type_ids=np.concatenate([zeros, zeros], axis=0),
            itm_pixel_values=np.concatenate([pixel_values, false_pixels], axis=0),
            itm_pixel_mask=np.concatenate([pixel_mask, pixel_mask], axis=0),
            itm_labels=np.concatenate([np.ones(bsz, np.int32), np.zeros(bsz, np.int32)]),
        )
        return out

    def _instruction_call(self, features):
        bsz = len(features)
        pixel_values = self._images([f["image"] for f in features])
        questions = [f["conversations"][0]["content"] for f in features]
        answers = [f["conversations"][1]["content"] for f in features]
        q_enc = [self._encode(q) for q in questions]
        a_enc = [self.tokenizer.encode(a, add_special_tokens=False) + [self.sep_id] for a in answers]
        input_ids = pad_to([q + a for q, a in zip(q_enc, a_enc)], self.pad_id, self.max_length)
        attention_mask = (input_ids != self.pad_id).astype(np.int32)
        zeros = np.zeros_like(input_ids)
        pixel_mask = np.ones((bsz, self.image_size, self.image_size), np.int32)
        out = {
            "input_ids": input_ids,
            "attention_mask": attention_mask,
            "token_type_ids": zeros,
            "pixel_values": pixel_values,
            "pixel_mask": pixel_mask,
            "labels": input_ids.copy(),
        }

        # MLM over the answer span only (reference :350-399)
        mlm_ids = input_ids.copy()
        mlm_labels = np.full_like(input_ids, IGNORE_INDEX)
        for i, ans in enumerate(answers):
            marks = whole_word_mask_fast(self._marked(ans), self.mlm_probability, self._rng)
            off = len(q_enc[i])
            for j, mk in enumerate(marks):
                pos = off + j
                if mk and pos < input_ids.shape[1]:
                    mlm_labels[i, pos] = input_ids[i, pos]
                    mlm_ids[i, pos] = self.mask_id
        out.update(
            mlm_input_ids=mlm_ids,
            mlm_attention_mask=attention_mask,
            mlm_token_type_ids=zeros,
            mlm_pixel_values=pixel_values,
            mlm_pixel_mask=pixel_mask,
            mlm_labels=mlm_labels,
        )
        return out


class ViltCollatorForOriginal(ViltCollator):
    """Same pipeline over BERT-style specials for the stock vilt-b32 trunk
    (reference ``ViltCollator_for_original``, ``:497-821``)."""

    def __init__(self, split: str = "pretrain", mlm_probability: float = 0.15, tokenizer=None, image_size: int = 224, max_length: int = 512, seed: int = 0):
        tokenizer = tokenizer or load_tokenizer("dandelin/vilt-b32-mlm", vocab_size=30522)
        super().__init__(split, mlm_probability, tokenizer, image_size, max_length, seed)
        if isinstance(self.tokenizer, SimpleTokenizer):
            self.pad_id, self.mask_id, self.sep_id = 0, 103, 102  # BERT ids
