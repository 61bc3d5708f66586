"""Tokenizer plumbing for the data pipeline.

The reference collators pull tokenizers from the hub at construction time
(``src/data/llava_data.py:91-100``, ``src/data/vilt_data.py:185-193``). This
framework runs in offline TPU environments, so collators accept any
tokenizer object satisfying the small protocol below; ``load_tokenizer``
tries a local/cached HF tokenizer and otherwise falls back to a simple
whitespace+punctuation tokenizer (sufficient for smoke tests and for
benchmarking, where only shapes matter).

Llama special-token conventions follow the reference's hardcoded choices:
pad = <|reserved_special_token_0|> (128002), mask = ..._1| (128003),
sep = ..._2| (128004), image = <image> (128256).
"""

import os
import re

import numpy as np

PAD_TOKEN_ID = 128002
MASK_TOKEN_ID = 128003
SEP_TOKEN_ID = 128004
BOS_TOKEN_ID = 128000
EOT_TOKEN_ID = 128009
IMAGE_TOKEN_ID = 128256
IGNORE_INDEX = -100


class SimpleTokenizer:
    """Deterministic word/subword tokenizer with BERT-style '##' subword
    marks; hashes words into a fixed vocab range. Offline stand-in with the
    same interface surface the collators use."""

    def __init__(self, vocab_size: int = 128256, max_word_len: int = 6):
        self.vocab_size = vocab_size
        self.max_word_len = max_word_len
        self.pad_token_id = PAD_TOKEN_ID if vocab_size > PAD_TOKEN_ID else vocab_size - 4
        self.mask_token_id = MASK_TOKEN_ID if vocab_size > MASK_TOKEN_ID else vocab_size - 3
        self.sep_token_id = SEP_TOKEN_ID if vocab_size > SEP_TOKEN_ID else vocab_size - 2
        self.bos_token_id = BOS_TOKEN_ID if vocab_size > BOS_TOKEN_ID else vocab_size - 1
        self.eos_token_id = EOT_TOKEN_ID if vocab_size > EOT_TOKEN_ID else vocab_size - 5

    def _word_pieces(self, word: str) -> list[str]:
        return [word[i : i + self.max_word_len] for i in range(0, len(word), self.max_word_len)]

    def _piece_id(self, piece: str) -> int:
        return (hash(piece) % (self.vocab_size - 1000)) + 100

    def tokenize_with_words(self, text: str):
        """-> (ids, word_ids) where word_ids marks which word each piece
        belongs to (None analog: specials get -1)."""
        ids, word_ids = [], []
        for w_idx, word in enumerate(re.findall(r"\w+|[^\w\s]", text)):
            for piece in self._word_pieces(word):
                ids.append(self._piece_id(piece))
                word_ids.append(w_idx)
        return ids, word_ids

    def encode(self, text: str, add_special_tokens: bool = True) -> list[int]:
        ids, _ = self.tokenize_with_words(text)
        if add_special_tokens:
            ids = [self.bos_token_id] + ids
        return ids

    def __call__(self, texts, add_special_tokens: bool = True):
        if isinstance(texts, str):
            texts = [texts]
        return {"input_ids": [self.encode(t, add_special_tokens) for t in texts]}

    def subword_marked_tokens(self, text: str, add_special_tokens: bool = True) -> list[str]:
        """Token strings with '##' continuation marks (the reference's
        ``_process_subwords``, ``src/data/vilt_data.py:194-216``)."""
        marked = []
        if add_special_tokens:
            marked.append("<|begin_of_text|>")
        for word in re.findall(r"\w+|[^\w\s]", text):
            for j, piece in enumerate(self._word_pieces(word)):
                marked.append(piece if j == 0 else f"##{piece}")
        return marked


def load_tokenizer(name_or_path: str | None = None, vocab_size: int = 128256):
    """HF tokenizer when available locally, else the simple fallback.

    Lookup order: ``$MLPT_TOKENIZERS_DIR/<basename>`` (a directory of
    ``tokenizer.save_pretrained`` dumps, keyed by the hub name's last path
    component), then the hub name against the local HF cache."""
    if name_or_path:
        candidates = []
        root = os.environ.get("MLPT_TOKENIZERS_DIR")
        if root:
            candidates.append(os.path.join(root, name_or_path.split("/")[-1]))
        candidates.append(name_or_path)
        for cand in candidates:
            try:
                from transformers import AutoTokenizer

                tok = AutoTokenizer.from_pretrained(cand, local_files_only=True)
                tok.pad_token_id = PAD_TOKEN_ID
                return tok
            except Exception:
                continue
    return SimpleTokenizer(vocab_size=vocab_size)


def pad_to(seqs: list[list[int]], pad_value: int, max_len: int | None = None) -> np.ndarray:
    """Ragged -> padded [B, L]; uses the native C path when built
    (``native/mlpt_native.cpp``), else numpy."""
    try:
        from .. import native

        if native.available():
            ids, _ = native.pad_batch(seqs, pad_value, max_len)
            return ids
    except Exception:
        pass
    if max_len is None:
        max_len = max(len(s) for s in seqs)
    out = np.full((len(seqs), max_len), pad_value, np.int32)
    for i, s in enumerate(seqs):
        out[i, : min(len(s), max_len)] = s[:max_len]
    return out
