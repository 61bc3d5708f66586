"""Tokenizer parity goldens (round-2 verdict, missing #3).

Three layers, strongest available always asserted:

1. Template-text goldens (always run): ``render_chat_template`` must produce
   these committed strings byte-for-byte -- the Llama-3.2-Instruct template
   is a fixed spec, so the strings are hand-derived from it, not from the
   code under test.
2. Label-algorithm goldens (always run): synthetic token streams using the
   REAL Llama-3 special-token ids (128000/128006/128007/128009) with
   hand-computed expected label masks.
3. Token-id goldens (run when real tokenizers are present): committed
   ``tests/fixtures/llava_golden_ids.json`` (generated off-box by
   ``scripts/make_tokenizer_fixtures.py``) must be reproduced exactly, and
   ``render_chat_template`` must equal the tokenizer's own
   ``apply_chat_template(..., tokenize=False)``.

Plus: ``--dataset real`` hard-fails when the hash-tokenizer fallback is
active (reference always uses hub tokenizers, ``src/data/llava_data.py:89``).
"""

import json
import os

import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.data import _require_real_tokenizer
from multimodal_llm_pretraining_tpu.data.llava_data import LlavaCollator, render_chat_template
from multimodal_llm_pretraining_tpu.data.tokenization import (
    EOT_TOKEN_ID,
    IGNORE_INDEX,
    SimpleTokenizer,
    load_tokenizer,
)

BOS = 128000
SH = 128006  # <|start_header_id|>
EH = 128007  # <|end_header_id|>
EOT = 128009  # <|eot_id|>

# ------------------------------------------------------------- layer 1

SYS_BLOCK = (
    "<|begin_of_text|><|start_header_id|>system<|end_header_id|>\n\n"
    "Cutting Knowledge Date: December 2023\nToday Date: 26 Jul 2024\n\n<|eot_id|>"
)

GOLDEN_TEMPLATES = [
    (
        [
            {"role": "user", "content": "<image>\nDescribe the image."},
            {"role": "assistant", "content": "A tabby cat sits on a woven mat."},
        ],
        SYS_BLOCK
        + "<|start_header_id|>user<|end_header_id|>\n\n<image>\nDescribe the image.<|eot_id|>"
        + "<|start_header_id|>assistant<|end_header_id|>\n\nA tabby cat sits on a woven mat.<|eot_id|>",
    ),
    (
        [
            {"role": "user", "content": "What is 2 + 2?"},
            {"role": "assistant", "content": "4."},
            {"role": "user", "content": "And doubled?"},
            {"role": "assistant", "content": "8."},
        ],
        SYS_BLOCK
        + "<|start_header_id|>user<|end_header_id|>\n\nWhat is 2 + 2?<|eot_id|>"
        + "<|start_header_id|>assistant<|end_header_id|>\n\n4.<|eot_id|>"
        + "<|start_header_id|>user<|end_header_id|>\n\nAnd doubled?<|eot_id|>"
        + "<|start_header_id|>assistant<|end_header_id|>\n\n8.<|eot_id|>",
    ),
    (
        # the template's |trim filter strips content whitespace
        [
            {"role": "user", "content": "  Leading and trailing spaces  "},
            {"role": "assistant", "content": "Trimmed by the template.\n"},
        ],
        SYS_BLOCK
        + "<|start_header_id|>user<|end_header_id|>\n\nLeading and trailing spaces<|eot_id|>"
        + "<|start_header_id|>assistant<|end_header_id|>\n\nTrimmed by the template.<|eot_id|>",
    ),
    (
        [
            {"role": "user", "content": "Café costs $3 — cheap!"},
            {"role": "assistant", "content": "Oui — très bon marché."},
        ],
        SYS_BLOCK
        + "<|start_header_id|>user<|end_header_id|>\n\nCafé costs $3 — cheap!<|eot_id|>"
        + "<|start_header_id|>assistant<|end_header_id|>\n\nOui — très bon marché.<|eot_id|>",
    ),
]


@pytest.mark.parametrize("conv,expected", GOLDEN_TEMPLATES, ids=["image", "multiturn", "trim", "unicode"])
def test_chat_template_matches_golden_string(conv, expected):
    assert render_chat_template(conv) == expected


# ------------------------------------------------------------- layer 2


def _collator():
    return LlavaCollator(split="pretrain", tokenizer=SimpleTokenizer())


def test_label_golden_single_assistant_turn():
    c = _collator()
    A = c.assistant_token_id
    NN, u1, u2, a1, a2, a3 = 11, 21, 22, 31, 32, 33
    USER = 41
    #      0    1   2     3   4   5    6   7    8   9     10  11  12   13   14  15   16  17  18  19   20
    ids = [BOS, SH, USER, EH, NN, u1,  u2, EOT, SH, A,    EH, NN, a1,  a2,  a3, EOT]
    labels = c._labels_for(np.asarray(ids), assistant_lens=[3])
    expected = np.full(len(ids), IGNORE_INDEX)
    expected[12:15] = [a1, a2, a3]  # content span starts at EH(10) + 2
    expected[7] = EOT  # every <|eot_id|> is unmasked
    expected[15] = EOT
    np.testing.assert_array_equal(labels, expected)


def test_label_golden_two_assistant_turns_and_truncated_span():
    c = _collator()
    A = c.assistant_token_id
    NN, USER = 11, 41
    ids = [BOS, SH, USER, EH, NN, 21, EOT, SH, A, EH, NN, 31, 32, EOT, SH, USER, EH, NN, 22, EOT, SH, A, EH, NN, 33]
    # second assistant span (len 4) runs past the truncation boundary
    labels = c._labels_for(np.asarray(ids), assistant_lens=[2, 4])
    expected = np.full(len(ids), IGNORE_INDEX)
    expected[11:13] = [31, 32]
    expected[24:] = [33]  # clipped at the array end
    for pos, t in enumerate(ids):
        if t == EOT:
            expected[pos] = EOT
    np.testing.assert_array_equal(labels, expected)


def test_label_golden_user_end_header_not_unmasked():
    """An <|end_header_id|> NOT preceded by the assistant token claims no
    span (the reference checks the predecessor, ``:135``)."""
    c = _collator()
    NN, USER = 11, 41
    ids = [BOS, SH, USER, EH, NN, 21, 22, EOT]
    labels = c._labels_for(np.asarray(ids), assistant_lens=[2])
    expected = np.full(len(ids), IGNORE_INDEX)
    expected[7] = EOT
    np.testing.assert_array_equal(labels, expected)


# ------------------------------------------------------------- layer 3

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "llava_golden_ids.json")


def _real_llama_tokenizer():
    tok = load_tokenizer("meta-llama/Llama-3.2-1B-Instruct")
    return None if isinstance(tok, SimpleTokenizer) else tok


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="golden-id fixture not generated (needs real tokenizer)")
def test_real_tokenizer_reproduces_golden_ids():
    tok = _real_llama_tokenizer()
    if tok is None:
        pytest.skip("real Llama-3 tokenizer not available offline")
    with open(FIXTURE) as f:
        fixture = json.load(f)
    collator = LlavaCollator(split="pretrain", tokenizer=tok)
    for case in fixture["llama3"]:
        conv = case["conversation"]
        assert tok.apply_chat_template(conv, tokenize=False) == render_chat_template(conv)
        ids = collator._encode_chat(conv)
        assert [int(i) for i in ids] == case["input_ids"]
        labels = collator._labels_for(np.asarray(ids), collator._assistant_lens(conv))
        assert [int(x) for x in labels] == case["labels"]


# ------------------------------------------------------------- hard-fail


def test_dataset_real_hard_fails_on_fallback_tokenizer():
    collator = _collator()
    assert isinstance(collator.tokenizer, SimpleTokenizer)
    with pytest.raises(RuntimeError, match="hash-tokenizer fallback"):
        _require_real_tokenizer(collator, "llava-pretrain")


def test_eot_constant_matches_llama3():
    assert EOT_TOKEN_ID == EOT == 128009
