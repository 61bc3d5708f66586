"""Generate golden tokenizer-parity fixtures with REAL tokenizers.

Run this on a machine that has the actual tokenizers available (hub access
or local ``save_pretrained`` dumps pointed to by ``MLPT_TOKENIZERS_DIR``):

    MLPT_TOKENIZERS_DIR=/path/to/tokenizers python scripts/make_tokenizer_fixtures.py

Layout expected under MLPT_TOKENIZERS_DIR (basenames of the hub names):

    Llama-3.2-1B-Instruct/   <- meta-llama/Llama-3.2-1B-Instruct
    vilt-b32-mlm/            <- dandelin/vilt-b32-mlm

Writes ``tests/fixtures/llava_golden_ids.json``: for each fixture
conversation, the chat-template text, input_ids, and labels produced by the
real Llama-3 pipeline (``LlavaCollator._encode_chat`` + ``_labels_for``),
plus the BERT-variant ids for ViLT-original. ``tests/test_tokenizer_parity.py``
asserts the collators reproduce these token-for-token whenever the real
tokenizers are present. This sandbox has no network egress and no cached
tokenizers, so the fixture is generated off-box and committed.
"""

import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np

from multimodal_llm_pretraining_tpu.data.llava_data import LlavaCollator, render_chat_template
from multimodal_llm_pretraining_tpu.data.tokenization import SimpleTokenizer, load_tokenizer

# Shared with tests/test_tokenizer_parity.py: edit there too.
FIXTURE_CONVERSATIONS = [
    [
        {"role": "user", "content": "<image>\nDescribe the image."},
        {"role": "assistant", "content": "A tabby cat sits on a woven mat."},
    ],
    [
        {"role": "user", "content": "What is 2 + 2?"},
        {"role": "assistant", "content": "4."},
        {"role": "user", "content": "And doubled?"},
        {"role": "assistant", "content": "8."},
    ],
    [
        {"role": "user", "content": "  Leading and trailing spaces  "},
        {"role": "assistant", "content": "Trimmed by the template.\n"},
    ],
    [
        {"role": "user", "content": "Café costs $3 — cheap!"},
        {"role": "assistant", "content": "Oui — très bon marché."},
    ],
]


def main() -> None:
    tok = load_tokenizer("meta-llama/Llama-3.2-1B-Instruct")
    if isinstance(tok, SimpleTokenizer):
        raise SystemExit(
            "real Llama-3 tokenizer not available; set MLPT_TOKENIZERS_DIR "
            "(see module docstring) and re-run"
        )
    collator = LlavaCollator(split="pretrain", tokenizer=tok)
    out = {"llama3": []}
    for conv in FIXTURE_CONVERSATIONS:
        ids = collator._encode_chat(conv)
        labels = collator._labels_for(np.asarray(ids), collator._assistant_lens(conv))
        out["llama3"].append(
            {
                "conversation": conv,
                "template_text": render_chat_template(conv),
                "input_ids": [int(i) for i in ids],
                "labels": [int(x) for x in labels],
            }
        )

    bert = load_tokenizer("dandelin/vilt-b32-mlm", vocab_size=30522)
    if not isinstance(bert, SimpleTokenizer):
        out["bert"] = [
            {
                "text": t,
                "input_ids": [int(i) for i in bert.encode(t, add_special_tokens=True)],
            }
            for t in ["A tabby cat sits on a woven mat.", "unbelievably rare butterflies"]
        ]

    path = os.path.join("tests", "fixtures", "llava_golden_ids.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
