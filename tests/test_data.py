"""Data-pipeline tests: collators with the offline tokenizer + synthetic
corpora on disk (the reference has no data tests at all)."""

import json
import os

import numpy as np
import pytest

from multimodal_llm_pretraining_tpu.data.llava_data import LlavaCollator, LlavaDataset
from multimodal_llm_pretraining_tpu.data.tokenization import IGNORE_INDEX, IMAGE_TOKEN_ID, SimpleTokenizer
from multimodal_llm_pretraining_tpu.data.vilt_data import (
    LlavaDatasetforVilt,
    ViltCollator,
    whole_word_mask,
)
from multimodal_llm_pretraining_tpu.ops.image_ops import preprocess_images_host


@pytest.fixture(scope="module")
def llava_corpus(tmp_path_factory):
    """Synthetic blip_laion-style corpus with tiny images."""
    from PIL import Image

    root = tmp_path_factory.mktemp("llava")
    os.makedirs(root / "images", exist_ok=True)
    data = []
    for i in range(6):
        name = f"img_{i}.jpg"
        Image.new("RGB", (48, 32), (i * 40, 10, 200)).save(root / "images" / name)
        data.append(
            {
                "image": name,
                "conversations": [
                    {"from": "human", "value": "<image>\nDescribe the image briefly."},
                    {"from": "gpt", "value": f"A colorful test image number {i}."},
                ],
            }
        )
    with open(root / "blip_laion_cc_sbu_558k.json", "w") as f:
        json.dump(data, f)
    return str(root)


def test_llava_dataset_and_collator(llava_corpus):
    ds = LlavaDataset(split="pretrain", data_dir=llava_corpus)
    assert len(ds) == 6
    collator = LlavaCollator(split="pretrain", tokenizer=SimpleTokenizer(), image_size=64, max_length=64)
    batch = collator([ds[i] for i in range(4)])
    assert batch["pixel_values"].shape == (4, 64, 64, 3)
    assert batch["input_ids"].shape == batch["labels"].shape == (4, 64)
    # image token present exactly once per example
    assert (batch["input_ids"] == IMAGE_TOKEN_ID).sum(axis=1).tolist() == [1, 1, 1, 1]
    # loss only on assistant spans: some labels valid, user turns ignored
    valid = batch["labels"] != IGNORE_INDEX
    assert valid.any(axis=1).all()
    # the user turn tokens at the start are all masked
    assert (batch["labels"][:, :3] == IGNORE_INDEX).all()


class RecordedTokenizer:
    """Deterministic stand-in with the REAL llama-3 ids for every token the
    chat template itself emits, plus a recorded vocabulary for the fixture
    strings -- so the expected stream below is a recorded reference encoding
    of the template structure."""

    pad_token_id = 128002
    bos_token_id = 128000
    eos_token_id = 128009
    RECORDED = {
        "system": [9125],
        "user": [882],
        "assistant": [78191],
        "\n\n": [271],
        "Cutting Knowledge Date: December 2023\nToday Date: 26 Jul 2024\n\n": [1000, 1001],
        "\nWhat is this?": [50, 51, 52, 53],
        "A cat.": [60, 61, 62],
        "\nAnd now?": [54, 55],
        "A dog.": [63, 64, 65],
    }

    def encode(self, text, add_special_tokens=True):
        assert not add_special_tokens
        return list(self.RECORDED[text])


def test_llava_chat_template_fixture():
    """Recorded-encoding fixture: the emulated template must produce the
    llama-3 stream (bos, system preamble block, per-turn header blocks, one
    <image> token in place) and the reference label algorithm must unmask
    exactly the assistant content spans + every <|eot_id|>."""
    from multimodal_llm_pretraining_tpu.data.llava_data import END_HEADER_ID, START_HEADER_ID

    conv = [
        {"role": "user", "content": "<image>\nWhat is this?"},
        {"role": "assistant", "content": "A cat."},
        {"role": "user", "content": "\nAnd now?"},
        {"role": "assistant", "content": "A dog."},
    ]
    collator = LlavaCollator(split="pretrain", tokenizer=RecordedTokenizer(), max_length=64)
    ids = collator._encode_chat(conv)

    expected = (
        [128000]
        + [START_HEADER_ID, 9125, END_HEADER_ID, 271, 1000, 1001, 128009]  # system + date preamble
        + [START_HEADER_ID, 882, END_HEADER_ID, 271, IMAGE_TOKEN_ID, 50, 51, 52, 53, 128009]
        + [START_HEADER_ID, 78191, END_HEADER_ID, 271, 60, 61, 62, 128009]
        + [START_HEADER_ID, 882, END_HEADER_ID, 271, 54, 55, 128009]
        + [START_HEADER_ID, 78191, END_HEADER_ID, 271, 63, 64, 65, 128009]
    )
    assert ids == expected

    labels = collator._labels_for(np.asarray(ids), collator._assistant_lens(conv))
    keep = labels != IGNORE_INDEX
    expect_keep = np.zeros(len(ids), bool)
    for tok in (60, 61, 62, 63, 64, 65, 128009):
        expect_keep |= np.asarray(ids) == tok
    np.testing.assert_array_equal(keep, expect_keep)
    # the kept labels are the token ids themselves
    np.testing.assert_array_equal(labels[keep], np.asarray(ids)[keep])


def test_vilt_pretrain_collator(llava_corpus):
    ds = LlavaDatasetforVilt(split="pretrain", data_dir=llava_corpus)
    collator = ViltCollator(split="pretrain", tokenizer=SimpleTokenizer(), image_size=32, max_length=32)
    batch = collator([ds[i] for i in range(3)])
    # plain/mlm/itm triples with itm doubled (matched + mismatched)
    assert batch["input_ids"].shape[0] == 3
    assert batch["itm_input_ids"].shape[0] == 6
    assert batch["itm_labels"].tolist() == [1, 1, 1, 0, 0, 0]
    assert batch["itm_pixel_values"].shape[0] == 6
    # mlm masking: masked positions carry labels, others IGNORE
    masked = batch["mlm_labels"] != IGNORE_INDEX
    assert masked.sum() > 0
    assert (batch["mlm_input_ids"][masked] == collator.mask_id).all()
    # unmasked positions unchanged
    assert (batch["mlm_input_ids"][~masked] == batch["input_ids"][~masked]).all()


def test_whole_word_masking_groups_subwords():
    import random

    tokens = ["hello", "##wor", "##ld", "test", "word"]
    rng = random.Random(0)
    counts = []
    for _ in range(50):
        marks = whole_word_mask(tokens, mlm_probability=0.5, rng=rng)
        # subword group must mask together
        assert marks[1] == marks[2]
        counts.append(sum(marks))
    assert any(c > 0 for c in counts)


def test_preprocess_images_host_shapes():
    from PIL import Image

    imgs = [Image.new("RGB", (100, 80), (255, 0, 0)), np.zeros((50, 60, 3), np.uint8)]
    out = preprocess_images_host(imgs, 32)
    assert out.shape == (2, 32, 32, 3)
    assert out.dtype == np.float32
    # red channel of a pure-red image normalizes to (1 - mean)/std
    assert out[0, 0, 0, 0] == pytest.approx((1.0 - 0.48145466) / 0.26862954, rel=1e-4)


def test_fused_device_preprocess_matches_host():
    import jax.numpy as jnp

    from multimodal_llm_pretraining_tpu.ops.image_ops import preprocess_images

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 64, 64, 3), np.uint8)
    dev = np.asarray(preprocess_images(jnp.asarray(imgs), 32, crop=False))
    host = preprocess_images_host(list(imgs), 32)
    np.testing.assert_allclose(dev, host, atol=2e-2)
