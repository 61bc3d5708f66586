"""Native C library: parity with the python fallbacks."""

import numpy as np
import pytest

from multimodal_llm_pretraining_tpu import native


def test_pad_batch_matches_python():
    seqs = [[1, 2, 3, 4], [5], [], [6, 7]]
    ids, mask = native.pad_batch(seqs, pad_value=-1, max_len=3)
    expected_ids = [[1, 2, 3], [5, -1, -1], [-1, -1, -1], [6, 7, -1]]
    expected_mask = [[1, 1, 1], [1, 0, 0], [0, 0, 0], [1, 1, 0]]
    assert ids.tolist() == expected_ids
    assert mask.tolist() == expected_mask


@pytest.mark.skipif(not native.available(), reason="no C++ toolchain")
def test_whole_word_mask_groups():
    word_ids = np.array([-1, 0, 0, 1, 2, 2, 2, 3], np.int32)
    for seed in range(20):
        m = native.whole_word_mask_ids(word_ids, 0.5, seed=seed)
        assert m[0] == 0  # special never masked
        assert m[1] == m[2]  # word groups mask together
        assert m[4] == m[5] == m[6]


def test_mlm_corrupt_semantics():
    ids = np.arange(1000, dtype=np.int32)
    out, labels = native.mlm_corrupt(ids, 0.15, mask_token=7777, seed=1)
    masked = out == 7777
    assert 0.05 < masked.mean() < 0.30
    assert (labels[masked] == ids[masked]).all()
    assert (labels[~masked] == -100).all()
    assert (out[~masked] == ids[~masked]).all()


def test_random_lm_batch_deterministic():
    a = native.random_lm_batch(5, 1000, 4, 16)
    b = native.random_lm_batch(5, 1000, 4, 16)
    assert (a == b).all()
    assert a.min() >= 0 and a.max() < 1000
