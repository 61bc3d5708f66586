"""Synthetic benchmark datasets, one per training objective.

Parity with the reference fixtures (``src/benchmarking/data.py:8-167``), with
one TPU-minded change: instead of materializing 50k examples up front
(~400 MB of int64 there), batches are generated deterministically on demand
from a seeded numpy Generator -- the input pipeline never touches disk and
costs microseconds, so the MXUs are never input-starved.
"""

import numpy as np


class DummyDataset:
    """Map-style dataset of dict[str, np.ndarray] examples with fast batch
    synthesis (``sample_batch``)."""

    num_samples: int = 50_000

    def __len__(self) -> int:
        return self.num_samples

    def __getitem__(self, index: int) -> dict[str, np.ndarray]:
        batch = self.sample_batch(1, seed=index)
        return {k: v[0] for k, v in batch.items()}

    def sample_batch(self, batch_size: int, seed: int = 0) -> dict[str, np.ndarray]:
        raise NotImplementedError

    def element_spec(self) -> dict[str, tuple]:
        """{name: (shape-without-batch, dtype)} for AOT shape probing."""
        b = self.sample_batch(1)
        return {k: (v.shape[1:], v.dtype) for k, v in b.items()}


class DummyTextModelingDataset(DummyDataset):
    """Causal/masked LM fixture: labels == input_ids
    (``src/benchmarking/data.py:8-21``)."""

    def __init__(self, vocab_size: int, sequence_length: int, num_samples: int = 50_000):
        self.vocab_size = vocab_size
        self.sequence_length = sequence_length
        self.num_samples = num_samples

    def sample_batch(self, batch_size: int, seed: int = 0) -> dict[str, np.ndarray]:
        # native id synthesis when the C++ library is loaded (~3x numpy for
        # the pythia workload batch; deterministic in `seed` either way --
        # the two PRNGs differ, so all hosts must run the same build, which
        # the shared-seed multihost contract already assumes)
        from .. import native

        ids = native.random_lm_batch(seed, self.vocab_size, batch_size, self.sequence_length)
        return {"input_ids": ids, "labels": ids.copy()}


class DummyImageClassificationDataset(DummyDataset):
    """Image-classification fixture (``src/benchmarking/data.py:24-42``).
    NHWC layout (TPU-native), not the reference's NCHW."""

    def __init__(self, image_size: int, num_classes: int, num_samples: int = 20_000):
        self.image_size = image_size
        self.num_classes = num_classes
        self.num_samples = num_samples

    def sample_batch(self, batch_size: int, seed: int = 0) -> dict[str, np.ndarray]:
        rng = np.random.default_rng(seed)
        return {
            "pixel_values": rng.random((batch_size, self.image_size, self.image_size, 3), dtype=np.float32),
            "labels": rng.integers(0, self.num_classes, (batch_size,), dtype=np.int32),
        }


class DummyMultimodalLanguageModelingDataset(DummyDataset):
    """LLaVA-style fixture: a leading ``<image>`` token then random text
    (``src/benchmarking/data.py:45-77``)."""

    def __init__(self, vocab_size: int, sequence_length: int, image_size: int, num_samples: int = 20_000, image_token_id: int = 32000):
        self.vocab_size = vocab_size
        self.sequence_length = sequence_length
        self.image_size = image_size
        self.num_samples = num_samples
        self.image_token_id = image_token_id

    def sample_batch(self, batch_size: int, seed: int = 0) -> dict[str, np.ndarray]:
        rng = np.random.default_rng(seed)
        text = rng.integers(0, self.vocab_size, (batch_size, self.sequence_length - 1), dtype=np.int32)
        ids = np.concatenate([np.full((batch_size, 1), self.image_token_id, np.int32), text], axis=1)
        return {
            "attention_mask": np.ones_like(ids),
            "pixel_values": rng.random((batch_size, self.image_size, self.image_size, 3), dtype=np.float32),
            "input_ids": ids,
            "labels": ids.copy(),
        }


class DummyMultimodalLanguageModelingForViltDataset(DummyDataset):
    """ViLT multi-task fixture: plain/mlm/itm input triples with 15% masking
    and random ITM labels (``src/benchmarking/data.py:105-167``)."""

    def __init__(
        self,
        vocab_size: int,
        sequence_length: int,
        image_size: int,
        num_samples: int = 20_000,
        percentage_masked: float = 0.15,
        mask_token: int = 128255,
    ):
        self.vocab_size = vocab_size
        self.sequence_length = sequence_length
        self.image_size = image_size
        self.num_samples = num_samples
        self.percentage_masked = percentage_masked
        self.mask_token = mask_token

    def sample_batch(self, batch_size: int, seed: int = 0) -> dict[str, np.ndarray]:
        from .. import native

        rng = np.random.default_rng(seed)
        ids = native.random_lm_batch(seed, self.vocab_size, batch_size, self.sequence_length)
        images = rng.random((batch_size, self.image_size, self.image_size, 3), dtype=np.float32)
        # BERT-style corruption in one native pass (ids+labels together)
        mlm_ids, mlm_labels = native.mlm_corrupt(ids, self.percentage_masked, self.mask_token, seed + 1)
        ones = np.ones_like(ids)
        zeros = np.zeros_like(ids)
        pixel_mask = np.ones((batch_size, self.image_size, self.image_size), np.int32)
        return {
            "input_ids": ids,
            "attention_mask": ones,
            "token_type_ids": zeros,
            "pixel_values": images,
            "pixel_mask": pixel_mask,
            "labels": ids.copy(),
            "mlm_input_ids": mlm_ids,
            "mlm_attention_mask": ones,
            "mlm_token_type_ids": zeros,
            "mlm_pixel_values": images,
            "mlm_pixel_mask": pixel_mask,
            "mlm_labels": mlm_labels,
            "itm_input_ids": ids,
            "itm_attention_mask": ones,
            "itm_token_type_ids": zeros,
            "itm_pixel_values": images,
            "itm_pixel_mask": pixel_mask,
            "itm_labels": (rng.random(batch_size) < 0.5).astype(np.int32),
        }
