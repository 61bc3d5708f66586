from .data import (
    DummyDataset,
    DummyTextModelingDataset,
    DummyImageClassificationDataset,
    DummyMultimodalLanguageModelingDataset,
    DummyMultimodalLanguageModelingForViltDataset,
)

__all__ = [
    "DummyDataset",
    "DummyTextModelingDataset",
    "DummyImageClassificationDataset",
    "DummyMultimodalLanguageModelingDataset",
    "DummyMultimodalLanguageModelingForViltDataset",
]
