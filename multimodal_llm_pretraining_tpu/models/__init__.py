"""Model zoo: supported models, hyper-parameters, and the class contract.

TPU-native re-derivation of the reference registry
(``/root/reference/src/models/__init__.py:24-298``): same model-type literals,
same per-model workload hyper-parameters (batch size, steps, optimizer,
schedule), but ``build_model`` returns a :class:`ModelBundle` -- a flax module
plus pure ``init``/``loss`` functions -- instead of a torch ``PreTrainedModel``.

Adding new models: extend ``ModelT`` and ``get_model_class`` here, then
implement ``BaseModelClass`` (via ``LanguageModelClass`` etc.) in a new file.
"""

import enum
from abc import ABC, abstractmethod
from dataclasses import dataclass, field
from typing import Any, Callable, Generic, Literal, TypeVar

from ..benchmarking.data import (
    DummyDataset,
    DummyImageClassificationDataset,
    DummyMultimodalLanguageModelingDataset,
    DummyMultimodalLanguageModelingForViltDataset,
    DummyTextModelingDataset,
)

## Model types (mirrors reference src/models/__init__.py:24-61)

RobertaT = Literal["roberta"]

PythiaT = Literal[
    "pythia-14m",
    "pythia-31m",
    "pythia-70m",
    "pythia-160m",
    "pythia-410m",
    "pythia-1b",
    "pythia-1.4b",
    "pythia-2.8b",
    "pythia-6.9b",
    "pythia-12b",
]

MambaT = Literal["mamba"]

ConvNextT = Literal["convnext-large-1k", "convnext-large-22k", "convnext-xlarge-22k"]

ViTT = Literal["vit"]

LlavaT = Literal["llava-pretrain", "llava-finetune"]

ViltT = Literal["vilt-pretrain", "vilt-finetune", "vilt-original-pretrain", "vilt-original-finetune"]

ModelT = Literal[RobertaT, PythiaT, MambaT, ConvNextT, ViTT, LlavaT, ViltT]

MODEL_TYPES: tuple[str, ...] = (
    "roberta",
    "pythia-14m",
    "pythia-31m",
    "pythia-70m",
    "pythia-160m",
    "pythia-410m",
    "pythia-1b",
    "pythia-1.4b",
    "pythia-2.8b",
    "pythia-6.9b",
    "pythia-12b",
    "mamba",
    "convnext-large-1k",
    "convnext-large-22k",
    "convnext-xlarge-22k",
    "vit",
    "llava-pretrain",
    "llava-finetune",
    "vilt-pretrain",
    "vilt-finetune",
    "vilt-original-pretrain",
    "vilt-original-finetune",
)


class SchedulerType(str, enum.Enum):
    """LR schedules used by the zoo (HF SchedulerType subset the reference
    actually uses: linear, cosine, cosine_with_min_lr)."""

    LINEAR = "linear"
    COSINE = "cosine"
    COSINE_WITH_MIN_LR = "cosine_with_min_lr"


OptimizerT = Literal["adam", "adamw"]  # torch.optim.{Adam,AdamW} analogs


@dataclass
class ModelBundle:
    """What ``build_model`` returns: everything the train-step factory needs.

    ``loss_fn(params, batch, rng, train)`` must be jit-pure and return
    ``(scalar_loss, metrics_dict)``. ``init_fn(rng)`` returns the param
    pytree. ``trainable_mask`` (same treedef as params, bool leaves) marks
    frozen subtrees -- the LLaVA projector-only pretraining analog
    (``src/models/llava.py:49-52``). ``tp_rules`` are optional
    [(param-path regex, PartitionSpec)] tensor-parallel annotations.
    """

    init_fn: Callable
    loss_fn: Callable
    trainable_mask: Any | None = None
    tp_rules: list = field(default_factory=list)


T = TypeVar("T", bound=ModelT)


class BaseModelClass(ABC, Generic[T]):
    """Defines a model and its pretraining recipe (contract parity with
    ``src/models/__init__.py:67-162``)."""

    def __init__(self, model_type: T) -> None:
        self.model_type: T = model_type

    @abstractmethod
    def build_model(self, use_custom_kernels: bool = True, activation_checkpointing: bool = False) -> ModelBundle:
        """Build the flax model bundle.

        ``use_custom_kernels`` toggles the pallas kernel paths (the sdpa-vs-
        eager analog); ``activation_checkpointing`` applies remat to the
        layer stacks (the HF ``gradient_checkpointing`` analog).
        """
        raise NotImplementedError

    @property
    def supports_activation_checkpointing(self) -> bool:
        """jax.checkpoint works everywhere, but the flag is kept so search
        spaces and validity rules line up with the reference."""
        return True

    @property
    def supports_compilation(self) -> bool:
        """Everything jits under XLA (the reference disables torch.compile
        for Mamba; our pallas scan path compiles fine)."""
        return True

    @property
    @abstractmethod
    def batch_size(self) -> int:
        """Global batch size; num_hosts * chips_per_host * micro_batch_size *
        grad_acc_steps always equals this."""
        raise NotImplementedError

    @property
    @abstractmethod
    def training_steps(self) -> int:
        raise NotImplementedError

    @property
    @abstractmethod
    def mixed_precision(self) -> Literal[None, "bf16", "fp16"]:
        """None = fp32 compute. Both "bf16" and "fp16" run as bf16 compute on
        TPU (no fp16 units / no loss scaler needed); the distinction is kept
        for config parity with the reference."""
        raise NotImplementedError

    @property
    @abstractmethod
    def optimizer(self) -> OptimizerT:
        raise NotImplementedError

    @property
    @abstractmethod
    def optimizer_kwargs(self) -> dict[str, Any]:
        """lr / betas / eps / weight_decay. "adam" applies weight decay as L2
        into the gradient (torch.optim.Adam semantics); "adamw" decouples."""
        raise NotImplementedError

    @property
    @abstractmethod
    def scheduler_type(self) -> SchedulerType:
        raise NotImplementedError

    @property
    @abstractmethod
    def scheduler_kwargs(self) -> dict[str, Any]:
        raise NotImplementedError

    @property
    @abstractmethod
    def max_grad_norm(self) -> float:
        """0.0 disables clipping (HF convention the reference relies on)."""
        raise NotImplementedError

    @property
    def extra_training_args(self) -> dict[str, Any]:
        """Analog of per-model ``hf_training_args`` overrides."""
        return {}

    @property
    def fsdp_layers_to_wrap(self) -> list[str]:
        """Kept for config parity (``src/models/pythia.py:89-90``): names of
        the major repeated blocks. On TPU sharding is shape-based, so this is
        documentation plus a hint for remat scopes."""
        return []

    @abstractmethod
    def load_dummy_dataset(self) -> DummyDataset:
        raise NotImplementedError


class LanguageModelClass(Generic[T], BaseModelClass[T]):
    @property
    @abstractmethod
    def vocab_size(self) -> int:
        raise NotImplementedError

    @property
    @abstractmethod
    def sequence_length(self) -> int:
        raise NotImplementedError

    def load_dummy_dataset(self) -> DummyDataset:
        return DummyTextModelingDataset(vocab_size=self.vocab_size, sequence_length=self.sequence_length)


class VisionModelClass(Generic[T], BaseModelClass[T]):
    @property
    @abstractmethod
    def image_size(self) -> int:
        raise NotImplementedError

    @property
    @abstractmethod
    def num_classes(self) -> int:
        raise NotImplementedError

    def load_dummy_dataset(self) -> DummyDataset:
        return DummyImageClassificationDataset(image_size=self.image_size, num_classes=self.num_classes)


class MultimodalModelClass(Generic[T], BaseModelClass[T]):
    @property
    @abstractmethod
    def vocab_size(self) -> int:
        raise NotImplementedError

    @property
    @abstractmethod
    def sequence_length(self) -> int:
        raise NotImplementedError

    @property
    @abstractmethod
    def image_size(self) -> int:
        raise NotImplementedError

    def load_dummy_dataset(self, sequence_length: int = 512) -> DummyDataset:
        # The reference benchmarks multimodal models at seq 512 regardless of
        # the declared max sequence length (src/models/__init__.py:222).
        if self.model_type.startswith("vilt"):
            return DummyMultimodalLanguageModelingForViltDataset(
                vocab_size=self.vocab_size,
                sequence_length=sequence_length,
                image_size=self.image_size,
                # reference hardcodes the llama mask token 128255
                # (src/benchmarking/data.py:113), which is out of range for
                # the 30522-vocab original-ViLT variant; clamp to the vocab
                mask_token=min(128255, self.vocab_size - 1),
            )
        return DummyMultimodalLanguageModelingDataset(
            vocab_size=self.vocab_size,
            sequence_length=sequence_length,
            image_size=self.image_size,
            image_token_id=getattr(self, "image_token_index", 32000),
        )


def get_model_class(model_type: ModelT) -> BaseModelClass:
    if model_type == "roberta":
        from .roberta import RobertaModelClass

        return RobertaModelClass(model_type)
    if model_type.startswith("pythia"):
        from .pythia import PythiaModelClass

        return PythiaModelClass(model_type)
    if model_type == "mamba":
        from .mamba import MambaModelClass

        return MambaModelClass(model_type)
    if model_type.startswith("convnext"):
        from .convnext import ConvNextModelClass

        return ConvNextModelClass(model_type)
    if model_type == "vit":
        from .vit import ViTModelClass

        return ViTModelClass(model_type)
    if model_type == "llava-pretrain":
        from .llava import LlavaPretrainModelClass

        return LlavaPretrainModelClass(model_type)
    if model_type == "llava-finetune":
        from .llava import LlavaFinetuneModelClass

        return LlavaFinetuneModelClass(model_type)
    if model_type == "vilt-pretrain":
        from .vilt import ViltPretrainModelClass

        return ViltPretrainModelClass(model_type)
    if model_type == "vilt-finetune":
        from .vilt import ViltFinetuneModelClass

        return ViltFinetuneModelClass(model_type)
    if model_type == "vilt-original-pretrain":
        from .vilt_original import ViltOriginalPretrainModelClass

        return ViltOriginalPretrainModelClass(model_type)
    if model_type == "vilt-original-finetune":
        from .vilt_original import ViltOriginalFinetuneModelClass

        return ViltOriginalFinetuneModelClass(model_type)
    raise ValueError(f"unknown model type: {model_type}")


__all__ = [
    "ModelT",
    "MODEL_TYPES",
    "ModelBundle",
    "SchedulerType",
    "OptimizerT",
    "BaseModelClass",
    "LanguageModelClass",
    "VisionModelClass",
    "MultimodalModelClass",
    "get_model_class",
]
