"""TPU chip registry: supported accelerator types and their capabilities.

TPU-native analog of the reference's GPU registry (``src/gpus.py:3-11``) and of
its analytic peak-TFLOPS tables (``experiments/training_time_analytic.py:24-47``).
The reference gates bf16 on Ampere-or-newer GPUs; every TPU generation here
supports bf16 natively, so ``supports_bf16`` is always True (kept as an explicit
function so the validity predicates read the same way).

Peak numbers are per *chip* (not per core), from public Google Cloud TPU
datasheets. ``fp32_highest`` models matmuls run at HIGHEST precision (six-pass
fp32 emulation on the MXU, ~1/8 of bf16 peak); ``fp32_high`` models HIGH
precision (bf16_3x, ~1/3 of bf16 peak) -- the TPU analog of TF32.
"""

from dataclasses import dataclass
from typing import Literal

TpuT = Literal["v2", "v3", "v4", "v5e", "v5p", "v6e"]

TPU_TYPES: tuple[TpuT, ...] = ("v2", "v3", "v4", "v5e", "v5p", "v6e")


@dataclass(frozen=True)
class TpuChipSpec:
    name: TpuT
    peak_bf16_tflops: float  # per chip
    hbm_gib: float  # per chip
    hbm_bandwidth_gbps: float  # per chip
    ici_bandwidth_gbps: float  # aggregate one-way inter-chip, per chip
    cores_per_chip: int
    default_chips_per_host: int

    @property
    def peak_fp32_high_tflops(self) -> float:
        """HIGH matmul precision (bf16_3x passes) -- the TF32 analog."""
        return self.peak_bf16_tflops / 3

    @property
    def peak_fp32_highest_tflops(self) -> float:
        """HIGHEST matmul precision (full fp32 emulation)."""
        return self.peak_bf16_tflops / 8

    @property
    def hbm_bytes(self) -> int:
        return int(self.hbm_gib * (1024**3))


_SPECS: dict[TpuT, TpuChipSpec] = {
    s.name: s
    for s in [
        TpuChipSpec("v2", peak_bf16_tflops=46.0, hbm_gib=16.0, hbm_bandwidth_gbps=700, ici_bandwidth_gbps=496, cores_per_chip=2, default_chips_per_host=4),
        TpuChipSpec("v3", peak_bf16_tflops=123.0, hbm_gib=32.0, hbm_bandwidth_gbps=900, ici_bandwidth_gbps=656, cores_per_chip=2, default_chips_per_host=4),
        TpuChipSpec("v4", peak_bf16_tflops=275.0, hbm_gib=32.0, hbm_bandwidth_gbps=1228, ici_bandwidth_gbps=2400, cores_per_chip=2, default_chips_per_host=4),
        TpuChipSpec("v5e", peak_bf16_tflops=197.0, hbm_gib=16.0, hbm_bandwidth_gbps=819, ici_bandwidth_gbps=1600, cores_per_chip=1, default_chips_per_host=4),
        TpuChipSpec("v5p", peak_bf16_tflops=459.0, hbm_gib=95.0, hbm_bandwidth_gbps=2765, ici_bandwidth_gbps=4800, cores_per_chip=2, default_chips_per_host=4),
        TpuChipSpec("v6e", peak_bf16_tflops=918.0, hbm_gib=32.0, hbm_bandwidth_gbps=1640, ici_bandwidth_gbps=3584, cores_per_chip=1, default_chips_per_host=4),
    ]
}


def chip_spec(tpu_type: TpuT) -> TpuChipSpec:
    return _SPECS[tpu_type]


def supports_bf16(tpu_type: TpuT) -> bool:
    """Parity shim for the reference's ``ampere_or_newer_gpu`` capability gate
    (``src/gpus.py:6-11``): every TPU generation supports bf16 natively."""
    return True


def peak_tflops(tpu_type: TpuT, dtype: Literal["bf16", "fp32_high", "fp32_highest"]) -> float:
    """Per-chip peak TFLOPS used by the analytic training-time model, mirroring
    ``experiments/training_time_analytic.py:24-47`` (which hardcodes per-GPU
    datasheet numbers for bf16 vs TF32)."""
    spec = chip_spec(tpu_type)
    match dtype:
        case "bf16":
            return spec.peak_bf16_tflops
        case "fp32_high":
            return spec.peak_fp32_high_tflops
        case "fp32_highest":
            return spec.peak_fp32_highest_tflops
    raise ValueError(f"unknown dtype {dtype}")


def detect_local_tpu() -> TpuT | None:
    """Best-effort detection of the locally attached TPU generation."""
    import jax

    try:
        dev = jax.devices()[0]
    except Exception:
        return None
    kind = getattr(dev, "device_kind", "").lower()
    for name, pattern in [
        ("v6e", "v6"),
        ("v5p", "v5p"),
        ("v5e", "v5 lite"),
        ("v5e", "v5e"),
        ("v4", "v4"),
        ("v3", "v3"),
        ("v2", "v2"),
    ]:
        if pattern in kind:
            return name  # type: ignore[return-value]
    return None


def device_hbm_bytes(tpu_type: TpuT | None = None) -> int:
    """HBM budget per device: live runtime number when available (TPU
    ``memory_stats()['bytes_limit']``), else the registry value."""
    import jax

    try:
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    if tpu_type is not None:
        return chip_spec(tpu_type).hbm_bytes
    detected = detect_local_tpu()
    if detected is not None:
        return chip_spec(detected).hbm_bytes
    # CPU / unknown backend: fall back to a v4-sized budget.
    return chip_spec("v4").hbm_bytes
