"""Result analysis + plotting (parity: ``/root/reference/scripts/plotting/``).

The reference ships marimo notebooks over polars/altair; here each analysis
is an importable function + argparse CLI over pandas/matplotlib, reading the
same cached sweep workspace. Shared post-processing mirrors
``scripts/plotting/__init__.py:4-29`` (method labels, best-config selection).
"""

import sys

sys.path.insert(0, ".")

import pandas as pd


def method_label(row) -> str:
    parts = []
    if row.get("free_lunch"):
        parts.append("free-lunch")
    if row.get("activation_checkpointing"):
        policy = row.get("checkpoint_policy", "flash")
        parts.append("ckpt" if policy in (None, "flash") else f"ckpt[{policy}]")
    if row.get("sharding"):
        parts.append(str(row["sharding"]))
    if row.get("offloading"):
        parts.append("offload")
    layout = row.get("state_layout")
    if layout and not (isinstance(layout, float) and pd.isna(layout)):
        parts.append(str(layout))
    unroll = row.get("unroll_layers")
    if unroll and not (isinstance(unroll, float) and pd.isna(unroll)):
        parts.append("unroll")
    return "+".join(parts) if parts else "naive"


def load_results(num_hosts: int, chips_per_host: int, tpu_type: str, model: str) -> pd.DataFrame:
    """All cached TrainingTimeEmpirical results for one hardware x model."""
    from multimodal_llm_pretraining_tpu.experiments.sweeps import TrainingTimeEmpiricalSweep

    sweep = TrainingTimeEmpiricalSweep(
        search_space=dict(
            num_hosts=[num_hosts],
            chips_per_host=[chips_per_host],
            tpu_type=[tpu_type],
            model=[model],
            free_lunch=[False, True],
            activation_checkpointing=[False, True],
            checkpoint_policy=["flash", "dots"],
            sharding=["", "zero_1", "zero_2", "zero_3", "fsdp_shard_grad_op", "fsdp_full_shard"],
            offloading=[False, True],
            state_layout=["", "bf16_master", "bf16_sr"],
            unroll_layers=[False, True],
        )
    )
    df = sweep.results()
    if "training_days" in df.columns:
        df = df[df["training_days"].notna()].copy()
        df["method"] = df.apply(method_label, axis=1)
    return df


def standard_cli(fn):
    import argparse

    p = argparse.ArgumentParser(description=fn.__doc__)
    p.add_argument("--num-hosts", type=int, default=1)
    p.add_argument("--chips-per-host", type=int, default=1)
    p.add_argument("--tpu-type", default="v5e")
    p.add_argument("--model", default="pythia-160m")
    p.add_argument("--output", default=None, help="output file (png/tex/csv); default prints")
    a = p.parse_args()
    fn(a.num_hosts, a.chips_per_host, a.tpu_type, a.model, a.output)
