"""The driver's multi-chip dry run, executed as a committed slow test.

``__graft_entry__.dryrun_multichip`` is the driver's gate on the multi-chip
sharding path (round-4 verdict item 8: a regression there must be caught by
the repo's own test matrix BEFORE the driver runs it). The conftest already
forces an 8-device CPU mesh, so the dry run's five arms -- hybrid-FSDP+TP
pythia, zero_3++ int8 collectives, llava-pretrain zero_3+TP2 with freeze
masks, vilt-pretrain fsdp_full_shard (3 passes/step), and mamba
fsdp_full_shard+bf16_sr -- execute in-process as real SPMD programs.
"""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

pytestmark = pytest.mark.slow  # five sharded compiles; minutes on CPU


def test_dryrun_multichip_eight_devices(eight_devices, capsys):
    import __graft_entry__

    __graft_entry__._dryrun_impl(8)
    out = capsys.readouterr().out
    # one line per arm; the set here must track _dryrun_impl's passes
    assert out.count("dryrun_multichip(8)") == 5, out
    for marker in (
        "sharding=fsdp_hybrid_shard",
        "sharding=zero_3++",
        "model=llava-pretrain",
        "model=vilt-pretrain",
        "model=mamba",
    ):
        assert marker in out, f"missing dryrun arm {marker!r} in:\n{out}"
