"""In-band launcher tests: coordinated 2-process SPMD through Launcher
(localhost mode) plus the fail-fast contract. The SSH path shares all of
this code -- only _spawn's transport differs."""

import os
import sys
import textwrap

import pytest

from multimodal_llm_pretraining_tpu.experiments.launcher import LaunchError, Launcher

pytestmark = pytest.mark.slow  # subprocess-spawning; run with -m slow


WORKER = textwrap.dedent(
    """
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    from multimodal_llm_pretraining_tpu.experiments.distribute import maybe_init_distributed
    pid = maybe_init_distributed()
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4 and len(jax.local_devices()) == 2
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
    mesh = Mesh(jax.devices(), ("data",))
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), jnp.full((2,), float(pid + 1)), (4,))
    total = jax.jit(lambda a: jnp.sum(a), out_shardings=NamedSharding(mesh, P()))(x)
    print(f"LAUNCHER_OK {pid} {float(total):.1f}", flush=True)
    """
)


def test_two_host_localhost_launch(tmp_path, capfd):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    launcher = Launcher(
        hosts=["localhost", "localhost"],
        coordinator_port=9961,
        env={"PYTHONPATH": os.getcwd(), "JAX_PLATFORMS": "cpu"},
    )
    result = launcher.run([sys.executable, str(script)], timeout_s=360)
    assert result.returncodes == [0, 0]
    out = capfd.readouterr().out
    # both workers computed the same global psum (2*1 + 2*2 = 6) and logs
    # carry the per-host prefix
    assert "[h0 localhost] LAUNCHER_OK 0 6.0" in out
    assert "[h1 localhost] LAUNCHER_OK 1 6.0" in out


def test_fail_fast_terminates_peers(tmp_path):
    """Worker 1 exits non-zero immediately; worker 0 (sleeping 300s) must be
    torn down well before its sleep finishes."""
    import time

    sleeper = tmp_path / "sleeper.py"
    sleeper.write_text(
        "import os, sys, time\n"
        "time.sleep(1 if os.environ['MLPT_PROCESS_INDEX'] == '1' else 300)\n"
        "sys.exit(3 if os.environ['MLPT_PROCESS_INDEX'] == '1' else 0)\n"
    )
    launcher = Launcher(hosts=["localhost", "localhost"], coordinator_port=9963, stream=False)
    t0 = time.monotonic()
    with pytest.raises(LaunchError) as ei:
        launcher.run([sys.executable, str(sleeper)], timeout_s=120)
    assert time.monotonic() - t0 < 60  # fail-fast, not wait-for-sleeper
    assert ei.value.returncodes[1] == 3


def test_ssh_command_construction(monkeypatch):
    """Remote hosts go through ssh with quoted env + cwd (no execution)."""
    captured = {}

    class FakeProc:
        stdout = None

        def poll(self):
            return 0

    def fake_popen(argv, **kw):
        captured["argv"] = argv
        return FakeProc()

    import subprocess as sp

    monkeypatch.setattr(sp, "Popen", fake_popen)
    launcher = Launcher(hosts=["tpu-a", "tpu-b"], coordinator_port=1234, stream=False)
    launcher._spawn(1, "tpu-b", ["python", "train.py", "--x", "a b"])
    argv = captured["argv"]
    assert argv[:1] == ["ssh"] and argv[-2] == "tpu-b"
    remote = argv[-1]
    assert "MLPT_COORDINATOR_ADDRESS=tpu-a:1234" in remote
    assert "MLPT_NUM_PROCESSES=2" in remote and "MLPT_PROCESS_INDEX=1" in remote
    assert "'a b'" in remote  # argv quoting survives the shell
    assert os.getcwd() in remote
