"""True multi-process SPMD test: 2 'hosts' x 4 CPU devices each, coordinated
by jax.distributed through the MLPT_* env contract -- the closest thing to a
multi-node TPU run that fits in CI. The reference never tested its
multi-node path off-cluster (SURVEY.md section 4)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # subprocess-spawning; run with -m slow

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
from multimodal_llm_pretraining_tpu.experiments.distribute import maybe_init_distributed
pid = maybe_init_distributed()
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 8 and len(jax.local_devices()) == 4

from multimodal_llm_pretraining_tpu.models import get_model_class
from multimodal_llm_pretraining_tpu.parallel.mesh import MeshConfig
from multimodal_llm_pretraining_tpu.train import TrainingPlan

mc = get_model_class("pythia-14m")
plan = TrainingPlan(num_training_steps=2, micro_batch_size=1, gradient_accumulation_steps=1,
    optimizer=mc.optimizer, optimizer_kwargs=mc.optimizer_kwargs,
    scheduler_type=mc.scheduler_type, scheduler_kwargs=mc.scheduler_kwargs,
    sharding="fsdp_hybrid_shard", max_grad_norm=mc.max_grad_norm, use_custom_kernels=False,
    mesh=MeshConfig(num_hosts=2, chips_per_host=4))
sess = plan.build_session(mc)
sess.dataset.sequence_length = 17
state = sess.init_state()
state, m = sess.train_step_fn()(state, sess.make_train_batch(seed=0), jax.random.key(0))
loss = float(m["loss"])
import numpy as np
assert np.isfinite(loss)
print(f"MULTIHOST_OK {pid} {loss:.6f}", flush=True)
"""


def test_two_process_hybrid_fsdp(tmp_path):
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    procs = []
    for i in range(2):
        env = dict(os.environ)
        env.update(
            MLPT_COORDINATOR_ADDRESS="localhost:9917",
            MLPT_NUM_PROCESSES="2",
            MLPT_PROCESS_INDEX=str(i),
            PYTHONPATH=os.getcwd(),
            JAX_PLATFORMS="cpu",
        )
        procs.append(subprocess.Popen([sys.executable, str(script)], env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = [p.communicate(timeout=560)[0] for p in procs]
    losses = []
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        line = [ln for ln in out.splitlines() if ln.startswith("MULTIHOST_OK")][0]
        losses.append(float(line.split()[2]))
    # both hosts computed the identical global step
    assert losses[0] == losses[1]
