"""Fresh-process probe isolation.

On this TPU runtime a *runtime* RESOURCE_EXHAUSTED can poison the whole
process: even deleting every live buffer and re-initializing device state
has been observed to fail afterwards. The reference gets crash isolation
for free by re-forking CUDA worker processes per probe (torchrunx,
``/root/reference/experiments/utils/distribute.py:37-61``); the TPU analog
here is a disposable worker process per *executing* probe. The parent
process only orchestrates and AOT-compiles (side-effect-free): anything
that actually runs on the chip during a search runs in a worker that is
allowed to die.

Protocol: the parent serializes a JSON spec, the worker
(``benchmarking.probe_worker``) performs one operation and prints a single
``MLPT_RESULT:{json}`` line. The parent classifies any failure from the
combined output: OOM markers -> ``{"oom": true}``; Pallas/Mosaic lowering
markers -> ``{"lowering_failure": true}``; anything else raises.
"""

import json
import os
import subprocess
import sys
import time

from ..utils import InfrastructureError, get_logger

logger = get_logger()

RESULT_PREFIX = "MLPT_RESULT:"

_LOWERING_MARKERS = ("Mosaic", "mosaic", "Pallas", "pallas", "lowering", "Unimplemented primitive")

# Transient backend faults (the axon tunnel occasionally drops a dispatch
# with UNAVAILABLE mid-sweep). These say nothing about the arm under test,
# so the worker is retried and -- if the fault persists -- an
# InfrastructureError propagates instead of a cacheable arm failure.
# Marker list shared with the step cache's main-process classifier.
from ..utils import INFRA_MARKERS as _INFRA_MARKERS  # noqa: E402


# TPU worker metadata the axon plugin writes into os.environ on a SUCCESSFUL
# backend init (observed on this runtime: TPU_WORKER_HOSTNAMES=localhost,
# TPU_ACCELERATOR_TYPE=v5litepod-4, TPU_TOPOLOGY=1x1). When the plugin's
# metadata query fails it writes its WARNING TEXT into these vars instead,
# and a child inheriting them -- or re-querying under tunnel contention --
# dies at libtpu init before the backend exists. _worker_env snapshots the
# first clean values it sees so poisoned/missing vars can be repaired from a
# known-good source instead of trusting the child's own flaky query.
_TPU_METADATA_VARS = ("TPU_WORKER_HOSTNAMES", "TPU_ACCELERATOR_TYPE", "TPU_TOPOLOGY")
_CLEAN_TPU_ENV: dict = {}

# Last-resort pins when the parent never saw clean values (its OWN init query
# failed): verified on this runtime by spawning a child with these pinned
# while the parent held the tunnel -- init succeeds and libtpu leaves the env
# alone. Without a complete set, libtpu re-queries and overwrites ALL of them
# with its WARNING text on failure. Only the single-chip v5e runtime is
# evidence-based; other generations fall through to the old drop-and-requery
# behavior.
_LAST_RESORT_BY_GEN = {
    "v5e": {
        "TPU_WORKER_HOSTNAMES": "localhost",
        "TPU_ACCELERATOR_TYPE": "v5litepod-4",
        "TPU_TOPOLOGY": "1x1",
    }
}


def _last_resort_tpu_env() -> dict:
    """Env-only lookup: reads ``PALLAS_AXON_TPU_GEN`` (exported by the parent
    in ``_worker_env``). Deliberately never probes ``jax.devices()`` -- probe
    workers call this BEFORE backend config, where a device probe would (1)
    init the default TPU backend in CPU-mode workers (tunnel contention) and
    (2) in the poisoned-env case fail, apply no pins, and leave the failed
    init cached in-process -- defeating the self-repair entirely."""
    gen = os.environ.get("PALLAS_AXON_TPU_GEN")
    return _LAST_RESORT_BY_GEN.get(gen or "", {})


def _remember_clean_tpu_env() -> None:
    for var in _TPU_METADATA_VARS:
        val = os.environ.get(var)
        if val and "WARNING" not in val and " " not in val and var not in _CLEAN_TPU_ENV:
            _CLEAN_TPU_ENV[var] = val


def _worker_env(env_overrides: dict | None = None) -> dict:
    _remember_clean_tpu_env()
    env = dict(os.environ)
    # Repair plugin-poisoned or missing TPU metadata from the clean snapshot.
    # Observed failure modes this prevents (each killed whole probe sweeps):
    #  - TPU_WORKER_HOSTNAMES carrying 'WARNING: could not determine ...'
    #    -> child libtpu: INVALID_ARGUMENT 'unexpected worker hostname'
    #  - TPU_ACCELERATOR_TYPE carrying WARNING text -> 'Failed to find host
    #    bounds for accelerator type'
    #  - vars dropped entirely -> the child re-queries metadata itself, which
    #    fails transiently under tunnel contention with the same two errors.
    import jax

    on_tpu = jax.default_backend() == "tpu"
    # Export the detected TPU generation so children can resolve last-resort
    # pins from env alone (the parent's backend is already initialized here,
    # so detect_local_tpu is safe ONLY on this side of the fork).
    if on_tpu and not os.environ.get("PALLAS_AXON_TPU_GEN"):
        from ..tpus import detect_local_tpu

        gen = detect_local_tpu()
        if gen:
            os.environ["PALLAS_AXON_TPU_GEN"] = gen
            env["PALLAS_AXON_TPU_GEN"] = gen
    last_resort = _last_resort_tpu_env() if on_tpu else {}
    for var in _TPU_METADATA_VARS:
        val = env.get(var)
        poisoned = val is not None and ("WARNING" in val or " " in val)
        if poisoned or val is None:
            if var in _CLEAN_TPU_ENV:
                env[var] = _CLEAN_TPU_ENV[var]
            elif var in last_resort:
                env[var] = last_resort[var]
            elif var == "TPU_WORKER_HOSTNAMES" and poisoned:
                env[var] = "localhost"  # single-host probe workers by design
            elif poisoned:
                del env[var]
    # Any OTHER poisoned TPU_* var: drop it (unset beats WARNING text).
    for var, val in list(env.items()):
        if var.startswith("TPU_") and var not in _TPU_METADATA_VARS and "WARNING" in val:
            del env[var]
    # Workers must match the parent's backend. Off-TPU (CPU tests) the
    # parent's virtual device count only exists via env+config, so pass it
    # through explicitly.
    import jax

    if jax.default_backend() != "tpu":
        env["MLPT_WORKER_PLATFORM"] = jax.default_backend()
        n = len(jax.devices())
        flags = env.get("XLA_FLAGS", "")
        if "--xla_force_host_platform_device_count" not in flags:
            env["XLA_FLAGS"] = (flags + f" --xla_force_host_platform_device_count={n}").strip()
    # A multi-host worker group must rendezvous on its own port, not the
    # parent group's (one coordinator per jax.distributed world).
    coord = env.get("MLPT_COORDINATOR_ADDRESS")
    if coord and ":" in coord:
        host, port = coord.rsplit(":", 1)
        env["MLPT_COORDINATOR_ADDRESS"] = f"{host}:{int(port) + 17}"
    if env_overrides:
        env.update(env_overrides)
    return env


# A stage-level `timeout`/SIGTERM kills the sweep driver but NOT its probe
# worker grandchild, which then keeps holding the TPU tunnel and starves
# every later process (metadata queries fail -> 'unexpected worker hostname'
# deaths across whole sweeps). Track the active worker and reap it on
# SIGTERM before re-raising the default disposition.
_ACTIVE_WORKER = None
_SIGTERM_INSTALLED = False


def _install_sigterm_cleanup() -> None:
    global _SIGTERM_INSTALLED
    if _SIGTERM_INSTALLED:
        return
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        return  # signal handlers only install from the main thread

    def _handler(signum, frame):
        proc = _ACTIVE_WORKER
        if proc is not None and proc.poll() is None:
            proc.kill()
        signal.signal(signum, signal.SIG_DFL)
        os.kill(os.getpid(), signum)

    try:
        signal.signal(signal.SIGTERM, _handler)
        _SIGTERM_INSTALLED = True
    except ValueError:  # non-main-thread race fallback
        pass


def _run_tracked(cmd, input, timeout, env, cwd):
    """subprocess.run equivalent that records the live child so the SIGTERM
    handler can reap it (run() hides its Popen). Kills the child on timeout,
    same as subprocess.run."""
    global _ACTIVE_WORKER
    proc = subprocess.Popen(
        cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
        text=True, env=env, cwd=cwd,
    )
    _ACTIVE_WORKER = proc
    try:
        stdout, stderr = proc.communicate(input=input, timeout=timeout)
    except subprocess.TimeoutExpired:
        proc.kill()
        stdout, stderr = proc.communicate()
        raise subprocess.TimeoutExpired(cmd, timeout, output=stdout, stderr=stderr)
    finally:
        _ACTIVE_WORKER = None
    return subprocess.CompletedProcess(cmd, proc.returncode, stdout, stderr)


def classify_worker_failure(output: str) -> dict | None:
    """Map worker output to a structured failure, or None if unrecognized."""
    from .utils import _OOM_MARKERS

    if any(m in output for m in _OOM_MARKERS):
        return {"oom": True}
    if any(m in output for m in _LOWERING_MARKERS):
        return {"lowering_failure": True}
    if any(m in output for m in _INFRA_MARKERS):
        return {"infra": True}
    return None


def run_probe_worker(
    spec: dict,
    timeout: float | None = None,
    env_overrides: dict | None = None,
    infra_retries: int = 2,
) -> dict:
    """Run one probe op in a disposable worker process.

    Returns the worker's result dict on success, ``{"oom": True}`` /
    ``{"lowering_failure": True}`` when the worker died recognizably, retries
    up to ``infra_retries`` times on transient backend faults (then raises
    ``InfrastructureError``), and raises RuntimeError on unclassifiable
    failures.

    ``timeout=None`` picks a spec-aware default: offload arms compile ~13
    grouped host-update programs (legitimately 30+ min on the remote
    compiler) and keep the 1 h deadline; everything else compiles a handful
    of programs and gets 30 min -- a worker hung on a tunnel stall (observed
    2026-08-19: dispatches that never return) then costs minutes of sweep
    time, not an hour.
    """
    if timeout is None:
        timeout = 3600.0 if spec.get("config", {}).get("offloading") else 1800.0
    _install_sigterm_cleanup()
    last_infra = ""
    for attempt in range(infra_retries + 1):
        try:
            proc = _run_tracked(
                [sys.executable, "-m", "multimodal_llm_pretraining_tpu.benchmarking.probe_worker"],
                input=json.dumps(spec),
                timeout=timeout,
                env=_worker_env(env_overrides),
                cwd=os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
            )
        except subprocess.TimeoutExpired as e:
            # A hung worker says nothing about the arm (observed: tunnel
            # contention stretches remote compiles past any sane bound).
            # Never cache this as an arm failure; no in-loop retry either --
            # another hang would burn the same wall-clock again.
            raise InfrastructureError(
                f"probe worker ({spec.get('op')}) hung past {timeout:.0f}s; "
                f"stderr tail: {str(e.stderr)[-500:]}"
            ) from None
        for line in reversed(proc.stdout.splitlines()):
            if line.startswith(RESULT_PREFIX):
                result = json.loads(line[len(RESULT_PREFIX):])
                if proc.returncode == 0:
                    return result
        failure = classify_worker_failure(proc.stdout + proc.stderr)
        if failure == {"infra": True}:
            last_infra = (proc.stdout + proc.stderr)[-2000:]
            if attempt < infra_retries:
                marker = next((m for m in _INFRA_MARKERS if m in proc.stdout + proc.stderr), "?")
                logger.info(
                    f"probe worker ({spec.get('op')}) hit a transient backend fault "
                    f"({marker!r}, rc={proc.returncode}); retry {attempt + 1}/{infra_retries}"
                )
                time.sleep(15.0 * (attempt + 1))
            continue
        if failure is not None:
            logger.info(f"probe worker ({spec.get('op')}) died: {failure} (rc={proc.returncode})")
            return failure
        raise RuntimeError(
            f"probe worker failed unrecognizably (rc={proc.returncode}):\n"
            f"stdout tail: {proc.stdout[-2000:]}\nstderr tail: {proc.stderr[-2000:]}"
        )
    raise InfrastructureError(
        f"probe worker ({spec.get('op')}) failed {infra_retries + 1}x on backend faults; "
        f"last output tail: {last_infra}"
    )
