"""In-band multi-host launcher (the torchrunx analog).

The reference fans out per-host worker processes over SSH via torchrunx and
collects rank 0's result (``/root/reference/experiments/utils/distribute.py:37-61``).
On TPU pods the cluster tooling usually provides that fan-out already
(``gcloud compute tpus tpu-vm ssh --worker=all``, SLURM ``srun``), which is
why ``distribute()`` only wires ``jax.distributed`` env. This module covers
the remaining case -- no scheduler, bare hosts -- with the same contract:

- one process per host, every process running the IDENTICAL command (JAX
  SPMD: one process drives all local chips; no per-chip fan-out needed);
- the ``MLPT_COORDINATOR_ADDRESS`` / ``MLPT_NUM_PROCESSES`` /
  ``MLPT_PROCESS_INDEX`` env contract consumed by
  ``distribute.maybe_init_distributed``;
- ``localhost`` entries spawn local subprocesses (CI / single-machine
  testing), anything else goes through ``ssh``;
- line-buffered log streaming with a ``[hN hostname]`` prefix per worker;
- fail-fast: the first non-zero exit terminates every other worker.
"""

from __future__ import annotations

import os
import shlex
import subprocess
import threading
import time
from dataclasses import dataclass, field

from ..utils import get_logger

logger = get_logger()

_LOCAL = ("localhost", "127.0.0.1", "::1")


class LaunchError(RuntimeError):
    """A worker exited non-zero (carries per-host return codes)."""

    def __init__(self, message: str, returncodes: list[int | None]):
        super().__init__(message)
        self.returncodes = returncodes


@dataclass
class LaunchResult:
    returncodes: list[int]
    hosts: list[str]


@dataclass
class Launcher:
    """Fan one command out to ``hosts``, one coordinated process per host.

    ``hosts[0]`` doubles as the jax.distributed coordinator; for local
    testing pass ``["localhost", "localhost"]`` (every worker runs on this
    machine with a distinct ``MLPT_PROCESS_INDEX``).
    """

    hosts: list[str]
    coordinator_port: int = 9917
    ssh_cmd: tuple[str, ...] = ("ssh", "-o", "BatchMode=yes")
    env: dict[str, str] = field(default_factory=dict)
    stream: bool = True
    poll_interval_s: float = 0.2

    def _coordinator_address(self) -> str:
        head = self.hosts[0]
        if head in _LOCAL:
            head = "localhost"
        return f"{head}:{self.coordinator_port}"

    def _worker_env(self, index: int) -> dict[str, str]:
        env = {
            "MLPT_COORDINATOR_ADDRESS": self._coordinator_address(),
            "MLPT_NUM_PROCESSES": str(len(self.hosts)),
            "MLPT_PROCESS_INDEX": str(index),
        }
        env.update(self.env)
        return env

    def _spawn(self, index: int, host: str, argv: list[str]) -> subprocess.Popen:
        extra = self._worker_env(index)
        if host in _LOCAL:
            env = dict(os.environ)
            env.update(extra)
            return subprocess.Popen(
                argv, env=env, cwd=os.getcwd(),
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, bufsize=1,
            )
        # Remote: ssh <host> 'cd <cwd> && env K=V ... exec <argv>'. The remote
        # working directory mirrors the local one (shared filesystem or a
        # synced checkout -- same assumption torchrunx makes).
        assignments = " ".join(f"{k}={shlex.quote(v)}" for k, v in extra.items())
        remote = f"cd {shlex.quote(os.getcwd())} && env {assignments} {shlex.join(argv)}"
        return subprocess.Popen(
            [*self.ssh_cmd, host, remote],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True, bufsize=1,
        )

    def run(self, argv: list[str], timeout_s: float | None = None) -> LaunchResult:
        """Launch ``argv`` on every host; stream logs; fail fast.

        Returns per-host return codes (all zero) on success; raises
        ``LaunchError`` when any worker fails (after terminating the rest)
        or ``TimeoutError`` past ``timeout_s``.
        """
        logger.info(f"launching {shlex.join(argv)} on {len(self.hosts)} host(s); coordinator {self._coordinator_address()}")
        procs = [self._spawn(i, h, argv) for i, h in enumerate(self.hosts)]
        streams = [self._start_streamer(i, h, p) for i, (h, p) in enumerate(zip(self.hosts, procs))]
        deadline = time.monotonic() + timeout_s if timeout_s else None
        try:
            while True:
                codes = [p.poll() for p in procs]
                failed = [i for i, c in enumerate(codes) if c not in (None, 0)]
                if failed:
                    self._terminate(procs)
                    self._join(streams)
                    raise LaunchError(
                        f"worker(s) {failed} on host(s) {[self.hosts[i] for i in failed]} "
                        f"exited non-zero ({[codes[i] for i in failed]}); remaining workers terminated",
                        codes,
                    )
                if all(c == 0 for c in codes):
                    self._join(streams)
                    return LaunchResult(returncodes=[0] * len(procs), hosts=list(self.hosts))
                if deadline and time.monotonic() > deadline:
                    self._terminate(procs)
                    self._join(streams)
                    raise TimeoutError(f"launch exceeded {timeout_s}s; workers terminated")
                time.sleep(self.poll_interval_s)
        finally:
            self._terminate(procs)  # no-op for already-exited workers

    # ------------------------------------------------------------- plumbing

    def _start_streamer(self, index: int, host: str, proc: subprocess.Popen) -> threading.Thread:
        prefix = f"[h{index} {host}]"

        def pump():
            assert proc.stdout is not None
            for line in proc.stdout:
                if self.stream:
                    print(f"{prefix} {line.rstrip()}", flush=True)

        t = threading.Thread(target=pump, daemon=True)
        t.start()
        return t

    @staticmethod
    def _terminate(procs: list[subprocess.Popen]) -> None:
        # terminate by EXACT pid (never by pattern), escalate to kill
        for p in procs:
            if p.poll() is None:
                p.terminate()
        for p in procs:
            if p.poll() is None:
                try:
                    p.wait(timeout=10)
                except subprocess.TimeoutExpired:
                    p.kill()

    @staticmethod
    def _join(streams: list[threading.Thread]) -> None:
        for t in streams:
            t.join(timeout=5)
