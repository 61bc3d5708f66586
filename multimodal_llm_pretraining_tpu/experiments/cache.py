"""Content-addressed step cache: the AI2-Tango analog.

The reference caches every experiment step in a Tango workspace keyed by a
deterministic hash of function + version + args
(``experiments/utils/__tango__.py:16-77``), which is what makes sweeps
resumable (``README.md:142-144``). Same model here, without the dependency:

- ``@step(cacheable=True, version="001")`` turns a function into a lazy
  ``StepCall`` factory.
- A StepCall's unique id hashes (name, version, resolved-arg reprs); StepCall
  arguments contribute their *ids* (graph hashing, like Tango), so a step
  re-runs iff its code version or any upstream input changes.
- Results persist as dill files under ``$MLPT_WORKSPACE_DIR``; without the
  env var, an in-memory workspace is used (Tango's memory workspace,
  ``experiments/utils/__tango__.py:20-27``).
"""

import dataclasses
import functools
import hashlib
import os
from dataclasses import dataclass, field
from typing import Any, Callable

import dill

from ..utils import get_logger, is_infrastructure_error

logger = get_logger()


@dataclass(frozen=True)
class StepFailure:
    """Cached record of a failed step run.

    The reference records ``None`` for failed benchmarking arms so sweeps
    distinguish "failed" from "not yet run"
    (``/root/reference/experiments/training_time_empirical.py:93-130``); this
    carries the failure class too, so ``Sweep.results()`` can say *why*."""

    error_type: str
    message: str

    def __repr__(self) -> str:  # keep cache keys / tables readable
        return f"StepFailure({self.error_type}: {self.message[:120]})"


class StepAlreadyRunning(Exception):
    """Another live process holds this step's running claim."""


def _pid_alive(pid: int) -> bool:
    try:
        os.kill(pid, 0)
    except ProcessLookupError:
        return False
    except PermissionError:
        return True
    return True


def stable_repr(value: Any) -> str:
    """Deterministic repr for hashing: dataclasses hash by their repr (the
    ``TangoStringHash`` trick, ``experiments/utils/__tango__.py:34-37``).

    Dataclass fields still at their declared default are omitted, so adding
    a new (defaulted) search dimension does not invalidate every previously
    cached result -- only arms that actually set the new knob re-run."""
    if isinstance(value, StepCall):
        return f"StepCall({value.unique_id()})"
    if dataclasses.is_dataclass(value) and not isinstance(value, type):
        # Byte-identical to the dataclass auto-repr, except fields marked
        # cache_omit_default are dropped while at their declared default --
        # so a knob added later only re-keys the arms that actually set it.
        parts = []
        for f in dataclasses.fields(value):
            if not f.repr:
                continue
            v = getattr(value, f.name)
            if f.metadata.get("cache_omit_default") and f.default is not dataclasses.MISSING and v == f.default:
                continue
            parts.append(f"{f.name}={stable_repr(v)}")
        return f"{type(value).__name__}({', '.join(parts)})"
    if isinstance(value, dict):
        return "{" + ",".join(f"{stable_repr(k)}:{stable_repr(v)}" for k, v in sorted(value.items(), key=lambda kv: str(kv[0]))) + "}"
    if isinstance(value, (list, tuple)):
        return "[" + ",".join(stable_repr(v) for v in value) + "]"
    return repr(value)


class Workspace:
    """Directory-backed result store."""

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _path(self, uid: str) -> str:
        return os.path.join(self.root, uid + ".dill")

    def contains(self, uid: str) -> bool:
        return os.path.exists(self._path(uid))

    def load(self, uid: str) -> Any:
        with open(self._path(uid), "rb") as f:
            return dill.load(f)

    def store(self, uid: str, result: Any) -> None:
        tmp = self._path(uid) + ".tmp"
        with open(tmp, "wb") as f:
            dill.dump(result, f)
        os.replace(tmp, self._path(uid))

    def mark_running(self, uid: str, flag: bool) -> None:
        p = self._path(uid) + ".running"
        if flag:
            with open(p, "w") as f:
                f.write(str(os.getpid()))
        elif os.path.exists(p):
            os.remove(p)

    def _holder(self, uid: str) -> int | None:
        try:
            with open(self._path(uid) + ".running") as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return None

    def try_claim(self, uid: str) -> bool:
        """Atomically claim ``uid`` for this process (submitit has job-level
        exclusivity; a shared workspace needs step-level locking). Returns
        False iff a *live* other process holds the claim; stale claims from
        crashed holders are stolen."""
        p = self._path(uid) + ".running"
        for _ in range(16):
            try:
                fd = os.open(p, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                os.write(fd, str(os.getpid()).encode())
                os.close(fd)
                return True
            except FileExistsError:
                pid = self._holder(uid)
                if pid is not None and pid != os.getpid() and _pid_alive(pid):
                    return False
                try:
                    os.remove(p)
                except FileNotFoundError:
                    pass
        return False

    def is_running(self, uid: str) -> bool:
        pid = self._holder(uid)
        return pid is not None and _pid_alive(pid)


class MemoryWorkspace(Workspace):
    def __init__(self):
        self._data: dict[str, Any] = {}
        self._running: set[str] = set()

    def contains(self, uid):
        return uid in self._data

    def load(self, uid):
        return self._data[uid]

    def store(self, uid, result):
        self._data[uid] = result

    def mark_running(self, uid, flag):
        (self._running.add if flag else self._running.discard)(uid)

    def try_claim(self, uid):
        if uid in self._running:
            return False
        self._running.add(uid)
        return True

    def is_running(self, uid):
        return uid in self._running


_default_workspace: Workspace | None = None


def get_workspace() -> Workspace:
    global _default_workspace
    if _default_workspace is None:
        root = os.environ.get("MLPT_WORKSPACE_DIR")
        _default_workspace = Workspace(root) if root else MemoryWorkspace()
    return _default_workspace


def set_workspace(ws: Workspace) -> None:
    global _default_workspace
    _default_workspace = ws


@dataclass
class StepCall:
    fn: Callable
    name: str
    version: str
    cacheable: bool
    args: tuple = ()
    kwargs: dict = field(default_factory=dict)

    def unique_id(self) -> str:
        payload = f"{self.name}|{self.version}|{stable_repr(self.args)}|{stable_repr(self.kwargs)}"
        return f"{self.name}-{self.version}-" + hashlib.sha256(payload.encode()).hexdigest()[:16]

    def is_cached(self, workspace: Workspace | None = None) -> bool:
        ws = workspace or get_workspace()
        return self.cacheable and ws.contains(self.unique_id())

    def is_running(self, workspace: Workspace | None = None) -> bool:
        ws = workspace or get_workspace()
        return ws.is_running(self.unique_id())

    def result(self, workspace: Workspace | None = None, record_failure: bool = False) -> Any:
        ws = workspace or get_workspace()
        uid = self.unique_id()
        if self.cacheable and ws.contains(uid):
            return ws.load(uid)
        resolved_args = tuple(a.result(ws, record_failure) if isinstance(a, StepCall) else a for a in self.args)
        resolved_kwargs = {k: (v.result(ws, record_failure) if isinstance(v, StepCall) else v) for k, v in self.kwargs.items()}
        # a failed upstream step poisons this one: cache the propagation so
        # the whole DAG converges to "cached failure", never half-run
        upstream = [v for v in (*resolved_args, *resolved_kwargs.values()) if isinstance(v, StepFailure)]
        if upstream:
            failure = StepFailure("UpstreamStepFailure", f"{upstream[0].error_type}: {upstream[0].message}")
            if self.cacheable:
                ws.store(uid, failure)
            return failure
        if not ws.try_claim(uid):
            raise StepAlreadyRunning(uid)
        logger.info(f"Running step {uid}")
        try:
            out = self.fn(*resolved_args, **resolved_kwargs)
        except Exception as e:
            # An infrastructure fault is the machine failing, not the arm:
            # caching it would permanently mark a feasible arm "failed".
            # Leave it uncached so a re-sweep retries. Matched by message
            # too, not only type -- backend faults in the MAIN process
            # (e.g. "Unable to initialize backend 'axon': UNAVAILABLE")
            # arrive as plain RuntimeErrors.
            if record_failure and self.cacheable and not is_infrastructure_error(e):
                ws.store(uid, StepFailure(type(e).__name__, str(e)))
            raise
        finally:
            ws.mark_running(uid, False)
        if self.cacheable:
            ws.store(uid, out)
        return out


def step(cacheable: bool = True, version: str = "001"):
    """Decorator: calling the function builds a lazy, cacheable StepCall."""

    def decorate(fn: Callable):
        @functools.wraps(fn)
        def make(*args, **kwargs) -> StepCall:
            return StepCall(fn=fn, name=fn.__name__, version=version, cacheable=cacheable, args=args, kwargs=kwargs)

        make.__wrapped_step__ = fn  # type: ignore[attr-defined]
        return make

    return decorate
