"""Experiment / Sweep abstractions.

Parity with ``experiments/utils/base_classes.py:29-259``: an Experiment is a
named DAG of cacheable steps plus an optional SLURM job spec; a Sweep is a
cartesian-product generator over a search space with batching of identical
SLURM jobs, run/count/print-incomplete/print-results commands, and tabular
results (pandas here; the reference used polars).

CLIs are argparse-driven (the reference used tyro); literal choices come
from the dataclass annotations so adding a model/TPU type propagates.
"""

import abc
import itertools
from dataclasses import dataclass, fields
from typing import Any

import pandas as pd

from ..utils import InfrastructureError, get_logger
from .cache import StepAlreadyRunning, StepCall, StepFailure, get_workspace
from .slurm import SlurmJob

logger = get_logger()


@dataclass
class Experiment(abc.ABC):
    """A named DAG of steps. Subclasses define ``step_dict`` (insertion order
    respected; later steps may consume earlier StepCalls as lazy inputs)."""

    @property
    @abc.abstractmethod
    def step_dict(self) -> dict[str, StepCall]:
        raise NotImplementedError

    def to_dict(self) -> dict[str, Any]:
        return {f.name: getattr(self, f.name) for f in fields(self)}

    def is_valid(self) -> bool:
        return True

    @property
    def slurm_job(self) -> SlurmJob | None:
        return None

    @property
    def dependencies(self) -> list["Experiment"]:
        return []

    # ------------------------------------------------------------ execution

    def run(self, record_failures: bool = False) -> None:
        for dep in self.dependencies:
            dep.run(record_failures=record_failures)
        ws = get_workspace()
        for name, call in self.step_dict.items():
            logger.info(f"[{type(self).__name__}] step '{name}'")
            try:
                call.result(ws, record_failure=record_failures)
            except StepAlreadyRunning:
                raise
            except InfrastructureError:
                # nothing was cached (by design) -- downstream steps would
                # re-resolve and re-run the failed upstream, so stop here;
                # a re-sweep retries the arm from this step
                raise
            except Exception as e:
                if not record_failures:
                    raise
                # failure is cached; keep going so downstream steps cache
                # their propagated failures and the arm reads fully "done"
                logger.info(f"step '{name}' failed ({type(e).__name__}): {e}")

    def launch(self, slurm: bool = False) -> None:
        if slurm and self.slurm_job is not None:
            self.slurm_job.submit(self)
        else:
            self.run()

    # ------------------------------------------------------------ status

    def is_cached(self) -> bool:
        ws = get_workspace()
        return all(call.is_cached(ws) for call in self.step_dict.values())

    def is_running(self) -> bool:
        ws = get_workspace()
        return any(call.is_running(ws) for call in self.step_dict.values())

    def step_result(self, name: str):
        return self.step_dict[name].result(get_workspace())

    def results(self) -> dict[str, Any]:
        return {name: self.step_result(name) for name in self.step_dict}

    # ------------------------------------------------------------ CLI

    @classmethod
    def cli(cls) -> None:
        """argparse CLI (the tyro analog): scalar fields map to flags;
        dataclass fields (e.g. ``--config``) take a JSON object string."""
        import argparse
        import dataclasses as dc
        import json
        import typing

        hints = typing.get_type_hints(cls)
        parser = argparse.ArgumentParser(description=cls.__doc__)
        for f in fields(cls):
            arg = "--" + f.name.replace("_", "-")
            ftype = hints.get(f.name, str)
            if ftype is bool:
                parser.add_argument(arg, action="store_true")
            else:
                parser.add_argument(arg, type=str)
        parser.add_argument("--slurm", action="store_true")
        ns = vars(parser.parse_args())
        slurm = ns.pop("slurm")
        kwargs = {}
        for k, v in ns.items():
            if v is None:
                continue
            ftype = hints.get(k, str)
            if dc.is_dataclass(ftype) and isinstance(v, str):
                kwargs[k] = ftype(**json.loads(v))
            elif ftype in (int, float) and isinstance(v, str):
                kwargs[k] = ftype(v)
            else:
                kwargs[k] = v
        exp = cls(**kwargs)  # type: ignore[arg-type]
        exp.launch(slurm=slurm)


class Sweep(abc.ABC):
    """Cartesian-product experiment generator over a search-space dict."""

    def __init__(self, search_space: dict[str, list]):
        self.search_space = search_space

    @abc.abstractmethod
    def build_experiment(self, **assignment) -> Experiment:
        raise NotImplementedError

    def experiments(self) -> list[Experiment]:
        keys = list(self.search_space.keys())
        out = []
        for values in itertools.product(*(self.search_space[k] for k in keys)):
            exp = self.build_experiment(**dict(zip(keys, values)))
            if exp.is_valid():
                out.append(exp)
        return out

    # ------------------------------------------------------------ commands

    def sweep(self, slurm: bool = False) -> None:
        exps = self.experiments()
        if not slurm:
            for i, exp in enumerate(exps):
                if exp.is_cached() or exp.is_running():
                    continue
                logger.info(f"--- experiment {i + 1}/{len(exps)}: {exp.to_dict()}")
                try:
                    # record_failures: a failed step caches a StepFailure so
                    # results() shows "failed: <class>" (not "not yet run")
                    # and re-sweeps don't re-run the arm (reference caches
                    # None, training_time_empirical.py:93-130)
                    exp.run(record_failures=True)
                except StepAlreadyRunning as e:
                    logger.info(f"experiment step already running elsewhere, skipping: {e}")
                except InfrastructureError as e:
                    # transient backend fault: nothing cached, arm stays
                    # "not yet run" -- move on and let a re-sweep retry it
                    logger.warning(f"experiment hit a backend fault (not cached, re-sweep retries): {e}")
                except Exception as e:
                    logger.info(f"experiment failed ({type(e).__name__}): {e}")
            return
        # batch experiments sharing a SlurmJob spec into ONE submission each
        # (submitit batch-context analog, reference base_classes.py:199-231)
        groups: dict[SlurmJob | None, list[Experiment]] = {}
        for exp in exps:
            if exp.is_cached() or exp.is_running():
                continue
            groups.setdefault(exp.slurm_job, []).append(exp)
        for job, group in groups.items():
            if job is None:
                for exp in group:
                    exp.run(record_failures=True)
            else:
                job.submit_batch(group)

    def count(self) -> tuple[int, int]:
        exps = self.experiments()
        done = sum(1 for e in exps if e.is_cached())
        return done, len(exps)

    def incomplete(self) -> list[Experiment]:
        return [e for e in self.experiments() if not e.is_cached() and not e.is_running()]

    def results(self) -> pd.DataFrame:
        rows = []
        for exp in self.experiments():
            row = dict(exp.to_dict())
            if exp.is_cached():
                res = exp.results()
                for k, v in res.items():
                    if isinstance(v, StepFailure):
                        row[k] = None
                        row["failure"] = f"{v.error_type}: {v.message}"
                    else:
                        row[k] = v if not isinstance(v, dict) else str(v)
                flat = res.get("benchmarking_results")
                if isinstance(flat, dict):
                    row.update(flat)
            rows.append(row)
        return pd.DataFrame(rows)

    @staticmethod
    def run(experiment_sweep: "Sweep", cmd: str = "run", slurm: bool = False) -> None:
        match cmd:
            case "run":
                experiment_sweep.sweep(slurm=slurm)
            case "count":
                done, total = experiment_sweep.count()
                print(f"{done} / {total} experiments cached")
            case "print-incomplete":
                for e in experiment_sweep.incomplete():
                    print(e.to_dict())
            case "print-results":
                with pd.option_context("display.max_rows", None, "display.max_columns", None, "display.width", 250):
                    print(experiment_sweep.results())
            case _:
                raise ValueError(f"unknown cmd {cmd}")
