"""Plotting/analysis functions render against a fabricated results frame."""

import pandas as pd
import pytest


@pytest.fixture()
def fake_results(monkeypatch):
    df = pd.DataFrame(
        [
            dict(free_lunch=False, activation_checkpointing=False, sharding="", offloading=False,
                 micro_batch_size=1, step_time=215.0, training_days=356.0, method="naive"),
            dict(free_lunch=True, activation_checkpointing=False, sharding="", offloading=False,
                 micro_batch_size=4, step_time=66.0, training_days=109.0, method="free-lunch"),
            dict(free_lunch=True, activation_checkpointing=True, sharding="zero_1", offloading=False,
                 micro_batch_size=8, step_time=60.0, training_days=99.0, method="free-lunch+ckpt+zero_1"),
        ]
    )
    import scripts.plotting as plotting

    monkeypatch.setattr(plotting, "load_results", lambda *a, **k: df.copy())
    for mod in ["training_time_tables", "mem_saving_methods", "tpu_days", "optimal_memory_saving_speedups", "training_costs"]:
        m = __import__(f"scripts.plotting.{mod}", fromlist=[mod])
        if hasattr(m, "load_results"):
            monkeypatch.setattr(m, "load_results", lambda *a, **k: df.copy())
    return df


def test_training_time_table(fake_results, capsys):
    from scripts.plotting.training_time_tables import training_time_table

    training_time_table(1, 1, "v5e", "pythia-160m")
    out = capsys.readouterr().out
    assert "naive" in out and "356" in out


def test_mem_saving_chart(fake_results, tmp_path):
    from scripts.plotting.mem_saving_methods import mem_saving_chart

    out = tmp_path / "chart.png"
    mem_saving_chart(1, 1, "v5e", "pythia-160m", str(out))
    assert out.exists() and out.stat().st_size > 1000


def test_training_costs(fake_results, capsys):
    from scripts.plotting.training_costs import training_cost_table

    df = training_cost_table(1, 1, "v5e", "pythia-160m")
    # best config: 99 days * 24h * 1 chip * $1.2 = $2851.2
    assert abs(df.sort_values("training_days").iloc[0]["cost_usd"] - 99 * 24 * 1.2) < 1e-6


def test_tpu_days(fake_results, capsys):
    from scripts.plotting.tpu_days import tpu_days

    tpu_days(1, 1, "v5e", "pythia-160m")
    out = capsys.readouterr().out
    assert "chip-days" in out and "original paper" in out


def test_speedups(fake_results, capsys):
    from scripts.plotting.optimal_memory_saving_speedups import speedups

    speedups(1, 1, "v5e", "pythia-160m")
    out = capsys.readouterr().out
    assert "speedup: 1.10x" in out
