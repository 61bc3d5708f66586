"""Academic-compute survey analysis (parity: ``/root/reference/scripts/
plotting/preprocess_survey.py`` + ``survey.py``).

The reference analyzes the paper's survey of academic researchers' compute
resources with a marimo/altair notebook; the raw data
(``artifacts/raw_survey.csv``) is NOT shipped in its tree, so the notebook
is not runnable there either. This module keeps the capability as plain
functions + CLI over pandas/matplotlib: the same column schema, the same
preprocessing window, and the notebook's headline charts as PNGs.

    python scripts/plotting/survey.py --raw artifacts/raw_survey.csv \
        --out-dir artifacts/plots/survey
"""

import argparse
import os
import sys

sys.path.insert(0, ".")

import pandas as pd

# survey column schema (reference preprocess_survey.py:4-43: raw columns
# 4..37 renamed)
SURVEY_COLUMNS = [
    "role", "areas", "uses", "satisfaction", "cloud_budget",
    "desktop_gen", "desktop_mem",
    "desktop_1", "desktop_2", "desktop_4", "desktop_8", "desktop_16", "desktop_32", "desktop_64",
    "workstation_gen", "workstation_mem",
    "workstation_1", "workstation_2", "workstation_4", "workstation_8",
    "workstation_16", "workstation_32", "workstation_64",
    "data_center_gen", "data_center_mem",
    "data_center_1", "data_center_2", "data_center_4", "data_center_8",
    "data_center_16", "data_center_32", "data_center_64",
    "gpu_link", "node_link",
]
TIERS = ("desktop", "workstation", "data_center")
_INVALID_GEN = {"", "Not", "None"}


def preprocess_survey(raw_csv: str, out_csv: str) -> pd.DataFrame:
    """Column window 4..37 of the raw export, renamed to the schema."""
    raw = pd.read_csv(raw_csv)
    df = raw.iloc[:, 4:38].copy()
    df.columns = SURVEY_COLUMNS
    df.to_csv(out_csv, index=False)
    return df


def exploded_counts(series: pd.Series, min_count: int = 0) -> pd.Series:
    """Comma-separated multi-select answers -> per-option respondent counts
    (the notebook's split/explode/count pattern)."""
    counts = series.dropna().astype(str).str.split(", ").explode().value_counts()
    return counts[counts > min_count]


def generation_counts(df: pd.DataFrame, tier: str) -> pd.Series:
    """First word of each listed accelerator generation, invalids dropped."""
    gens = (
        df[f"{tier}_gen"].dropna().astype(str).str.split(", ").explode().str.split(" ").str[0]
    )
    return gens[~gens.isin(_INVALID_GEN)].value_counts()


def availability_table(df: pd.DataFrame) -> pd.DataFrame:
    """Respondents per (tier, accelerator count) -- the per-tier count grid
    the notebook renders as one chart per tier."""
    rows = {}
    for tier in TIERS:
        rows[tier] = {
            n: int(df[f"{tier}_{n}"].notna().sum()) for n in (1, 2, 4, 8, 16, 32, 64)
        }
    return pd.DataFrame(rows).T


def survey_plots(df: pd.DataFrame, out_dir: str) -> list[str]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    written = []

    def bar(series: pd.Series, title: str, fname: str):
        fig, ax = plt.subplots(figsize=(6, 4))
        series.plot.bar(ax=ax)
        ax.set_title(title)
        ax.set_ylabel("Respondents")
        fig.tight_layout()
        path = os.path.join(out_dir, fname)
        fig.savefig(path)
        plt.close(fig)
        written.append(path)

    bar(exploded_counts(df["role"], 1), "Respondents by Role", "role.png")
    bar(exploded_counts(df["areas"], 2), "Research Areas", "areas.png")
    bar(exploded_counts(df["uses"], 2), "Compute Uses", "uses.png")
    bar(df["satisfaction"].value_counts().sort_index(), "Satisfaction with Available Compute", "satisfaction.png")
    bar(df["cloud_budget"].dropna().value_counts().sort_index(), "Annual Cloud Budget", "cloud_budget.png")
    for tier in TIERS:
        counts = generation_counts(df, tier)
        if len(counts):
            bar(counts, f"{tier.replace('_', ' ').title()} GPUs by Generation", f"{tier}_gen.png")

    table = availability_table(df)
    table.to_csv(os.path.join(out_dir, "availability.csv"))
    written.append(os.path.join(out_dir, "availability.csv"))
    return written


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--raw", default="artifacts/raw_survey.csv")
    p.add_argument("--out-csv", default="artifacts/survey.csv")
    p.add_argument("--out-dir", default="artifacts/plots/survey")
    a = p.parse_args()
    df = preprocess_survey(a.raw, a.out_csv)
    for path in survey_plots(df, a.out_dir):
        print(path)


if __name__ == "__main__":
    main()
