"""Prepare MEGAScale finetuning CSVs (counterpart of the reference repo's
`bioemu.ipynb`).

Pipeline (bioemu.ipynb cells 1-5):
  1. load the MEGAScale stability dataset — either from a local CSV dump
     (``--input_csv``, offline) or from the HuggingFace hub
     (``--hf_dataset``, requires the `datasets` package + network);
  2. split 80% train / 10% val / 10% test with a fixed seed;
  3. coerce ``dG_ML`` to numeric, drop non-numeric rows;
  4. add ``p_folded = sigmoid(-(-dG_ML) / kT)`` targets via
     :func:`se3diff_tpu.ppft.h_functions.compute_folded_proportion_from_dg`;
  5. write ``train.csv / val.csv / test.csv`` plus one short-sequence
     low-dG sample row per split for smoke tests.

Usage:
    python examples/prepare_megascale.py --input_csv megascale_dataset2.csv \
        --output_dir datasets/megascale

The output CSVs plug straight into ``python -m se3diff_tpu.finetune
--sequence_col aa_seq --h_stars_cols p_folded``.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEED = 42  # fixed shuffle seed; NOTE: the reference notebook splits via
# HF datasets' train_test_split, a different permutation algorithm, so
# the train/val/test membership does NOT reproduce its partition


def add_p_folded(df: pd.DataFrame, dg_col: str = "dG_ML") -> pd.DataFrame:
    """Numeric-coerce the dG column, drop NaNs, add the p_folded target."""
    import jax.numpy as jnp

    from se3diff_tpu.ppft.h_functions import compute_folded_proportion_from_dg

    df = df.copy()
    df[dg_col] = pd.to_numeric(df[dg_col], errors="coerce")
    df = df.dropna(subset=[dg_col])
    dg = jnp.asarray(-df[dg_col].to_numpy(np.float64), jnp.float32)
    df["p_folded"] = np.asarray(compute_folded_proportion_from_dg(dg))
    return df


def split_80_10_10(
    df: pd.DataFrame, seed: int = SEED
) -> tuple[pd.DataFrame, pd.DataFrame, pd.DataFrame]:
    """80/10/10 shuffled split (bioemu.ipynb cells 1-2's two-stage split)."""
    shuffled = df.sample(frac=1.0, random_state=seed).reset_index(drop=True)
    n = len(shuffled)
    n_train = int(round(n * 0.8))
    n_val = int(round(n * 0.1))
    return (
        shuffled.iloc[:n_train],
        shuffled.iloc[n_train:n_train + n_val],
        shuffled.iloc[n_train + n_val:],
    )


def pick_smoke_sample(
    df: pd.DataFrame, seq_col: str, dg_col: str, seed: int = SEED
) -> pd.DataFrame:
    """One short (<50 aa), marginally-stable (dG<1) row for smoke tests."""
    eligible = df[(df[seq_col].str.len() < 50) & (df[dg_col] < 1)]
    if eligible.empty:
        return df.head(1)
    return eligible.sample(n=1, random_state=seed)


def main(argv: list[str] | None = None) -> None:
    p = argparse.ArgumentParser(description=__doc__)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--input_csv", help="local MEGAScale CSV dump")
    src.add_argument("--hf_dataset", nargs="?", const="RosettaCommons/MegaScale",
                     help="HuggingFace dataset path (needs `datasets` + network)")
    p.add_argument("--hf_name", default="dataset2")
    p.add_argument("--output_dir", default="datasets/megascale")
    p.add_argument("--sequence_col", default="aa_seq")
    p.add_argument("--dg_col", default="dG_ML")
    p.add_argument("--seed", type=int, default=SEED)
    args = p.parse_args(argv)

    if args.input_csv:
        df = pd.read_csv(args.input_csv)
    else:
        try:
            from datasets import load_dataset
        except ImportError as e:  # hermetic environments: use --input_csv
            raise SystemExit(
                "the `datasets` package is unavailable; download the "
                "MEGAScale CSV elsewhere and pass --input_csv"
            ) from e
        df = load_dataset(
            path=args.hf_dataset, name=args.hf_name, data_dir=args.hf_name
        )["train"].to_pandas()

    train, val, test = split_80_10_10(df, seed=args.seed)
    out = args.output_dir
    os.makedirs(out, exist_ok=True)
    for name, part in [("train", train), ("val", val), ("test", test)]:
        part = add_p_folded(part, dg_col=args.dg_col)
        part.to_csv(os.path.join(out, f"{name}.csv"), index=False)
        sample = pick_smoke_sample(part, args.sequence_col, args.dg_col, args.seed)
        sample.to_csv(os.path.join(out, f"{name}_sample.csv"), index=False)
        print(f"{name}: {len(part)} rows -> {out}/{name}.csv")


if __name__ == "__main__":
    main()
