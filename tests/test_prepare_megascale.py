"""MEGAScale CSV prep example (bioemu.ipynb counterpart)."""

import runpy
import sys
from pathlib import Path

import numpy as np
import pandas as pd
import pytest

EXAMPLES = Path(__file__).parent.parent / "examples"
sys.path.insert(0, str(EXAMPLES))

prepare_megascale = runpy.run_path(EXAMPLES / "prepare_megascale.py",
                                   run_name="prepare_megascale")


@pytest.fixture
def mega_csv(tmp_path):
    rng = np.random.default_rng(0)
    n = 100
    seqs = ["".join(rng.choice(list("ACDEFGHIKLMNPQRSTVWY"), size=int(l)))
            for l in rng.integers(30, 80, n)]
    dg = [str(v) for v in rng.standard_normal(n) * 2]
    dg[5] = "-"  # MEGAScale has non-numeric dG_ML rows; must be dropped
    df = pd.DataFrame({"aa_seq": seqs, "dG_ML": dg,
                       "name": [f"m{i}" for i in range(n)]})
    path = tmp_path / "mega.csv"
    df.to_csv(path, index=False)
    return path


def test_end_to_end_split_and_targets(mega_csv, tmp_path):
    out = tmp_path / "out"
    prepare_megascale["main"](
        ["--input_csv", str(mega_csv), "--output_dir", str(out)]
    )
    parts = {n: pd.read_csv(out / f"{n}.csv") for n in ("train", "val", "test")}
    # 80/10/10 split; the one non-numeric dG row is dropped
    assert len(parts["train"]) == 79
    assert len(parts["val"]) == 10 and len(parts["test"]) == 10
    names = set().union(*(set(p.name) for p in parts.values()))
    assert len(names) == 99  # disjoint and complete
    for p in parts.values():
        assert ((p.p_folded >= 0) & (p.p_folded <= 1)).all()
    # p_folded = sigmoid(dG/kT): stable (dG>0) rows are mostly folded
    tr = parts["train"]
    assert (tr.loc[tr.dG_ML > 2, "p_folded"] > 0.9).all()
    # smoke-sample rows: one short marginally-stable sequence per split
    for n in ("train", "val", "test"):
        s = pd.read_csv(out / f"{n}_sample.csv")
        assert len(s) == 1
        assert len(s.aa_seq.iloc[0]) < 50 and s.dG_ML.iloc[0] < 1


def test_split_is_seeded(mega_csv, tmp_path):
    out1, out2 = tmp_path / "a", tmp_path / "b"
    for out in (out1, out2):
        prepare_megascale["main"](
            ["--input_csv", str(mega_csv), "--output_dir", str(out)]
        )
    a = pd.read_csv(out1 / "train.csv")
    b = pd.read_csv(out2 / "train.csv")
    pd.testing.assert_frame_equal(a, b)


def test_hf_path_errors_without_datasets_package(tmp_path):
    if "datasets" in sys.modules or _importable("datasets"):
        pytest.skip("datasets package present")
    with pytest.raises(SystemExit, match="input_csv"):
        prepare_megascale["main"](["--hf_dataset", "--output_dir", str(tmp_path)])


def _importable(name):
    import importlib.util

    return importlib.util.find_spec(name) is not None
