"""MSA/embedding provider: a3m helpers + the user-MSA colabfold path.

Mirrors the reference's mocked-subprocess strategy (its tests never invoke
the real colabfold either): `run_colabfold` is monkeypatched to a fake that
reads the query from its input file and writes the representation npy files
colabfold would produce (get_embeds.py:244-266 naming).
"""

import subprocess
from pathlib import Path

import numpy as np
import pytest

from se3diff_tpu.sampling import embeds
from se3diff_tpu.sampling.embeds import (
    PAIR_DIM,
    SINGLE_DIM,
    get_embeds,
    merge_a3ms,
    replace_query_in_a3m,
    shahexencode,
)


def _write_a3m(path: Path, query: str, hits: list[tuple[str, str]], qid="query"):
    lines = [f">{qid}\n", f"{query}\n"]
    for name, seq in hits:
        lines += [f">{name}\n", f"{seq}\n"]
    path.write_text("".join(lines))


class TestA3mHelpers:
    def test_merge_keeps_first_query_and_all_hits(self, tmp_path):
        a = tmp_path / "a.a3m"
        b = tmp_path / "b.a3m"
        _write_a3m(a, "ACDEF", [("hit1", "ACDEG"), ("hit2", "AC-EF")])
        _write_a3m(b, "ACDEF", [("hit3", "aCDEF")])
        out = tmp_path / "merged.a3m"
        merge_a3ms([a, b], out)
        lines = out.read_text().splitlines()
        assert lines[:2] == [">query", "ACDEF"]
        assert lines.count("ACDEF") == 1  # second query row dropped
        assert ">hit1" in lines and ">hit2" in lines and ">hit3" in lines
        assert len(lines) == 2 + 4 + 2

    def test_replace_query_swaps_only_line_two(self, tmp_path):
        f = tmp_path / "wt.a3m"
        _write_a3m(f, "ACDEF", [("hit1", "ACDEG")])
        replace_query_in_a3m(f, "ACDEX")
        lines = f.read_text().splitlines()
        assert lines == [">query", "ACDEX", ">hit1", "ACDEG"]

    def test_replace_query_rejects_truncated_file(self, tmp_path):
        f = tmp_path / "short.a3m"
        f.write_text(">only_header\n")
        with pytest.raises(ValueError, match="too short"):
            replace_query_in_a3m(f, "ACDEF")


def install_fake_colabfold(monkeypatch):
    """Replace run_colabfold with a fake that records calls and writes the
    npy files the real colabfold_batch would emit. Returns the call log."""
    calls = []

    def fake(input_file, res_dir, env, msa_host_url=None):
        calls.append({"input_file": str(input_file), "msa_host_url": msa_host_url})
        text = Path(input_file).read_text().splitlines()
        query = text[1]
        L = len(query)
        # Like real colabfold_batch: the output prefix comes from the fasta
        # RECORD HEADER (get_queries job name), not the input filename.
        header = text[0].lstrip(">").split()[0]
        prefix = (
            Path(input_file).stem
            if str(input_file).endswith(".a3m")
            else f"{header}__unknown_description_"
        )
        suffix = "evo_rank_001_alphafold2_model_3_seed_000.npy"
        np.save(Path(res_dir) / f"{prefix}_single_repr_{suffix}",
                np.zeros((L, SINGLE_DIM), np.float32))
        np.save(Path(res_dir) / f"{prefix}_pair_repr_{suffix}",
                np.zeros((L, L, PAIR_DIM), np.float32))
        return subprocess.CompletedProcess([], returncode=0, stdout=b"")

    monkeypatch.setattr(embeds, "run_colabfold", fake)
    return calls


@pytest.fixture
def fake_colabfold(monkeypatch):
    return install_fake_colabfold(monkeypatch)


class TestGetEmbedsWithMsaFile:
    WT = "ACDEFGHIKL"
    MUT = "ACDEFGHIKV"

    def test_user_msa_is_copied_query_swapped_and_cached(self, tmp_path, fake_colabfold):
        wt_msa = tmp_path / "wildtype.a3m"
        _write_a3m(wt_msa, self.WT, [("hit1", "ACDEFGH-KL")])
        original = wt_msa.read_text()
        cache = tmp_path / "cache"

        sf, pf = get_embeds(self.MUT, cache, backend="colabfold", msa_file=wt_msa)

        # colabfold ran on a private a3m copy with the mutant query row
        [call] = fake_colabfold
        used = Path(call["input_file"])
        assert used != wt_msa and used.suffix == ".a3m"
        assert wt_msa.read_text() == original  # user's file untouched
        # outputs land under the reference cache naming
        sha = shahexencode(self.MUT)
        assert Path(sf).name == f"{sha}_single.npy"
        assert np.load(sf).shape == (len(self.MUT), SINGLE_DIM)
        assert np.load(pf).shape == (len(self.MUT), len(self.MUT), PAIR_DIM)
        # the MSA actually used is recorded in the cache with the mutant query
        cached_a3m = cache / f"{sha}.a3m"
        assert cached_a3m.exists()
        assert cached_a3m.read_text().splitlines()[1] == self.MUT

    def test_mutants_reuse_wildtype_msa_without_server(self, tmp_path, fake_colabfold):
        wt_msa = tmp_path / "wildtype.a3m"
        _write_a3m(wt_msa, self.WT, [("hit1", "ACDEFGH-KL")])
        cache = tmp_path / "cache"

        for seq in (self.WT, self.MUT):
            get_embeds(seq, cache, backend="colabfold",
                       msa_file=wt_msa, msa_host_url="http://ignored")
        # one colabfold run per sequence, never a server query
        assert len(fake_colabfold) == 2
        assert all(c["msa_host_url"] is None for c in fake_colabfold)
        assert all(c["input_file"].endswith(".a3m") for c in fake_colabfold)

    def test_cache_hit_skips_colabfold(self, tmp_path, fake_colabfold):
        wt_msa = tmp_path / "wildtype.a3m"
        _write_a3m(wt_msa, self.WT, [("hit1", "ACDEFGH-KL")])
        cache = tmp_path / "cache"
        get_embeds(self.WT, cache, backend="colabfold", msa_file=wt_msa)
        get_embeds(self.WT, cache, backend="colabfold", msa_file=wt_msa)
        assert len(fake_colabfold) == 1

    def test_server_path_merges_per_database_a3ms(self, tmp_path, monkeypatch):
        seq = self.WT
        sha = shahexencode(seq)

        def fake(input_file, res_dir, env, msa_host_url=None):
            prefix = f"{sha}__unknown_description_"
            env_dir = Path(res_dir) / f"{prefix}_env"
            env_dir.mkdir()
            _write_a3m(env_dir / "uniref.a3m", seq, [("u1", seq)])
            _write_a3m(env_dir / "envdb.a3m", seq, [("e1", seq)])
            suffix = "evo_rank_001_alphafold2_model_3_seed_000.npy"
            np.save(Path(res_dir) / f"{prefix}_single_repr_{suffix}",
                    np.zeros((len(seq), SINGLE_DIM), np.float32))
            np.save(Path(res_dir) / f"{prefix}_pair_repr_{suffix}",
                    np.zeros((len(seq), len(seq), PAIR_DIM), np.float32))
            return subprocess.CompletedProcess([], returncode=0, stdout=b"")

        monkeypatch.setattr(embeds, "run_colabfold", fake)
        cache = tmp_path / "cache"
        get_embeds(seq, cache, backend="colabfold")
        merged = (cache / f"{sha}.a3m").read_text()
        assert merged.splitlines()[1] == seq
        assert ">u1" in merged and ">e1" in merged
        assert merged.count(f"\n{seq}\n>") >= 1  # hits kept
