"""Sidechain-relax subsystem with mocked external tools.

Mirrors the reference's test strategy: hpacker never runs in CI — the
subprocess is monkeypatched to emit a precomputed full-atom PDB
(`bioemu/tests/test_mdrelax.py:15-20`); OpenMM paths are availability-gated.
"""

import numpy as np
import pytest

from se3diff_tpu.relax import hpacker as hp
from se3diff_tpu.struct.pdb import Structure, read_pdb, to_pdb, write_pdb
from se3diff_tpu.struct.residues import (
    ATOM37_C,
    ATOM37_CA,
    ATOM37_CB,
    ATOM37_N,
    ATOM37_O,
    RESTYPES,
)


def _backbone_structure(n_frames: int, n_res: int, seed=0) -> Structure:
    rng = np.random.default_rng(seed)
    atom37 = np.zeros((n_frames, n_res, 37, 3), np.float32)
    mask = np.zeros((n_res, 37), bool)
    x = np.arange(n_res) * 3.8
    for k, a in enumerate([ATOM37_N, ATOM37_CA, ATOM37_C, ATOM37_O]):
        atom37[:, :, a, 0] = x + k * 0.8
        atom37[:, :, a, 1] = k * 0.5
        mask[:, a] = True
    atom37 += rng.standard_normal(atom37.shape) * 0.02
    aatype = np.asarray([RESTYPES.index("A")] * n_res)
    return Structure(atom37=atom37, mask=mask, aatype=aatype)


def _mock_hpacker(monkeypatch, add_cb=True):
    """Replace the subprocess with a fake that adds CB atoms."""

    def fake_run(pdb_in, pdb_out):
        struct = read_pdb(pdb_in)
        struct.mask[:, ATOM37_CB] = add_cb
        struct.atom37[:, :, ATOM37_CB] = struct.atom37[:, :, ATOM37_CA] + 1.0
        write_pdb(struct, pdb_out)

    monkeypatch.setattr(hp, "run_hpacker", fake_run)


class TestHPackerAdapter:
    def test_reconstruct_sidechains_mocked(self, monkeypatch):
        _mock_hpacker(monkeypatch)
        struct = _backbone_structure(3, 8)
        frames = hp.reconstruct_sidechains(struct)
        assert len(frames) == 3
        assert all(f.mask[:, ATOM37_CB].all() for f in frames)

    def test_topology_mismatch_skipped(self, monkeypatch):
        calls = {"n": 0}

        def fake_run(pdb_in, pdb_out):
            struct = read_pdb(pdb_in)
            # second frame gets a different topology (extra CB atoms)
            if calls["n"] == 1:
                struct.mask[:, ATOM37_CB] = True
                struct.atom37[:, :, ATOM37_CB] = (
                    struct.atom37[:, :, ATOM37_CA] + 1.0
                )
            calls["n"] += 1
            write_pdb(struct, pdb_out)

        monkeypatch.setattr(hp, "run_hpacker", fake_run)
        struct = _backbone_structure(3, 8)
        frames = hp.reconstruct_sidechains(struct)
        assert len(frames) == 2  # mismatching frame dropped

    def test_missing_python_raises(self, monkeypatch):
        monkeypatch.setenv("HPACKER_PYTHONBIN", "/nonexistent/python")
        with pytest.raises(FileNotFoundError, match="hpacker python"):
            hp.run_hpacker("in.pdb", "out.pdb")


class TestMDGating:
    def test_openmm_gate(self):
        from se3diff_tpu.relax import md

        try:
            import openmm  # noqa: F401

            have = True
        except ImportError:
            have = False
        if have:
            md.require_openmm()
        else:
            with pytest.raises(ImportError, match="OpenMM"):
                md.require_openmm()

    def test_protocol_enum(self):
        from se3diff_tpu.relax.md import MDProtocol

        assert MDProtocol("local_minimization") == MDProtocol.LOCAL_MINIMIZATION
        assert MDProtocol("md_equil") == MDProtocol.MD_EQUIL


class TestCLIPipeline:
    def test_sidechain_only_flow(self, monkeypatch, tmp_path):
        """Full CLI flow with mocked hpacker, no MD."""
        from se3diff_tpu import sidechain_relax as cli
        from se3diff_tpu.struct import xtc as xtcio

        _mock_hpacker(monkeypatch)
        struct = _backbone_structure(2, 8)
        top_path = tmp_path / "topology.pdb"
        write_pdb(
            Structure(
                atom37=struct.atom37[:1], mask=struct.mask, aatype=struct.aatype
            ),
            str(top_path),
        )
        coords = struct.atom37[:, struct.mask]
        xtcio.write_xtc(str(tmp_path / "samples.xtc"), coords / 10.0)

        cli.main([
            "--xtc_path", str(tmp_path / "samples.xtc"),
            "--pdb_path", str(top_path),
            "--no-md_equil",
            "--outpath", str(tmp_path),
        ])
        assert (tmp_path / "samples_sidechain_rec.pdb").exists()
        rec = xtcio.read_xtc(str(tmp_path / "samples_sidechain_rec.xtc"))[0]
        assert rec.shape[0] == 2
        assert rec.shape[1] == 8 * 5  # N, CA, C, O + CB added by mock
