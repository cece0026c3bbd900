"""Structure/sequence IO: fasta, PDB round-trips, native XTC codec.

Includes decoding a real mdtraj-written XTC from the reference's test data
(`bioemu-benchmarks/tests/test_data/samples_example/`), which exercises the
full GROMACS xdr3dfcoord decoder (runs, adaptive smallidx) against a
production encoder.
"""

from pathlib import Path

import numpy as np
import pytest

from se3diff_tpu.sampling import seq_io
from se3diff_tpu.struct import xtc
from se3diff_tpu.struct.pdb import Structure, from_pdb_string, read_pdb, to_pdb
from se3diff_tpu.struct.residues import RESTYPES

DATA = Path(__file__).parent / "test_data" / "samples_example" / "multiconf_domainmotion"


class TestFasta:
    def test_roundtrip(self, tmp_path):
        f = tmp_path / "x.fasta"
        seq_io.write_fasta(["ACDEFG", "KLMNPQ"], f)
        recs = seq_io.read_fasta(f)
        assert [r.seq for r in recs] == ["ACDEFG", "KLMNPQ"]

    def test_parse_sequence_from_file_and_string(self, tmp_path):
        f = tmp_path / "x.fasta"
        seq_io.write_fasta(["ACDEFG"], f)
        assert seq_io.parse_sequence(str(f)) == "ACDEFG"
        assert seq_io.parse_sequence("ACDEFG") == "ACDEFG"

    def test_invalid_sequence_rejected(self):
        # assert-based like the reference (seq_io.py:58-61)
        with pytest.raises(AssertionError):
            seq_io.check_protein_valid("ACDEFGZ1")


class TestXTCCodec:
    def test_roundtrip_precision(self, tmp_path, rng):
        coords = rng.standard_normal((7, 123, 3)).astype(np.float32) * 3.0
        path = tmp_path / "t.xtc"
        xtc.write_xtc(str(path), coords)
        back = xtc.read_xtc(str(path))[0]
        assert back.shape == coords.shape
        # xdr3dfcoord quantizes at precision 1000 (1e-3 nm).
        np.testing.assert_allclose(back, coords, atol=1.5e-3)

    def test_decodes_real_mdtraj_file(self):
        coords = xtc.read_xtc(str(DATA / "A2RJ53_4138052e.xtc"))[0]
        assert coords.shape == (5, 2903, 3)
        struct = read_pdb(str(DATA / "A2RJ53_4138052e.pdb"))
        assert int(struct.mask.sum()) == coords.shape[1]
        # nm coordinates of a solvated-scale protein box.
        assert np.abs(coords).max() < 50.0
        # Frames are distinct conformations.
        assert np.abs(coords[0] - coords[1]).max() > 0.01

    def test_reencode_real_frames(self, tmp_path):
        coords = xtc.read_xtc(str(DATA / "A2RJ53_4138052e.xtc"))[0]
        path = tmp_path / "re.xtc"
        xtc.write_xtc(str(path), coords)
        back = xtc.read_xtc(str(path))[0]
        np.testing.assert_allclose(back, coords, atol=1.5e-3)

    def test_sample_traj_loader_on_real_pair(self):
        from se3diff_tpu.benchmarks.trajectory import load_sample_traj

        traj = load_sample_traj(
            DATA / "A2RJ53_4138052e.xtc", DATA / "A2RJ53_4138052e.pdb"
        )
        assert traj.n_frames == 5
        assert traj.n_residues > 100
        assert len(traj.sequence) == traj.n_residues


class TestModelCIF:
    """to_modelcif / from_cif_string (openfold/np/protein.py:396-533 and
    observables.py:417-432 counterparts, format implemented directly)."""

    def _example(self, rng, m=2, n=7):
        atom37 = np.zeros((m, n, 37, 3), np.float32)
        mask = np.zeros((n, 37), bool)
        mask[:, [0, 1, 2, 4]] = True
        atom37[:, :, [0, 1, 2, 4]] = rng.standard_normal((m, n, 4, 3)) * 5
        aatype = np.asarray([RESTYPES.index(c) for c in "GYDPETG"])
        resseq = np.arange(3, 3 + n, dtype=np.int32)
        bfac = np.linspace(50, 90, n).astype(np.float32)
        return Structure(atom37=atom37, mask=mask, aatype=aatype,
                         resseq=resseq, bfactor=bfac, chain_id="B")

    def test_roundtrip_multi_model(self, rng):
        from se3diff_tpu.struct.cif import from_cif_string, to_modelcif

        s = self._example(rng)
        text = to_modelcif(s)
        back = from_cif_string(text)
        assert back.num_models == s.num_models
        assert back.sequence == s.sequence
        assert back.chain_id == "B"
        np.testing.assert_array_equal(back.resseq, s.resseq)
        np.testing.assert_array_equal(back.mask, s.mask)
        np.testing.assert_allclose(
            back.atom37[:, s.mask], np.round(s.atom37[:, s.mask], 3), atol=5e-4
        )

    def test_placeholder_seq_and_model_values(self, rng):
        """Legal mmCIF placeholders ('.'/'?') in auth_seq_id and
        pdbx_PDB_model_num must fall through, not crash int()."""
        from se3diff_tpu.struct.cif import from_cif_string, to_modelcif

        s = self._example(rng, m=1)
        text = to_modelcif(s)
        # Rewrite every atom row: auth_seq_id -> '?' (parser must fall back
        # to label_seq_id) and pdbx_PDB_model_num -> '.'.
        out = []
        header = []
        in_loop = False
        for ln in text.splitlines():
            if ln.startswith("_atom_site."):
                header.append(ln.split(".", 1)[1].strip())
                out.append(ln)
                continue
            if header and ln.startswith(("ATOM", "HETATM")):
                cols = ln.split()
                if "auth_seq_id" in header:
                    cols[header.index("auth_seq_id")] = "?"
                if "pdbx_PDB_model_num" in header:
                    cols[header.index("pdbx_PDB_model_num")] = "."
                out.append(" ".join(cols))
            else:
                out.append(ln)
        back = from_cif_string("\n".join(out))
        assert back.sequence == s.sequence
        assert back.num_models == 1

    def test_modelcif_categories_present(self, rng):
        from se3diff_tpu.struct.cif import to_modelcif

        text = to_modelcif(self._example(rng))
        for cat in ("data_model", "_entry.id", "_entity_poly.", "_struct_asym.",
                    "_ma_qa_metric_global.", "_ma_model_list.", "_atom_site."):
            assert cat in text, cat
        # global pLDDT = mean of the per-residue b-factors
        line = [l for l in text.splitlines()
                if l.startswith("_ma_qa_metric_global.metric_value")][0]
        assert float(line.split()[-1]) == pytest.approx(70.0, abs=0.01)

    def test_reads_vendored_real_structure(self, tmp_path):
        from se3diff_tpu.struct.cif import read_cif, write_modelcif

        pdb_path = (Path(__file__).parent.parent / "assets" / "structures"
                    / "2vwf_trimmed_SH3.pdb")
        s = read_pdb(str(pdb_path))
        cif_path = tmp_path / "ref.cif"
        write_modelcif(s, str(cif_path))
        back = read_cif(str(cif_path))
        assert back.sequence == s.sequence
        np.testing.assert_allclose(
            back.atom37[:, s.mask], np.round(s.atom37[:, s.mask], 3), atol=5e-4
        )

    def test_observables_load_ref_accepts_cif(self, tmp_path):
        from se3diff_tpu.ppft.observables import load_ref
        from se3diff_tpu.struct.cif import write_modelcif

        pdb_path = (Path(__file__).parent.parent / "assets" / "structures"
                    / "2vwf_trimmed_SH3.pdb")
        s = read_pdb(str(pdb_path))
        cif_path = tmp_path / "ref.cif"
        write_modelcif(s, str(cif_path))
        ca_pdb = load_ref(str(pdb_path))
        ca_cif = load_ref(str(cif_path))
        np.testing.assert_allclose(ca_cif, ca_pdb, atol=1e-3)
        with pytest.raises(ValueError, match="Unsupported file format"):
            load_ref(str(tmp_path / "ref.xyz"))


class TestPDBRoundtrip:
    def test_multi_model_roundtrip(self, rng):
        n, m = 9, 3
        atom37 = np.zeros((m, n, 37, 3), np.float32)
        mask = np.zeros((n, 37), bool)
        mask[:, [0, 1, 2, 4]] = True
        atom37[:, :, [0, 1, 2, 4]] = rng.standard_normal((m, n, 4, 3)) * 5
        aatype = np.asarray([RESTYPES.index(c) for c in "GYDPETGTW"])
        resseq = np.arange(5, 5 + n, dtype=np.int32)
        s = Structure(atom37=atom37, mask=mask, aatype=aatype, resseq=resseq)
        back = from_pdb_string(to_pdb(s))
        assert back.num_models == m
        assert back.sequence == s.sequence
        np.testing.assert_array_equal(back.resseq, resseq)
        sel = mask
        np.testing.assert_allclose(
            back.atom37[:, sel], np.round(atom37[:, sel], 3), atol=5e-4
        )
