"""Structure layer: frames->atoms, PDB IO, native XTC codec, physics filter."""

from se3diff_tpu.struct.atoms import adjust_oxygen_pos, atom37_from_frames, get_atom37_from_frames
from se3diff_tpu.struct.cif import from_cif_string, read_cif, to_modelcif, write_modelcif
from se3diff_tpu.struct.pdb import Structure, from_pdb_string, read_pdb, to_pdb, write_pdb
from se3diff_tpu.struct.physics import filter_unphysical_masks, get_physical_frame_indices
from se3diff_tpu.struct.residues import sequence_to_aatype

__all__ = [
    "Structure",
    "adjust_oxygen_pos",
    "atom37_from_frames",
    "get_atom37_from_frames",
    "from_pdb_string",
    "from_cif_string",
    "read_pdb",
    "read_cif",
    "to_pdb",
    "to_modelcif",
    "write_pdb",
    "write_modelcif",
    "filter_unphysical_masks",
    "get_physical_frame_indices",
    "sequence_to_aatype",
]
