"""Structure I/O: frames + torsions -> all-atom coordinates -> PDB files."""

from pmhc_tpu.io.atoms import torsion_angles_to_frames, frames_to_atom14_positions
from pmhc_tpu.io.pdb import pdb_bytes, save_pdb

__all__ = ["torsion_angles_to_frames", "frames_to_atom14_positions", "save_pdb", "pdb_bytes"]
