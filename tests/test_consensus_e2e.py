"""NMR multi-state consensus flow, end-to-end.

The reference's under-specified edge case (SURVEY §7 risk list): NMR
structures voxelize once per state (`voxelise_all_states`, README.md:84),
predictions run per state (groups named `<pdb>_<i>`), and the engine builds
a consensus by running pairwise averaging (utils.py:694-721). This test
builds a synthetic 2-state PDB, runs the whole pipeline, and checks the
consensus artifacts.
"""
import gzip
from pathlib import Path

import numpy as np
import pytest

from timed_design_tpu.engine import load_dataset_and_predict
from timed_design_tpu.structure import load_pdb
from timed_design_tpu.voxel import make_frame_dataset


@pytest.fixture(scope="module")
def nmr_pdb(tmp_path_factory):
    """Two-state PDB: 1ubq state 0 + a slightly perturbed copy as state 1."""
    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    text = gzip.open(src).read().decode()
    atom_lines = [l for l in text.splitlines() if l[:6] in ("ATOM  ", "HETATM")]

    def shift(line, dx):
        x = float(line[30:38]) + dx
        return line[:30] + f"{x:8.3f}" + line[38:]

    out = tmp_path_factory.mktemp("nmr") / "2nmr.pdb"
    with open(out, "w") as f:
        f.write("MODEL        1\n")
        f.write("\n".join(atom_lines) + "\nENDMDL\n")
        f.write("MODEL        2\n")
        f.write("\n".join(shift(l, 0.3) for l in atom_lines) + "\nENDMDL\n")
    return out


def test_all_states_parsing(nmr_pdb):
    states = load_pdb(nmr_pdb, all_states=True)
    assert len(states) == 2
    assert states[0].name == "2nmr_0" and states[1].name == "2nmr_1"
    assert states[0].n_residues == states[1].n_residues == 76
    # default load: first state only
    single = load_pdb(nmr_pdb)
    assert single.n_residues == 76


def test_states_dropping_different_residues_stay_aligned(tmp_path):
    """When one NMR state is missing a residue's backbone frame (here: the
    N atom of residue 5 deleted from state 2 only), per-state frame groups
    must stay index-aligned — the positional consensus average would
    otherwise broadcast-error or silently misalign rows. The voxelizer
    aligns all states on their common residues."""
    import warnings

    import h5py

    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    text = gzip.open(src).read().decode()
    atom_lines = [l for l in text.splitlines() if l[:6] in ("ATOM  ", "HETATM")]
    state2 = [
        l for l in atom_lines
        if not (l[12:16].strip() == "N" and int(l[22:26]) == 5)
    ]
    pdb = tmp_path / "ragged.pdb"
    with open(pdb, "w") as f:
        f.write("MODEL        1\n" + "\n".join(atom_lines) + "\nENDMDL\n")
        f.write("MODEL        2\n" + "\n".join(state2) + "\nENDMDL\n")

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        h5 = make_frame_dataset(
            [pdb], tmp_path / "ragged.hdf5", codec="CNOCACB",
            voxelise_all_states=True,
        )
    with h5py.File(h5) as f:
        keys = {}
        for state in ("ragged_0", "ragged_1"):
            keys[state] = sorted(
                (c, r) for c in f[state] for r in f[state][c]
            )
        assert len(keys["ragged_0"]) == 75  # residue 5 dropped everywhere
        assert keys["ragged_0"] == keys["ragged_1"]
        assert ("A", "5") not in keys["ragged_0"]

    # defense in depth: a mismatched stack of state matrices raises a
    # descriptive error, not a numpy broadcast error
    from timed_design_tpu.io.decode import consensus_running_average

    with pytest.raises(ValueError, match="not index-aligned"):
        consensus_running_average([np.zeros((76, 20)), np.zeros((75, 20))])


@pytest.mark.slow
def test_consensus_pipeline(tmp_path, nmr_pdb):
    h5 = make_frame_dataset(
        [nmr_pdb], tmp_path / "nmr.hdf5", codec="CNOCACB",
        voxelise_all_states=True,
    )
    import h5py

    with h5py.File(h5) as f:
        assert set(f.keys()) == {"2nmr_0", "2nmr_1"}

    result = load_dataset_and_predict(
        ["TIMED_rotamer_not_so_deep"], h5, batch_size=64, allow_random_weights=True,
        path_to_output=tmp_path, dataset_map_path=tmp_path / "datasetmap.txt",
        predict_rotamers=True, is_consensus=True,
    )
    # per-state sequences + consensus
    assert set(result.pdb_to_sequence) == {"2nmr_0A", "2nmr_1A"}
    assert set(result.pdb_to_consensus) == {"2nmr"}
    assert len(result.pdb_to_consensus["2nmr"]) == 76
    assert result.pdb_to_consensus_prob["2nmr"].shape == (76, 338)
    name = "TIMED_rotamer_not_so_deep"
    assert (tmp_path / f"{name}_consensus.fasta").exists()
    assert (tmp_path / f"{name}_consensus.txt").exists()
    consensus_txt = (tmp_path / f"{name}_consensus.txt").read_text()
    assert consensus_txt.startswith("ignore_uncommon False")
    assert "2nmr 76" in consensus_txt
