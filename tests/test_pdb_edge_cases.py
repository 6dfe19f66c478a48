"""Pathological-PDB robustness corpus (VERDICT r4 next #5).

~15 minimal fixtures covering the deposit-file pathologies real PDB
archives contain, each driven through the full pipeline surface:
load_pdb -> structure_to_frame_atoms -> voxelize -> make_frame_dataset,
plus predict_structure and the serve endpoint for representative cases.
Asserted semantics per case (no crashes, no silent garbage) are documented
in docs/PDB_EDGE_CASES.md. The reference leans on ampal's tolerant parsing
for the same inputs (design_utils/utils.py:33-57) but has no tests for any
of them.
"""
from __future__ import annotations

import json
import threading
import urllib.error
import urllib.request
from pathlib import Path

import numpy as np
import pytest

from timed_design_tpu.structure import load_pdb
from timed_design_tpu.voxel import (
    Codec,
    make_frame_dataset,
    structure_to_frame_atoms,
    voxelize_frame_atoms,
)

CODEC = Codec.from_string("CNOCACB")


def atom(serial, name, res, chain, seq, x, y, z, element=None,
         icode=" ", altloc=" ", record="ATOM  "):
    element = element or name[0]
    return (
        f"{record}{serial:5d} {name:<4s}{altloc}{res:<3s} {chain}{seq:4d}"
        f"{icode}   {x:8.3f}{y:8.3f}{z:8.3f}  1.00 20.00          "
        f"{element:>2s}\n"
    )


def bb(serial, res, chain, seq, offs=0.0, icode=" ",
       names=("N", "CA", "C", "O"), record="ATOM  "):
    """Four backbone atoms in a non-degenerate arrangement (frame_bases
    rejects collinear N-CA-C)."""
    out = ""
    base = {"N": (0, 0, 0), "CA": (1.5, 0, 0), "C": (2.5, 1, 0),
            "O": (3.5, 1, 1)}
    for i, n in enumerate(names):
        x, y, z = base.get(n, (i * 1.0, 0, 0))
        out += atom(serial + i, n, res, chain, seq, x + offs,
                    y + offs * 0.1, z, icode=icode, record=record)
    return out


def _write(tmp_path: Path, name: str, text: str) -> Path:
    p = tmp_path / f"{name}.pdb"
    p.write_text(text + "END\n")
    return p


def _frames(structure):
    fa = structure_to_frame_atoms(structure, CODEC)
    return np.asarray(voxelize_frame_atoms(fa, CODEC)), fa


# --------------------------------------------------------------- fixtures

def fx_icodes():
    return (bb(1, "ALA", "A", 100) + bb(5, "GLY", "A", 100, 4.0, icode="A")
            + bb(9, "SER", "A", 100, 8.0, icode="B"))


def fx_negative_resseq():
    return (bb(1, "ALA", "A", -5) + bb(5, "GLY", "A", -4, 4.0)
            + bb(9, "VAL", "A", 0, 8.0))


def fx_duplicate_resseq():
    return bb(1, "ALA", "A", 10) + bb(5, "GLY", "A", 10, 4.0)


def fx_mse_hetatm():
    return (bb(1, "ALA", "A", 1)
            + bb(5, "MSE", "A", 2, 4.0, record="HETATM")
            + bb(9, "VAL", "A", 3, 8.0))


def fx_waters_and_ligand():
    return (bb(1, "ALA", "A", 1)
            + atom(5, "O", "HOH", "A", 101, 20, 20, 20, record="HETATM")
            + atom(6, "FE", "HEM", "A", 102, 25, 20, 20, element="FE",
                   record="HETATM"))


def fx_chain_break():
    return bb(1, "ALA", "A", 1) + bb(5, "GLY", "A", 50, 4.0)


def fx_missing_ca():
    return (bb(1, "ALA", "A", 1)
            + bb(5, "GLY", "A", 2, 4.0, names=("N", "C", "O"))
            + bb(8, "VAL", "A", 3, 8.0))


def fx_missing_nc():
    return (bb(1, "ALA", "A", 1)
            + bb(5, "GLY", "A", 2, 4.0, names=("CA", "O"))
            + bb(7, "VAL", "A", 3, 8.0))


def fx_ca_only():
    return "".join(
        atom(i + 1, "CA", r, "A", i + 1, float(i * 3), 0, 0)
        for i, r in enumerate(["ALA", "GLY", "VAL", "LEU"])
    )


def fx_models_differ():
    return ("MODEL        1\n" + bb(1, "ALA", "A", 1)
            + bb(5, "GLY", "A", 2, 4.0) + "ENDMDL\n"
            + "MODEL        2\n" + bb(1, "ALA", "A", 1) + "ENDMDL\n")


def fx_many_chains():
    # 70 chains re-using the 26 letters (large biounits overflow the
    # 1-char chain column; ampal sees the same collisions)
    return "".join(
        bb(1 + 4 * i, "ALA", chr(65 + (i % 26)), i + 1, float(5 * i))
        for i in range(70)
    )


def fx_header_only():
    return "HEADER    TEST\n"


def fx_only_waters():
    return atom(1, "O", "HOH", "A", 1, 0, 0, 0, record="HETATM")


def fx_garbage_coords():
    return (bb(1, "ALA", "A", 1)
            + "ATOM      5  N   GLY A   2      xx.xxx   0.400   0.000  "
              "1.00 20.00           N\n"
            + bb(9, "VAL", "A", 3, 8.0))


def fx_uncommon_hyp():
    return (bb(1, "ALA", "A", 1) + bb(5, "HYP", "A", 2, 4.0)
            + bb(9, "VAL", "A", 3, 8.0))


# ------------------------------------------------------------------ tests

def test_insertion_codes_kept_as_distinct_residues(tmp_path):
    s = load_pdb(_write(tmp_path, "icodes", fx_icodes()))
    frames, fa = _frames(s)
    assert fa.residue_ids == ["100", "100A", "100B"]
    assert [r.res_name for r in s.residues] == ["ALA", "GLY", "SER"]
    assert frames.shape[0] == 3 and np.isfinite(frames).all()


def test_negative_resseq(tmp_path):
    s = load_pdb(_write(tmp_path, "neg", fx_negative_resseq()))
    frames, fa = _frames(s)
    assert fa.residue_ids == ["-5", "-4", "0"]
    assert frames.shape[0] == 3


def test_duplicate_resseq_merges_first_atom_wins(tmp_path):
    """Two residues sharing (chain, resseq, icode) — a deposit error — merge
    under one key; the first atom of each name wins. Documented, not a
    crash (the reference's ampal path silently does its own merge)."""
    s = load_pdb(_write(tmp_path, "dup", fx_duplicate_resseq()))
    std = [r for r in s.residues if r.is_standard_aa]
    assert len(std) == 1
    assert std[0].res_name == "ALA"  # first record's identity wins
    frames, _ = _frames(s)
    assert frames.shape[0] == 1


def test_mse_hetatm_in_chain_remaps_to_met(tmp_path):
    s = load_pdb(_write(tmp_path, "mse", fx_mse_hetatm()))
    frames, fa = _frames(s)
    assert fa.labels == ["ALA", "MET", "VAL"]  # MSE -> MET, frame kept
    assert frames.shape[0] == 3


def test_waters_and_ligands_dropped(tmp_path):
    s = load_pdb(_write(tmp_path, "wat", fx_waters_and_ligand()))
    frames, fa = _frames(s)
    assert fa.labels == ["ALA"]
    assert frames.shape[0] == 1


def test_chain_break_keeps_both_sides(tmp_path):
    s = load_pdb(_write(tmp_path, "brk", fx_chain_break()))
    frames, fa = _frames(s)
    assert fa.residue_ids == ["1", "50"]
    assert frames.shape[0] == 2


@pytest.mark.parametrize("fx,name", [(fx_missing_ca, "mca"),
                                     (fx_missing_nc, "mnc")])
def test_incomplete_backbone_skipped_with_warning(tmp_path, fx, name):
    """A residue missing backbone atoms cannot define a frame: it is
    skipped with a warning naming it (no NaN frames, no crash), and the
    emitted dataset rows match the surviving frames."""
    p = _write(tmp_path, name, fx())
    s = load_pdb(p)
    assert len([r for r in s.residues if r.is_standard_aa]) == 3
    with pytest.warns(UserWarning, match="incomplete backbone"):
        frames, fa = _frames(s)
    assert frames.shape[0] == 2
    assert fa.residue_ids == ["1", "3"]
    out = make_frame_dataset([p], tmp_path / f"{name}.hdf5",
                             codec="CNOCACB", layout="flat")
    import h5py

    with h5py.File(out) as f:
        assert f["frames"].shape[0] == 2


def test_ca_only_model_yields_zero_frames_not_crash(tmp_path):
    p = _write(tmp_path, "caonly", fx_ca_only())
    s = load_pdb(p)
    with pytest.warns(UserWarning, match="incomplete backbone"):
        frames, fa = _frames(s)
    assert frames.shape[0] == 0
    out = make_frame_dataset([p], tmp_path / "caonly.hdf5",
                             codec="CNOCACB", layout="flat")
    import h5py

    with h5py.File(out) as f:
        assert f["frames"].shape[0] == 0


def test_multi_model_differing_residues_aligned(tmp_path):
    """NMR states with different residue sets: single-state load uses
    MODEL 1; all-states voxelization aligns every state on the common
    residues (warning) so consensus rows stay positionally meaningful."""
    p = _write(tmp_path, "mm", fx_models_differ())
    states = load_pdb(p, all_states=True)
    assert [len([r for r in st.residues if r.is_standard_aa])
            for st in states] == [2, 1]
    with pytest.warns(UserWarning, match="aligning 2 NMR states"):
        out = make_frame_dataset([p], tmp_path / "mm.hdf5", codec="CNOCACB",
                                 layout="flat", voxelise_all_states=True)
    import h5py

    with h5py.File(out) as f:
        # 2 states x 1 common residue
        assert f["frames"].shape[0] == 2


def test_many_chains_reused_ids(tmp_path):
    s = load_pdb(_write(tmp_path, "many", fx_many_chains()))
    frames, fa = _frames(s)
    assert frames.shape[0] == 70
    assert len(set(fa.chain_ids)) == 26  # ids collide; residues all kept


def test_header_only_clean_error(tmp_path):
    p = _write(tmp_path, "hdr", fx_header_only())
    with pytest.raises(ValueError, match="No ATOM records"):
        load_pdb(p)


def test_only_waters_zero_frames(tmp_path):
    s = load_pdb(_write(tmp_path, "ow", fx_only_waters()))
    frames, fa = _frames(s)
    assert frames.shape[0] == 0


def test_garbage_coordinate_line_skipped(tmp_path):
    s = load_pdb(_write(tmp_path, "garb", fx_garbage_coords()))
    frames, fa = _frames(s)
    # the unparseable record is dropped; its residue (with no other atoms)
    # disappears rather than poisoning the arrays with NaN
    assert fa.labels == ["ALA", "VAL"]
    assert frames.shape[0] == 2 and np.isfinite(frames).all()


def test_uncommon_residue_remapped(tmp_path):
    s = load_pdb(_write(tmp_path, "hyp", fx_uncommon_hyp()))
    frames, fa = _frames(s)
    assert fa.labels == ["ALA", "PRO", "VAL"]  # HYP -> PRO


def test_predict_structure_on_pathological_inputs(tmp_path):
    """Representative fixtures through the full predict_structure pipeline
    (one shared compiled Predictor): probabilities only for residues with
    valid frames, rows normalized, no NaNs."""
    from timed_design_tpu.engine import predict_structure

    cases = {
        "icodes": (fx_icodes(), 3),
        "mse": (fx_mse_hetatm(), 3),
        "mca": (fx_missing_ca(), 2),
        "many": (fx_many_chains(), 70),
    }
    for name, (text, n_expected) in cases.items():
        p = _write(tmp_path, name, text)
        import warnings as w

        with w.catch_warnings():
            w.simplefilter("ignore")
            probs, fa = predict_structure(
                p, "TIMED", batch_size=32, allow_random_weights=True
            )
        probs = np.asarray(probs)
        assert probs.shape == (n_expected, 20), name
        assert np.isfinite(probs).all(), name
        np.testing.assert_allclose(probs.sum(axis=1), 1.0, atol=1e-4)


@pytest.fixture(scope="module")
def edge_server_url(tmp_path_factory):
    import jax

    from timed_design_tpu.cli.serve import make_server
    from timed_design_tpu.engine import DesignSession
    from timed_design_tpu.engine.coalescer import CoalescingDesigner
    from timed_design_tpu.models import timed

    module = timed(filters=(8,))
    variables = module.init(
        jax.random.key(0), np.zeros((1, 21, 21, 21, 5), np.float32)
    )
    session = DesignSession((module, variables), codec="CNOCACB",
                            batch_size=16, compute_dtype="float32")
    designer = CoalescingDesigner(session)
    server = make_server(designer, "127.0.0.1", 0, "TIMED")
    port = server.server_address[1]
    th = threading.Thread(target=server.serve_forever, daemon=True)
    th.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()
    designer.close()


def _post(url, data: bytes):
    req = urllib.request.Request(url, data=data, method="POST")
    try:
        with urllib.request.urlopen(req, timeout=300) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_serve_pathological_pdbs(edge_server_url):
    """The service must answer every corpus member: designs for whatever
    frames survive, a clean 4xx for inputs with nothing to design."""
    # valid-but-odd inputs: designs come back for surviving residues
    for text, n_expected in ((fx_icodes(), 3), (fx_mse_hetatm(), 3),
                             (fx_missing_ca(), 2)):
        status, body = _post(edge_server_url + "/design",
                             (text + "END\n").encode())
        assert status == 200, body
        assert len(body["sequence"]) == n_expected
    # header-only: unparseable -> 422, named error
    status, body = _post(edge_server_url + "/design",
                         (fx_header_only() + "END\n").encode())
    assert status == 422
    # CA-only: parses but yields zero frames -> a clean non-200 or an
    # empty design, never a 500
    status, body = _post(edge_server_url + "/design",
                         (fx_ca_only() + "END\n").encode())
    assert status in (200, 400, 422), body
    if status == 200:
        assert body["sequence"] == ""
