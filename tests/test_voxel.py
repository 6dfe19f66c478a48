"""Voxel layer: codec parsing, frame convention, voxelizer invariants."""
from pathlib import Path
import numpy as np
import pytest

from timed_design_tpu.structure import load_pdb
from timed_design_tpu.voxel import (
    CB_FRAME_OFFSET,
    Codec,
    frame_bases,
    structure_to_frame_atoms,
    voxelize_frame_atoms,
    voxelize_structure,
)


def test_codec_parsing():
    assert Codec.from_string("CNOCBCA").channels == ("C", "N", "O", "CB", "CA")
    assert Codec.from_string("CNOCACB").channels == ("C", "N", "O", "CA", "CB")
    assert Codec.from_string("CNOCACBQ").channels == ("C", "N", "O", "CA", "CB", "Q")
    assert Codec.CNO().n_channels == 3
    assert Codec.CNOCACBP().property_channel == "P"
    assert Codec.CNOCACB().property_channel is None


def test_codec_atom_channels():
    c = Codec.from_string("CNOCBCA")
    assert c.atom_channel("CA", "C") == 4
    assert c.atom_channel("CB", "C") == 3
    assert c.atom_channel("C", "C") == 0
    assert c.atom_channel("N", "N") == 1
    assert c.atom_channel("O", "O") == 2
    cno = Codec.CNO()
    assert cno.atom_channel("CA", "C") == 0  # folds into element channel
    assert cno.atom_channel("SG", "S") == -1  # dropped


def test_frame_convention_matches_reference_cb_offset(ubq_pdb_gz):
    """The empirical check that identified the frame basis convention.

    Real CB positions, expressed in each residue's frame, must cluster
    tightly around the reference's documented imputed-CB offset
    (utils.py:247) — the 1QYS average. Tight std proves the azimuth is
    pinned correctly; a wrong convention smears the cloud azimuthally.
    """
    s = load_pdb(ubq_pdb_gz)
    bb = s.backbone_arrays()
    M, valid = frame_bases(bb)
    cbs = []
    for i, res in enumerate([r for r in s.residues if r.is_standard_aa]):
        cb = res.atom("CB")
        if cb is None or not valid[i]:
            continue
        cbs.append(M[i] @ (cb.astype(np.float64) - bb["CA"][i]))
    cbs = np.array(cbs)
    mean, std = cbs.mean(0), cbs.std(0)
    assert np.linalg.norm(mean - CB_FRAME_OFFSET) < 0.1
    assert (std < 0.15).all()


def test_frame_atoms_1ubq(ubq_pdb_gz):
    s = load_pdb(ubq_pdb_gz)
    codec = Codec.from_string("CNOCBCA")
    fa = structure_to_frame_atoms(s, codec)
    # 76 residues x (N, CA, C, O) + 76 imputed CBs
    assert fa.atoms_xyz.shape == (76 * 5, 3)
    assert fa.ca.shape == (76, 3)
    assert fa.rot.shape == (76, 3, 3)
    assert fa.valid.all()
    assert len(fa.labels) == 76
    # channel histogram: 76 atoms per channel
    counts = np.bincount(fa.atom_channel, minlength=5)
    np.testing.assert_array_equal(counts, [76] * 5)
    # rotation matrices orthogonal
    eye = np.einsum("rij,rkj->rik", fa.rot, fa.rot)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (76, 3, 3)), atol=1e-5)


def test_voxelize_gaussian_invariants(ubq_pdb_gz):
    s = load_pdb(ubq_pdb_gz)
    codec = Codec.from_string("CNOCBCA")
    frames, fa = voxelize_structure(s, codec)
    assert frames.shape == (76, 21, 21, 21, 5)
    assert frames.dtype == np.float32
    assert (frames >= 0).all()
    # Own CA sits at the center voxel: CA channel density at center ~ the
    # center voxel's share of the CA gaussian, and the own-CA total is 1.
    center = frames[:, 10, 10, 10, 4]
    assert (center > 0.05).all()
    # Total per-frame density = number of atoms fully inside the frame box
    # (each in-frame atom contributes 1 unit; boundary atoms lose clipped mass)
    totals = frames.sum(axis=(1, 2, 3, 4))
    assert (totals > 20).all()  # every frame sees its own 5 atoms + neighbors
    # Frames are distinct
    assert not np.allclose(frames[0], frames[40])


def test_voxelize_boolean_mode(ubq_pdb_gz):
    s = load_pdb(ubq_pdb_gz)
    codec = Codec.from_string("CNOCBCA")
    frames, _ = voxelize_structure(s, codec, gaussian=False)
    vals = np.unique(frames)
    assert set(vals.tolist()) <= {0.0, 1.0}
    # CA channel has exactly one voxel set at the center for the own residue
    assert (frames[:, 10, 10, 10, 4] == 1.0).all()


def test_voxelize_property_channel(ubq_pdb_gz):
    s = load_pdb(ubq_pdb_gz)
    codec = Codec.from_string("CNOCACBQ")
    frames, fa = voxelize_structure(s, codec)
    assert frames.shape == (76, 21, 21, 21, 6)
    q = frames[..., 5]
    # charge channel carries signed density: 1ubq has K/R (+) and D/E (-)
    assert q.min() < -1e-3 and q.max() > 1e-3
    # non-property channels stay non-negative
    assert (frames[..., :5] >= 0).all()


def test_voxelize_atom_conservation():
    """A single atom far from boundaries contributes exactly 1 unit."""
    import numpy as np
    from timed_design_tpu.voxel.frames import FrameAtoms
    from timed_design_tpu.voxel import voxelize_frame_atoms

    fa = FrameAtoms(
        atoms_xyz=np.array([[0.3, -0.2, 0.1]], np.float32),
        atom_channel=np.array([0], np.int32),
        atom_sigma=np.array([1.7], np.float32),
        atom_prop=np.array([0.0], np.float32),
        ca=np.zeros((1, 3), np.float32),
        rot=np.broadcast_to(np.eye(3, dtype=np.float32), (1, 3, 3)).copy(),
        valid=np.array([True]),
        labels=["ALA"], chain_ids=["A"], residue_ids=["1"],
    )
    frames = np.asarray(voxelize_frame_atoms(fa, Codec.CNO()))
    assert frames.shape == (1, 21, 21, 21, 3)
    np.testing.assert_allclose(frames.sum(), 1.0, atol=1e-5)
    # all mass in channel 0
    np.testing.assert_allclose(frames[..., 1:].sum(), 0.0, atol=1e-7)


def test_make_frame_dataset_roundtrip(tmp_path, ubq_pdb_gz):
    import h5py
    from timed_design_tpu.voxel import make_frame_dataset

    out = make_frame_dataset([ubq_pdb_gz], tmp_path / "data.hdf5", codec="CNOCBCA")
    with h5py.File(out) as f:
        assert f.attrs["voxels_as_gaussian"]
        assert tuple(f.attrs["frame_dims"]) == (21, 21, 21, 5)
        assert list(f.attrs["atom_encoder"]) == ["C", "N", "O", "CB", "CA"]
        pdb = list(f.keys())[0]
        assert pdb == "1ubq"
        chain = f[pdb]["A"]
        assert len(chain) == 76
        d = chain["1"]
        assert d.shape == (21, 21, 21, 5)
        assert d.attrs["label"] == "MET"
        assert np.asarray(d.attrs["encoded_residue"]).sum() == 1


def test_matmul_voxelizer_matches_scatter(ubq_pdb_gz):
    """The MXU GEMM formulation is numerically identical to the scatter
    kernel (both gaussian and boolean modes, including property channels)."""
    from timed_design_tpu.structure import load_pdb
    from timed_design_tpu.voxel import Codec, structure_to_frame_atoms, voxelize_frame_atoms

    s = load_pdb(ubq_pdb_gz)
    for codec_s in ("CNOCBCA", "CNOCACBQ"):
        codec = Codec.from_string(codec_s)
        fa = structure_to_frame_atoms(s, codec)
        for gaussian in (True, False):
            f_scatter = np.asarray(
                voxelize_frame_atoms(fa, codec, gaussian=gaussian, impl="scatter")
            )
            f_matmul = np.asarray(
                voxelize_frame_atoms(fa, codec, gaussian=gaussian, impl="matmul")
            )
            np.testing.assert_allclose(
                f_matmul, f_scatter, atol=2e-5,
                err_msg=f"codec={codec_s} gaussian={gaussian}",
            )


def test_golden_frames_regression(ubq_pdb_gz, testing_files):
    """Frozen golden frames lock the voxelizer convention (frame basis,
    gaussian spreading, normalization). Any change to the empirically
    recovered convention (see test_frame_convention_matches_reference_cb_offset)
    or the kernel math shows up here first."""
    golden = np.load(testing_files / "golden_1ubq_frames.npz")
    frames, _ = voxelize_structure(
        load_pdb(ubq_pdb_gz), Codec.from_string("CNOCBCA")
    )
    np.testing.assert_allclose(frames[0], golden["frame0"], atol=1e-4)
    np.testing.assert_allclose(frames[40], golden["frame40"], atol=1e-4)
    np.testing.assert_allclose(
        frames.sum(axis=(1, 2, 3, 4)), golden["total"], rtol=1e-4
    )


def test_property_constrained_design_flow(ubq_pdb_gz):
    """Full property-design flow: rewrite residue identities to match a
    charge map (utils.py:60-110 role), voxelize with the Q codec, and verify
    the property channel reflects the MODIFIED identities."""
    from timed_design_tpu.structure import (
        convert_seq_to_property,
        modify_structure_with_property,
    )

    codec = Codec.from_string("CNOCACBQ")
    s1 = load_pdb(ubq_pdb_gz)
    prop = np.array(convert_seq_to_property(s1.sequence1(), "charge"))
    # neutralize everything: all charges -> 0 (every D/E/K/R/H becomes ALA)
    s2 = modify_structure_with_property(load_pdb(ubq_pdb_gz), prop * 0, "charge")
    frames_orig, _ = voxelize_structure(s1, codec)
    frames_neut, _ = voxelize_structure(s2, codec)
    # original 1ubq has charged residues -> nonzero Q channel
    assert np.abs(frames_orig[..., 5]).max() > 1e-3
    # neutralized structure -> Q channel empty, other channels unchanged
    assert np.abs(frames_neut[..., 5]).max() < 1e-6
    np.testing.assert_allclose(frames_neut[..., :5], frames_orig[..., :5], atol=1e-5)


def test_atom_filters(ubq_pdb_gz):
    """aposteriori-style atom filters: backbone (default), ca, all."""
    s = load_pdb(ubq_pdb_gz)
    codec = Codec.from_string("CNOCBCA")
    fa_bb = structure_to_frame_atoms(s, codec, atom_filter="backbone")
    fa_ca = structure_to_frame_atoms(s, codec, atom_filter="ca")
    fa_all = structure_to_frame_atoms(s, codec, atom_filter="all")
    assert fa_ca.atoms_xyz.shape == (76, 3)
    assert fa_bb.atoms_xyz.shape == (76 * 5, 3)
    # full-atom: all 602 protein atoms of 1UBQ (real CBs, side chains, no H)
    assert fa_all.atoms_xyz.shape[0] > 590
    # in 'all' mode real CBs land on the CB channel
    assert (fa_all.atom_channel == 3).sum() > 60
    with pytest.raises(ValueError):
        structure_to_frame_atoms(s, codec, atom_filter="sidechain")


def test_invalid_backbone_residue_dropped():
    """A residue with an incomplete N/CA/C backbone must not become a frame
    center (it previously got an identity frame at the world origin with a
    real label); its present atoms still feed neighbours' environments."""
    import warnings

    import numpy as np

    from timed_design_tpu.structure import parse_pdb_string
    from timed_design_tpu.voxel import Codec, structure_to_frame_atoms

    def mk(resname, seq, atoms):
        return "\n".join(
            f"ATOM  {i:5d}  {an:<3s} {resname} A{seq:4d}    "
            f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00 10.00           {an[0]}"
            for i, (an, (x, y, z)) in enumerate(atoms, 1)
        )

    good = [("N", (0.0, 1.4, 0.0)), ("CA", (0.0, 0.0, 0.0)),
            ("C", (1.5, 0.0, 0.0)), ("O", (2.1, 1.0, 0.0))]
    # residue 2 is missing CA -> no frame basis
    bad = [("N", (3.0, 1.4, 0.0)), ("C", (4.5, 0.0, 0.0))]
    good2 = [(an, (x + 6.0, y, z)) for an, (x, y, z) in good]
    text = "\n".join([mk("ALA", 1, good), mk("GLY", 2, bad),
                      mk("SER", 3, good2)])
    s = parse_pdb_string(text, name="t")[0]
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        fa = structure_to_frame_atoms(s, Codec.CNOCACB())
    assert fa.labels == ["ALA", "SER"]
    assert fa.residue_ids == ["1", "3"]
    assert fa.valid.all() and fa.ca.shape == (2, 3) and fa.rot.shape == (2, 3, 3)
    assert any("incomplete backbone" in str(w.message) for w in rec)
    # the bad residue's N and C are still in the environment atom soup
    assert np.isclose(fa.atoms_xyz[:, 0], 3.0).any()


def test_property_channel_never_matches_element():
    """Element 'P' (phosphorus) must not scatter into the 'P' polarity
    property channel (codec.py atom_channel)."""
    from timed_design_tpu.voxel import Codec

    c = Codec.CNOCACBP()
    assert c.atom_channel("P", "P") == -1
    assert c.atom_channel("OG", "O") == c.channels.index("O")
    q = Codec.CNOCACBQ()
    assert q.atom_channel("P", "P") == -1


def test_flat_compression_honored(tmp_path):
    """compression=None -> layout default (tree gzip, flat none); an
    explicit True/False is honored for both layouts."""
    import h5py

    from timed_design_tpu.voxel import make_frame_dataset

    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    p1 = make_frame_dataset([src], tmp_path / "flat_default.hdf5",
                            layout="flat")
    p2 = make_frame_dataset([src], tmp_path / "flat_gz.hdf5",
                            layout="flat", compression=True)
    p3 = make_frame_dataset([src], tmp_path / "tree_none.hdf5",
                            compression=False)
    with h5py.File(p1) as f:
        assert f["frames"].compression is None
    with h5py.File(p2) as f:
        assert f["frames"].compression == "gzip"
    with h5py.File(p3) as f:
        g = f["1ubq"]
        ch = g[list(g.keys())[0]]
        assert ch[list(ch.keys())[0]].compression is None


def test_gaussian_convention_insensitivity():
    """Pin the sensitivity bound from scripts/gaussian_sensitivity.py
    (docs/VOXELIZER_SPEC.md §4): the [RECONSTRUCTED] integral-vs-pdf
    spreading ambiguity moves frame densities < 2e-3 and does NOT change
    any argmax prediction of a model run on either convention. If a
    voxelizer change breaks this bound, the convention risk is no longer
    formally bounded and the spec's claim must be re-measured."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from timed_design_tpu.models import timed
    from timed_design_tpu.structure import load_pdb
    from timed_design_tpu.voxel import (
        Codec,
        structure_to_frame_atoms,
        voxelize_frame_atoms,
    )

    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    codec = Codec.from_string("CNOCACB")
    fa = structure_to_frame_atoms(load_pdb(src), codec)
    fi = np.asarray(
        voxelize_frame_atoms(fa, codec, impl="scatter", spread="integral")
    )
    fp = np.asarray(
        voxelize_frame_atoms(fa, codec, impl="scatter", spread="pdf")
    )
    assert np.abs(fi - fp).max() < 2e-3  # measured 9.68e-4

    module = timed(filters=(8, 16))
    variables = jax.jit(module.init)(
        jax.random.key(3), jnp.zeros((1, 21, 21, 21, 5))
    )
    fwd = jax.jit(module.apply)
    pa = np.asarray(fwd(variables, jnp.asarray(fi)))
    pb = np.asarray(fwd(variables, jnp.asarray(fp)))
    assert (pa.argmax(1) == pb.argmax(1)).all()
    assert np.abs(pa - pb).max() < 1e-4  # measured <= 2.3e-5 across models


def test_boolean_property_clamp_is_symmetric():
    """Boolean mode with a charge codec: stacked +1 contributions saturate
    at +1 AND stacked -1 contributions saturate at -1 (an occupancy-style
    min() alone would cap only the positive side)."""
    import numpy as np

    from timed_design_tpu.voxel.frames import FrameAtoms
    from timed_design_tpu.voxel.voxelize import voxelize_frame_atoms

    # two atoms at the exact frame center, parents +1; two parents -1,
    # one residue per sign
    def fa_for(prop):
        return FrameAtoms(
            atoms_xyz=np.zeros((2, 3), np.float32),
            atom_channel=np.zeros(2, np.int32),
            atom_sigma=np.full(2, 1.7, np.float32),
            atom_prop=np.full(2, prop, np.float32),
            ca=np.zeros((1, 3), np.float32),
            rot=np.eye(3, dtype=np.float32)[None],
            valid=np.ones(1, bool),
            labels=["ALA"],
            chain_ids=["A"],
            residue_ids=["1"],
        )

    from timed_design_tpu.voxel import Codec

    codec = Codec.from_string("CQ")
    pos = np.asarray(voxelize_frame_atoms(fa_for(+1.0), codec, gaussian=False))
    neg = np.asarray(voxelize_frame_atoms(fa_for(-1.0), codec, gaussian=False))
    assert pos[..., 1].max() == 1.0
    assert neg[..., 1].min() == -1.0
    # occupancy saturates too
    assert pos[..., 0].max() == 1.0
