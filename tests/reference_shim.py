"""Shared machinery for executing the reference tree as an oracle.

The reference at /root/reference depends on ampal/aposteriori/logomaker,
which are not installable in this image. Its *logic*, however, only needs
the amino-acid tables those libraries provide — unambiguous public
constants that our own ``timed_design_tpu.constants`` reproduces (and that
the oracle tests independently anchor, e.g. the 338-codec reduction guide
against the literal from the reference's github issue #7). This module
builds those table shims once so that both the function-level oracle suite
(tests/test_reference_oracle.py) and the composed end-to-end pipeline
oracle (tests/test_reference_pipeline_e2e.py) import the reference's OWN
modules and run them side by side with ours.

Nothing here copies reference code — it loads the reference's modules from
/root/reference and executes them as the ground truth.
"""
from __future__ import annotations

import contextlib
import sys
import types
from pathlib import Path

REFERENCE = Path("/root/reference")


def reference_available() -> bool:
    return (REFERENCE / "design_utils" / "utils.py").exists()


def build_table_shims() -> dict[str, types.ModuleType]:
    """Fake ampal/aposteriori/logomaker modules backed by our constants.

    The shimmed surface is exactly what ``design_utils.{utils,
    sampling_utils, analyse_utils}`` touch at import time (reference
    utils.py:10-19, analyse_utils.py:15-34).
    """
    from timed_design_tpu.constants import (
        AA1,
        AA3,
        CHI_COUNTS,
        POLARITY_ZIMMERMAN,
        RESIDUE_CHARGE,
        UNCOMMON_RESIDUE_DICT,
    )

    ampal = types.ModuleType("ampal")
    # attributes touched at module import time (type annotations evaluated
    # eagerly in the reference's function signatures)
    ampal.Assembly = type("Assembly", (), {})
    ampal.AmpalContainer = type("AmpalContainer", (), {})
    ampal.Polypeptide = type("Polypeptide", (), {})
    ampal.Polymer = type("Polymer", (), {})
    ampal.load_pdb = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("ampal not available in tests")
    )
    aa_mod = types.ModuleType("ampal.amino_acids")
    aa_mod.standard_amino_acids = dict(zip(AA1, AA3))
    aa_mod.side_chain_dihedrals = {
        res: [f"chi{i}" for i in range(CHI_COUNTS[res])]
        for res in AA3
        if CHI_COUNTS[res] > 0
    }
    aa_mod.polarity_Zimmerman = dict(POLARITY_ZIMMERMAN)
    aa_mod.residue_charge = dict(RESIDUE_CHARGE)
    ampal.amino_acids = aa_mod

    apost = types.ModuleType("aposteriori")
    apost_cfg = types.ModuleType("aposteriori.config")
    apost_cfg.MAKE_FRAME_DATASET_VER = "2.0.0"
    apost_cfg.UNCOMMON_RESIDUE_DICT = dict(UNCOMMON_RESIDUE_DICT)
    apost_dp = types.ModuleType("aposteriori.data_prep")
    apost_cf = types.ModuleType("aposteriori.data_prep.create_frame_data_set")
    apost_cf.DatasetMetadata = type("DatasetMetadata", (), {})
    apost_cf._fetch_pdb = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("no network in tests")
    )
    apost.config = apost_cfg
    apost.data_prep = apost_dp
    apost_dp.create_frame_data_set = apost_cf

    # the REAL analyse_utils imports ampal.analyse_protein sequence metrics
    # (shimmed with our implementations — those four are separately
    # parity-anchored by tests/test_sampling.py's invariants) and logomaker
    # (plot library, shimmed inert: no oracle test exercises logos)
    ap_mod = types.ModuleType("ampal.analyse_protein")
    from timed_design_tpu.sample.metrics import (
        sequence_charge,
        sequence_isoelectric_point,
        sequence_molar_extinction_280,
        sequence_molecular_weight,
    )

    ap_mod.sequence_charge = sequence_charge
    ap_mod.sequence_isoelectric_point = sequence_isoelectric_point
    ap_mod.sequence_molar_extinction_280 = sequence_molar_extinction_280
    ap_mod.sequence_molecular_weight = sequence_molecular_weight
    ampal.analyse_protein = ap_mod
    logomaker = types.ModuleType("logomaker")
    logomaker.Logo = type("Logo", (), {"__init__": lambda self, *a, **k: None})

    return {
        "ampal": ampal,
        "ampal.amino_acids": aa_mod,
        "ampal.analyse_protein": ap_mod,
        "aposteriori": apost,
        "aposteriori.config": apost_cfg,
        "aposteriori.data_prep": apost_dp,
        "aposteriori.data_prep.create_frame_data_set": apost_cf,
        "logomaker": logomaker,
    }


def build_structural_ampal() -> dict[str, types.ModuleType]:
    """Table shims + a STRUCTURAL fake ampal backed by our structure layer.

    The composed `analyse_rotamers` pipeline (reference analyse_rotamers.py:
    19-139) needs more than tables: `_tag_pdb_with_rot` loads PDBs and tags
    side-chain dihedrals, `pack_side_chains_scwrl` renders `assembly.pdb`
    and re-parses SCWRL output, and the new-datasetmap branch reads
    `assembly[chain].sequence`. This builds that surface on top of OUR
    parser/tagger (structure/pdb.py, structure/geometry.py), following the
    conventions frozen in docs/AMPAL_SPEC.md — so, as with the sampler's
    PRNG seam, the TAGGING seam is bridged by the spec (provenance closes
    via scripts/ampal_parity.py on any host with real ampal), while the
    reference's own composition code runs unmodified around it.

    AMPAL_SPEC conventions implemented here:
      * zero-chi residues (ALA/GLY): ``tags['rotamers'] = [0]`` so the
        reference's key ``f"{mol_code}_0"`` matches its codec category
        (utils.py:452-461);
      * any missing side-chain atom: ``tags['rotamers'] = None`` so the
        reference's ``''.join(map(str, None))`` raises TypeError -> NaN
        (analyse_utils.py:921-928);
      * otherwise the chi bins from our tagger ({1,2,3} over edges
        0/120/240 — AMPAL_SPEC §2).
    """
    shims = build_table_shims()
    ampal = shims["ampal"]

    from timed_design_tpu.constants import AA3_TO_AA1, CHI_COUNTS
    from timed_design_tpu.structure.geometry import tag_chi_angles
    from timed_design_tpu.structure.pdb import load_pdb as _our_load_pdb
    from timed_design_tpu.structure.pdb import parse_pdb_string

    class _Residue:
        def __init__(self, res):
            self.mol_code = res.res_name
            self.id = res.id
            self.tags: dict = {}

    class _Polypeptide(ampal.Polypeptide):
        def __init__(self, chain_structure, chain_id):
            self._s = chain_structure
            self.id = chain_id
            self._residues = [
                _Residue(r)
                for r in chain_structure.residues
                if r.is_standard_aa
            ]

        def __iter__(self):
            return iter(self._residues)

        def __len__(self):
            return len(self._residues)

        @property
        def sequence(self):
            return "".join(
                AA3_TO_AA1.get(r.mol_code, "X") for r in self._residues
            )

        def tag_sidechain_dihedrals(self):
            for res, (angles, bins) in zip(
                self._residues, tag_chi_angles(self._s)
            ):
                if CHI_COUNTS.get(res.mol_code, 0) == 0:
                    res.tags["chi_angles"] = []
                    res.tags["rotamers"] = [0]
                elif 0 in bins:
                    res.tags["chi_angles"] = None
                    res.tags["rotamers"] = None
                else:
                    res.tags["chi_angles"] = list(angles)
                    res.tags["rotamers"] = list(bins)

    class _Assembly(ampal.Assembly):
        def __init__(self, structure):
            self._s = structure
            self._polys = [
                _Polypeptide(structure.select_chain(c.chain_id), c.chain_id)
                for c in structure.chains
            ]
            self.tags: dict = {}
            self.id = structure.name

        def __iter__(self):
            return iter(self._polys)

        def __len__(self):
            return len(self._polys)

        def __getitem__(self, key):
            if isinstance(key, int):
                return self._polys[key]
            for p in self._polys:
                if p.id == key:
                    return p
            raise KeyError(key)

        @property
        def backbone(self):
            return self._polys

        @property
        def pdb(self):
            return self._s.to_pdb()

    def _load_pdb(pdb, path: bool = True, **_kw):
        if path:
            s = _our_load_pdb(Path(str(pdb)))
        else:
            s = parse_pdb_string(str(pdb), name="inmem")[0]
        return _Assembly(s)

    ampal.load_pdb = _load_pdb
    ampal._FakeAssembly = _Assembly  # introspection hook for tests
    return shims


# reference modules that must be purged on exit so later imports (or other
# test modules) never see a half-shimmed tree
_REFERENCE_MODULES = (
    "design_utils",
    "design_utils.utils",
    "design_utils.sampling_utils",
    "design_utils.scwrl_utils",
    "design_utils.analyse_utils",
    "predict",
    "sample",
    "analyse_rotamers",
)


@contextlib.contextmanager
def reference_modules(extra_shims: dict | None = None, entry_modules=()):
    """Import the reference's modules under table shims.

    Yields a namespace with ``utils``, ``sampling``, ``analyse`` and any
    requested top-level entry modules (e.g. ``predict``, ``sample`` — the
    CLIs at /root/reference/predict.py, sample.py). ``extra_shims`` lets a
    caller fake further imports (e.g. a ``tensorflow`` stand-in whose
    ``load_model`` returns a deterministic toy model, so the composed
    predict pipeline runs without the device boundary).
    """
    # NEVER write bytecode into the read-only reference tree
    dont_write = sys.dont_write_bytecode
    sys.dont_write_bytecode = True
    shims = build_table_shims()
    if extra_shims:
        shims.update(extra_shims)
    saved = {k: sys.modules.get(k) for k in shims}
    sys.modules.update(shims)
    sys.path.insert(0, str(REFERENCE))
    try:
        import matplotlib

        matplotlib.use("Agg")
        import design_utils.analyse_utils as ref_analyse
        import design_utils.sampling_utils as ref_sampling
        import design_utils.utils as ref_utils

        ns = types.SimpleNamespace(
            utils=ref_utils, sampling=ref_sampling, analyse=ref_analyse
        )
        import importlib

        for name in entry_modules:
            setattr(ns, name, importlib.import_module(name))
        yield ns
    finally:
        sys.path.remove(str(REFERENCE))
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v
        for k in _REFERENCE_MODULES:
            sys.modules.pop(k, None)
        sys.dont_write_bytecode = dont_write


# ------------------------------------------------- shared oracle helpers
@contextlib.contextmanager
def np_int_alias():
    """numpy>=1.24 removed np.int (reference utils.py:369 uses it)."""
    import numpy as np

    had = hasattr(np, "int")
    np.int = int
    try:
        yield
    finally:
        if not had:
            del np.int


def make_table(seed: int, n_classes: int, k: int = 64):
    """Deterministic (k, n_classes) row-normalized probability table."""
    import numpy as np

    rng = np.random.default_rng(seed)
    t = rng.random((k, n_classes))
    t /= t.sum(1, keepdims=True)
    return t.astype(np.float32)


class TableModule:
    """Injected engine-side model: table lookup on the ID voxel
    (frame[0,0,0,0]) as a jittable module for _resolve_model's
    ``(module, variables)`` path — measures the engine, not conv FLOPs."""

    def __init__(self, table, name: str):
        import numpy as np

        self._table = np.asarray(table, np.float32)
        self.n_classes = int(self._table.shape[1])
        self.name = name

    @classmethod
    def from_seed(cls, seed: int, name: str, n_classes: int = 338,
                  k: int = 64) -> "TableModule":
        return cls(make_table(seed, n_classes, k), name)

    def apply(self, variables, x):
        import jax.numpy as jnp

        tab = jnp.asarray(self._table)
        ids = x[:, 0, 0, 0, 0].astype(jnp.int32) % tab.shape[0]
        return tab[ids]
