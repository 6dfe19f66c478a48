"""Streamlit web UI — interactive protein sequence design.

TPU-native rebuild of the reference webapp (ui.py:854-1005): upload or name a
PDB backbone, pick a model (TIMED / TIMED_Charge / TIMED_Polar / DenseCPD /
DenseNet / ProDCoNN), optionally pin polar/charged positions
(property-constrained design), then voxelize -> predict -> explore:
predicted sequence + metrics, BLOSUM62 similarity, probability heatmap,
per-position explorer, sequence logo, performance section (top-k accuracy,
bias, confusion matrix vs the native sequence), and a Monte-Carlo
optimisation tab that ranks samples by summed normalized MAE over the four
sequence metrics (reference ui.py:641-660).

Differences by design: no intermediate HDF5 — frames voxelize straight to
device memory (engine.predict_structure), and repeated designs reuse the
compiled executable via engine.DesignSession.

Run:  streamlit run timed_design_tpu/ui.py -- --path_to_models /models
"""
from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

import numpy as np

try:
    import streamlit as st
except ImportError as _e:  # pragma: no cover
    st = None
    _STREAMLIT_ERR = _e


MODELS_20 = ["TIMED", "TIMED_Deep", "DenseCPD", "DenseNet", "ProDCoNN"]
MODELS_PROP = ["TIMED_Charge", "TIMED_Polar"]


def _parse_args(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--path_to_models", type=str, default="models")
    p.add_argument("--path_to_pdb", type=str, default=None,
                   help="Optional local PDB mirror (searched for codes)")
    p.add_argument("--workers", type=int, default=8)
    return p.parse_args(argv)


def _file_digest(data: bytes) -> str:
    return hashlib.sha256(data).hexdigest()[:16]


def main(argv=None):  # noqa: C901 - UI flow
    if st is None:
        raise SystemExit(
            f"streamlit is required for the UI ({_STREAMLIT_ERR}). "
            "Install streamlit, or use the CLI: python -m timed_design_tpu.cli.predict"
        )
    args = _parse_args(argv or sys.argv[1:])
    models_dir = Path(args.path_to_models)

    from .constants import sequence_similarity
    from .models import get_model_spec
    from .sample.metrics import sequence_metrics
    from .sample.sampler import apply_temperature, sample_structure
    from .structure import (
        convert_seq_to_property,
        create_residue_map,
        load_pdb,
        modify_structure_with_property,
        parse_pdb_string,
    )
    from .analyse import calculate_metrics, create_sequence_logo
    from .analyse.structure_analysis import calculate_prediction_entropy

    st.set_page_config(page_title="TIMED-Design (TPU)", layout="wide")
    st.title("TIMED-Design — TPU-native protein sequence design")

    # ------------------------------------------------------------- sidebar
    with st.sidebar:
        st.header("Input")
        uploaded = st.file_uploader("Upload backbone PDB", type=["pdb", "pdb1", "ent", "gz"])
        pdb_code = st.text_input("...or PDB code (needs --path_to_pdb mirror)")
        model_name = st.selectbox("Model", MODELS_20 + MODELS_PROP)
        use_h5 = st.checkbox("Load released .h5 weights from models dir", value=False)
        st.header("Monte Carlo")
        do_mc = st.checkbox("Optimise with MC sampling", value=False)
        sample_n = st.number_input("Samples", 10, 5000, 200)
        temperature = st.slider("Temperature", 0.01, 5.0, 0.2)
        run = st.button("Design!", type="primary")

    if not run:
        st.info("Upload a backbone (or give a PDB code) and press Design!")
        return

    # --------------------------------------------------------- load structure
    if uploaded is not None:
        data = uploaded.read()
        if uploaded.name.endswith(".gz"):
            import gzip

            data = gzip.decompress(data)
        structure = parse_pdb_string(data.decode(), name=uploaded.name.split(".")[0])[0]
    elif pdb_code and args.path_to_pdb:
        base = Path(args.path_to_pdb)
        hits = list(base.glob(f"**/{pdb_code.lower()}*.pdb*"))
        if not hits:
            st.error(f"No structure for code {pdb_code} under {base}")
            return
        structure = load_pdb(hits[0])
    else:
        st.error("Provide a PDB upload or a code + --path_to_pdb")
        return

    residue_map, native_seq = create_residue_map(structure)
    spec = get_model_spec(model_name)

    # ------------------------------------------- property-constrained design
    if model_name in MODELS_PROP:
        prop = "charge" if model_name == "TIMED_Charge" else "polarity"
        current = convert_seq_to_property(native_seq, prop)
        st.subheader(f"Constrain {prop}")
        if prop == "charge":
            pos_sel = st.multiselect("Positive (+1) residues", residue_map,
                                     [r for r, v in zip(residue_map, current) if v == 1])
            neg_sel = st.multiselect("Negative (-1) residues", residue_map,
                                     [r for r, v in zip(residue_map, current) if v == -1])
            prop_map = np.zeros(len(residue_map), int)
            prop_map[[residue_map.index(r) for r in pos_sel]] = 1
            prop_map[[residue_map.index(r) for r in neg_sel]] = -1
        else:
            pol_sel = st.multiselect("Polar residues", residue_map,
                                     [r for r, v in zip(residue_map, current) if v == 1])
            prop_map = np.zeros(len(residue_map), int)
            prop_map[[residue_map.index(r) for r in pol_sel]] = 1
        structure = modify_structure_with_property(structure, prop_map, prop)

    # ---------------------------------------------------------- predict
    model_arg: object = model_name
    if use_h5:
        h5 = models_dir / f"{model_name}.h5"
        if h5.exists():
            model_arg = str(h5)
        else:
            st.warning(f"{h5} not found; using randomly initialized {model_name}")
    import time

    from .engine import DesignSession

    session_key = f"session::{model_arg}"
    if session_key not in st.session_state:
        st.session_state[session_key] = DesignSession(model_arg, codec=spec.codec)
    t0 = time.perf_counter()
    probs, fa = st.session_state[session_key].design(structure)
    t_pred = time.perf_counter() - t0
    rotamer = probs.shape[1] == 338
    if rotamer:
        from .constants import compress_rotamer_probs

        probs20 = compress_rotamer_probs(probs)
    else:
        probs20 = probs
    from .constants import AA1

    designed_seq = "".join(np.array(list(AA1))[probs20.argmax(1)])
    timings = st.session_state[session_key].last_timings
    st.success(
        f"Designed {len(designed_seq)} residues in {t_pred:.2f}s "
        f"(voxelisation {timings['voxelisation']:.2f}s, "
        f"prediction {timings['prediction']:.2f}s)"
    )

    # 3D structure view: py3Dmol when installed, CA-trace fallback otherwise
    with st.expander("3D structure", expanded=False):
        try:
            import py3Dmol

            view = py3Dmol.view(width=700, height=450)
            view.addModel(structure.to_pdb(), "pdb")
            view.setStyle({"cartoon": {"color": "spectrum"}})
            view.zoomTo()
            st.components.v1.html(view._make_html(), height=470)
        except ImportError:
            import matplotlib.pyplot as plt

            ca = structure.backbone_arrays()["CA"]
            fig, axes = plt.subplots(1, 3, figsize=(12, 4))
            for ax, (i, j, lbl) in zip(
                axes, [(0, 1, "xy"), (0, 2, "xz"), (1, 2, "yz")]
            ):
                ax.plot(ca[:, i], ca[:, j], "-o", markersize=2, linewidth=1)
                ax.set_title(f"CA trace ({lbl})")
                ax.set_aspect("equal")
            st.pyplot(fig)

    # ---------------------------------------------------------- outputs
    tab_out, tab_perf, tab_opt = st.tabs(["Design", "Performance", "Optimisation"])
    with tab_out:
        st.code(designed_seq, language=None)
        c, pi, mw, ext = sequence_metrics(designed_seq)
        cols = st.columns(5)
        cols[0].metric("Charge @pH7.4", f"{c:.2f}")
        cols[1].metric("Isoelectric pt", f"{pi:.2f}")
        cols[2].metric("MW (Da)", f"{mw:.0f}")
        cols[3].metric("ε280", f"{ext:.0f}")
        cols[4].metric("BLOSUM62 similarity",
                       f"{100 * sequence_similarity(native_seq, designed_seq):.1f}%")
        st.subheader("Probability heatmap")
        st.line_chart(calculate_prediction_entropy(probs20))
        st.dataframe(
            {"position": residue_map, "native": list(native_seq),
             "designed": list(designed_seq),
             "p(designed)": probs20.max(1).round(3)},
        )
        st.subheader("Sequence logo")
        st.pyplot(create_sequence_logo(probs20))
        st.download_button("Download probabilities CSV",
                           "\n".join(",".join(f"{v:.6f}" for v in row) for row in probs),
                           file_name=f"{model_name}.csv")
    with tab_perf:
        m = calculate_metrics({"design": designed_seq}, {"design": native_seq})
        st.write({k: v for k, v in m.items()
                  if k.startswith("accuracy") or k in ("precision", "recall")})
        st.subheader("Prediction bias")
        st.bar_chart(m["bias"])
        st.subheader("Confusion matrix (design vs native)")
        import matplotlib.pyplot as plt

        from .constants import AA1 as _AA1

        fig_cm, ax_cm = plt.subplots(figsize=(7, 6))
        im = ax_cm.imshow(m["unweighted_cm"], cmap="viridis", aspect="auto")
        ax_cm.set_xticks(range(20), list(_AA1))
        ax_cm.set_yticks(range(20), list(_AA1))
        ax_cm.set_xlabel("Designed")
        ax_cm.set_ylabel("Native")
        fig_cm.colorbar(im)
        st.pyplot(fig_cm)
    with tab_opt:
        if do_mc:
            import jax

            p = apply_temperature(probs, float(temperature))
            samples = sample_structure(np.asarray(p), int(sample_n),
                                       jax.random.key(0), rotamer_mode=rotamer)
            ref = np.array(sequence_metrics(native_seq))
            rows = []
            for seq, ch, ip, mw_, ex in samples:
                vals = np.array([ch, ip, mw_, ex])
                mae = np.abs((vals - ref) / np.where(ref == 0, 1, ref)).sum()
                rows.append((seq, ch, ip, mw_, ex, mae))
            rows.sort(key=lambda r: r[-1])
            st.write("Top samples by summed normalized metric MAE vs native:")
            st.dataframe(
                {"sequence": [r[0] for r in rows[:25]],
                 "charge": [r[1] for r in rows[:25]],
                 "pI": [r[2] for r in rows[:25]],
                 "MW": [r[3] for r in rows[:25]],
                 "MAE": [r[5] for r in rows[:25]]},
            )
        else:
            st.info("Enable 'Optimise with MC sampling' in the sidebar.")


if __name__ == "__main__":
    main()
