"""Engine scale proof: benchmark-scale frames through the full engine.

The reference's own benchmarks sweep multiple models over large sets
(scripts/run_benchmark_models.sh; rotamer width 338). This script builds a
synthetic flat dataset of N frames, runs `load_dataset_and_predict` with
TWO 338-head models + --ensemble (the worst-case memory shape: the round-3
engine held every model's float32 matrix plus float64 ensemble copies —
~8 GB per million frames BEFORE an np.stack doubled it), and reports
throughput and the peak host RSS of the whole process.

Usage:
  python scripts/engine_scale_bench.py --frames 200000            # real TPU
  python scripts/engine_scale_bench.py --frames 80000 --cpu --table

--table injects deterministic table-lookup models (engine model tuples) so
the run measures the ENGINE (loader, streaming writers, decode, ensemble),
not conv FLOPs — the mode the CI memory test uses on a virtual-CPU host.
Without it, two registry rotamer models run with random weights in bf16.

Prints one JSON line: frames, wall seconds, frames/s, peak RSS MB.
"""
from __future__ import annotations

import argparse
import json
import resource
import sys
import tempfile
import time
from pathlib import Path

import h5py
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def write_flat_dataset(path: Path, n_frames: int, voxels: int,
                       channels: int = 5, chunk: int = 2048) -> Path:
    """Synthetic flat-layout dataset: zero frames carrying a unique
    base-251 frame ID across three voxels (bf16-exact scalars, so every
    batch stays bitwise-unique through the bf16 wire cast — same
    cache-defeat rationale as bench.py's replicate machinery; one mod-251
    scalar alone repeats its batch composition every 251 frames at this
    scale)."""
    from timed_design_tpu.constants import AA3

    rng = np.random.default_rng(0)
    dims = (voxels, voxels, voxels, channels)
    with h5py.File(path, "w") as f:
        f.attrs["layout"] = "flat"
        f.attrs["make_frame_dataset_ver"] = "2.0.0"
        f.attrs["frame_dims"] = dims
        f.attrs["atom_encoder"] = ["C", "N", "O", "CA", "CB"][:channels]
        f.attrs["encode_cb"] = True
        f.attrs["atom_filter_fn"] = "backbone"
        f.attrs["residue_encoder"] = list(AA3)
        f.attrs["frame_edge_length"] = 21.0
        f.attrs["voxels_as_gaussian"] = True
        fr = f.create_dataset("frames", shape=(n_frames, *dims),
                              dtype=np.float32, chunks=(min(chunk, 512), *dims))
        lb = f.create_dataset("labels", shape=(n_frames, 20), dtype=np.int8)
        str_t = h5py.string_dtype()
        cols = {c: f.create_dataset(c, shape=(n_frames,), dtype=str_t)
                for c in ("index_pdb", "index_chain", "index_residue",
                          "index_label")}
        aa3 = list(AA3)
        for s in range(0, n_frames, chunk):
            e = min(n_frames, s + chunk)
            m = e - s
            block = np.zeros((m, *dims), np.float32)
            ids = np.arange(s, e)
            block[:, 0, 0, 0, 0] = ids % 251
            block[:, 0, 0, 1, 0] = (ids // 251) % 251
            block[:, 0, 0, 2, 0] = ids // (251 * 251)
            fr[s:e] = block
            lab = rng.integers(0, 20, m)
            onehot = np.zeros((m, 20), np.int8)
            onehot[np.arange(m), lab] = 1
            lb[s:e] = onehot
            # ~100 residues per synthetic structure
            cols["index_pdb"][s:e] = [f"s{(i // 100):05d}" for i in ids]
            cols["index_chain"][s:e] = ["A"] * m
            cols["index_residue"][s:e] = [str(i % 100 + 1) for i in ids]
            cols["index_label"][s:e] = [aa3[v] for v in lab]
    return path


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=200_000)
    ap.add_argument("--batch_size", type=int, default=512)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--table", action="store_true",
                    help="inject table models (engine-only measurement)")
    ap.add_argument("--voxels", type=int, default=None,
                    help="frame edge voxels (default: 21, or 9 with --table)")
    ap.add_argument("--workdir", type=str, default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    voxels = args.voxels or (9 if args.table else 21)

    from timed_design_tpu.engine import load_dataset_and_predict

    # ru_maxrss is the mm's high-water mark, and fork COPIES it: a child
    # spawned by a fat parent (a pytest process that has run hundreds of
    # tests can sit at 5-6 GB) reports the PARENT's peak as its own floor —
    # measured start-of-process ru_maxrss 5,255 MB inside the full suite vs
    # ~170 MB from a shell (2026-08-20). Reset the watermark so this
    # process measures only itself (proc(5) clear_refs code 5).
    try:
        with open("/proc/self/clear_refs", "w") as f:
            f.write("5")
    except OSError:
        pass  # non-Linux: ru_maxrss keeps platform semantics

    def _rss() -> float:
        return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024

    rss_phases = {"start": round(_rss(), 1)}

    with tempfile.TemporaryDirectory(prefix="scale_bench",
                                     dir=args.workdir) as td:
        td = Path(td)
        t0 = time.time()
        ds = write_flat_dataset(td / "scale.hdf5", args.frames, voxels)
        t_data = time.time() - t0
        rss_phases["dataset"] = round(_rss(), 1)

        if args.table:
            from tests.reference_shim import TableModule

            models = [(TableModule.from_seed(1, "ScaleA"), {}),
                      (TableModule.from_seed(2, "ScaleB"), {})]
            compute_dtype = None
        else:
            import jax.numpy as jnp

            models = ["TIMED_rotamer", "TIMED_rotamer_not_so_deep"]
            compute_dtype = jnp.bfloat16

        out = td / "out"
        out.mkdir()
        t0 = time.time()
        result = load_dataset_and_predict(
            models,
            ds,
            batch_size=args.batch_size,
            dataset_map_path=out / "datasetmap.txt",
            predict_rotamers=True,
            path_to_output=out,
            compute_dtype=compute_dtype,
            allow_random_weights=True,
            ensemble=True,
        )
        wall = time.time() - t0
        rss_phases["predict"] = round(_rss(), 1)
        n_chains = len(result.pdb_to_sequence)
        artifacts = sorted(p.name for p in out.iterdir())

    peak_rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024
    print(json.dumps({
        "metric": "engine_scale_e2e",
        "frames": args.frames,
        "models": 2,
        "ensemble": True,
        "dataset_build_s": round(t_data, 1),
        "wall_s": round(wall, 1),
        "frames_per_sec": round(args.frames / wall, 1),
        "peak_rss_mb": round(peak_rss_mb, 1),
        "rss_phases_mb": rss_phases,
        "loadavg": round(__import__("os").getloadavg()[0], 2),
        "chains": n_chains,
        "artifacts": artifacts,
        "timings": {k: round(v, 2) for k, v in result.timings.items()},
    }))


if __name__ == "__main__":
    main()
