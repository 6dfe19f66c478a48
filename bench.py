"""Benchmark: TIMED inference throughput (frames/sec) on one chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference's TF/Keras CPU path — the same TIMED-scale
architecture (conv blocks 16/32/64/128 + GAP head, 296k params,
reference README.md:254) run via model.predict(batch_size=500) on this
host's CPU measured at 23.54 frames/sec (see BASELINE.md). The reference
publishes no numeric benchmarks (BASELINE.json: "published": {}), so the
operational TF path is the comparison target per BASELINE.md §"Numbers to
measure".

Methodology: batch 512, bfloat16 activations, fp32 accumulation. Every step
gets a UNIQUE input perturbation (a step-index scalar mixed into the frames)
so no execution can be cached/elided; all steps are dispatched and the wall
clock covers completion of every one (device execution is serial per chip).
This measures ~70% of v5e bf16 compute peak on the conv stack (2.56 TFLOP
per batch-512 step; TODO.md roofline) — physically consistent, unlike naive
same-input loops which measure as impossibly fast through the execution
cache.
"""
from __future__ import annotations

import functools
import json
import time

import numpy as np

TF_CPU_BASELINE_FRAMES_PER_SEC = 23.54  # measured in-image; BASELINE.md


def bench_e2e(n_frames: int = 19_968, tree_frames: int = 3_800,
              attempt: int = 0) -> list[dict]:
    """End-to-end HDF5 -> device -> artifacts throughput (--e2e mode).

    Measures `load_dataset_and_predict` — the reference's actual hot path
    including I/O (predict.py:125-142) — over a generated frame dataset in
    both storage layouts:
      * flat (this framework's row-chunked fast format),
      * tree (aposteriori schema, gzip per-residue — the interop format).
    Returns one metric dict per layout (printed by the caller AFTER the
    whole run succeeds, so a mid-run retry can't emit duplicate JSON
    lines). The compute-only number (default mode) is the ceiling; VERDICT
    r1 asked for the e2e number to be within ~2x.
    """
    metrics: list[dict] = []
    import sys
    import tempfile
    from pathlib import Path

    import h5py
    import jax
    import jax.numpy as jnp

    from timed_design_tpu.engine import load_dataset_and_predict
    from timed_design_tpu.voxel import make_frame_dataset

    ubq = Path(__file__).parent / "tests/testing_files/1ubq.pdb1.gz"
    with tempfile.TemporaryDirectory(prefix="bench_e2e") as td:
        td = Path(td)
        # XLA-level compilation cache: the warmup run below compiles the
        # batch-512 bf16 TIMED program once; the timed runs then measure
        # streaming, not compilation (each engine call builds a fresh jit
        # wrapper, so only this cache dedupes the compile).
        jax.config.update("jax_compilation_cache_dir", str(td / "xla_cache"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        base = make_frame_dataset([ubq], td / "base.hdf5", codec="CNOCACB",
                                  layout="flat")
        with h5py.File(base) as f:
            X0 = f["frames"][()]
            y0 = f["labels"][()]
            cols0 = {c: [v.decode() for v in f[c][()]]
                     for c in ("index_pdb", "index_chain", "index_residue",
                               "index_label")}
            attrs = dict(f.attrs.items())

        # Per-FRAME additive scalars keep every batch bitwise-unique even
        # after the bf16 wire cast: integers < 251 are bf16-exact, while
        # the previous per-replica multiplicative 1e-4 nudge collapses at
        # bf16 resolution (1.0001 rounds back to 1.0), leaving replicas
        # bitwise identical on device. `attempt` shifts every scalar so a
        # retried run cannot be value-cache-served by the failed attempt's
        # executions, and `_ds_offset` advances per DATASET so the warmup,
        # flat, and tree datasets never share a batch composition (a shared
        # 0-based range would let the tree run be cache-served by flat's).
        _ds_offset = [0]

        def frame_scalars(start: int, stop: int) -> np.ndarray:
            idx = (
                np.arange(start, stop) + _ds_offset[0] + attempt * 97
            ) % 251
            return idx.astype(np.float32)[:, None, None, None, None]

        def replicate_flat(dst: Path, n: int) -> Path:
            _ds_offset[0] += 101  # new residue phase for this dataset
            with h5py.File(dst, "w") as f:
                for k, v in attrs.items():
                    f.attrs[k] = v
                dims = X0.shape[1:]
                fr = f.create_dataset("frames", shape=(n, *dims),
                                      dtype=np.float32, chunks=(512, *dims))
                lb = f.create_dataset("labels", shape=(n, 20), dtype=np.int8)
                str_t = h5py.string_dtype()
                cols = {c: f.create_dataset(c, shape=(n,), dtype=str_t)
                        for c in cols0}
                for r in range(-(-n // X0.shape[0])):
                    s = r * X0.shape[0]
                    e = min(n, s + X0.shape[0])
                    m = e - s
                    # bf16-exact unique values so no caching anywhere
                    fr[s:e] = X0[:m] + frame_scalars(s, e)
                    lb[s:e] = y0[:m]
                    for c in cols:
                        cols[c][s:e] = [
                            f"{v}{r:03d}" if c == "index_pdb" else v
                            for v in cols0[c][:m]
                        ]
            return dst

        def replicate_tree(dst: Path, n: int) -> Path:
            _ds_offset[0] += 101  # new residue phase for this dataset
            with h5py.File(dst, "w") as f:
                for k, v in attrs.items():
                    if k == "layout":
                        continue
                    f.attrs[k] = v
                i = 0
                r = 0
                while i < n:
                    m = min(X0.shape[0], n - i)
                    for j in range(m):
                        d = f.create_dataset(
                            f"{cols0['index_pdb'][j]}{r:03d}/"
                            f"{cols0['index_chain'][j]}/"
                            f"{cols0['index_residue'][j]}",
                            data=X0[j] + frame_scalars(i + j, i + j + 1)[0],
                            compression="gzip",
                        )
                        d.attrs["label"] = cols0["index_label"][j]
                        d.attrs["encoded_residue"] = y0[j].astype(np.int64)
                    i += m
                    r += 1
            return dst

        for layout, path, n in (
            ("warmup", replicate_flat(td / "warm.hdf5", 512), 512),
            ("flat", replicate_flat(td / "flat.hdf5", n_frames), n_frames),
            ("tree_gzip", replicate_tree(td / "tree.hdf5", tree_frames),
             tree_frames),
        ):
            out = td / f"out_{layout}"
            out.mkdir()
            t0 = time.perf_counter()
            result = load_dataset_and_predict(
                ["TIMED"], path, batch_size=512, path_to_output=out,
                dataset_map_path=out / "datasetmap.txt",
                compute_dtype=jnp.bfloat16, allow_random_weights=True,
            )
            dt = time.perf_counter() - t0
            if layout == "warmup":  # populates the XLA compile cache
                continue
            phases = {k: round(v, 2) for k, v in result.timings.items()}
            print(f"# {layout}: phases={phases}", file=sys.stderr)
            metrics.append({
                "metric": f"e2e_hdf5_to_artifacts_frames_per_sec_{layout}",
                "value": round(n / dt, 1),
                "unit": "frames/s",
                "vs_baseline": round(
                    n / dt / TF_CPU_BASELINE_FRAMES_PER_SEC, 1
                ),
            })
    return metrics


def device_checks() -> list[dict]:
    """Re-certify the TPU-only Pallas sampler behavior every round.

    The pytest suite runs on a forced-CPU virtual mesh (tests/conftest.py),
    so tests/test_pallas_ops.py's two device-gated tests record permanent
    skips there; this folds the same assertions into the driver-captured
    bench run (VERDICT r2 weak #3). Checks: sampled frequencies match the
    distribution, draws are deterministic per seed / distinct across seeds,
    and under-mass rows map overflow draws to class 0 (the XLA/reference
    argmax semantics)."""
    import jax
    import jax.numpy as jnp

    if jax.default_backend() != "tpu":
        return []
    from timed_design_tpu.ops.pallas_sample import pallas_sample_class_indices

    p1 = np.array([[0.5, 0.3, 0.2] + [0.0] * 17], np.float32)
    idx = np.asarray(
        pallas_sample_class_indices(jnp.int32(1), jnp.asarray(p1), 200_000)
    ).ravel()
    freq = np.bincount(idx, minlength=20) / idx.size
    np.testing.assert_allclose(freq[:3], [0.5, 0.3, 0.2], atol=0.01)
    assert freq[3:].sum() == 0

    a = np.asarray(pallas_sample_class_indices(jnp.int32(5), jnp.asarray(p1), 1000))
    b = np.asarray(pallas_sample_class_indices(jnp.int32(5), jnp.asarray(p1), 1000))
    c = np.asarray(pallas_sample_class_indices(jnp.int32(6), jnp.asarray(p1), 1000))
    np.testing.assert_array_equal(a, b)
    assert (a != c).any()

    p2 = np.zeros((1, 20), np.float32)
    p2[0, 3] = 0.25
    p2[0, 7] = 0.25  # total mass 0.5: overflow draws must land on class 0
    idx = np.asarray(
        pallas_sample_class_indices(jnp.int32(11), jnp.asarray(p2), 100_000)
    ).ravel()
    assert idx.min() >= 0 and idx.max() < 20
    freq = np.bincount(idx, minlength=20) / idx.size
    np.testing.assert_allclose(freq[0], 0.5, atol=0.01)
    np.testing.assert_allclose(freq[3], 0.25, atol=0.01)
    np.testing.assert_allclose(freq[7], 0.25, atol=0.01)

    # Length-chunked grid (round 4): a multi-chain-biounit length (4096 >
    # the 1024-position length block) must stay on the fused path with
    # correct per-position distributions on BOTH sides of a block boundary,
    # and remain deterministic per seed.
    p3 = np.tile(np.array([[0.6, 0.4] + [0.0] * 18], np.float32), (4096, 1))
    long_a = np.asarray(
        pallas_sample_class_indices(jnp.int32(21), jnp.asarray(p3), 2000)
    )
    long_b = np.asarray(
        pallas_sample_class_indices(jnp.int32(21), jnp.asarray(p3), 2000)
    )
    np.testing.assert_array_equal(long_a, long_b)
    assert long_a.shape == (2000, 4096)
    for pos in (0, 1023, 1024, 4095):  # straddle the l-block boundary
        f = np.bincount(long_a[:, pos], minlength=20) / long_a.shape[0]
        np.testing.assert_allclose(f[:2], [0.6, 0.4], atol=0.04)
    # distinct streams across length blocks (no seed aliasing between them)
    assert (long_a[:, 0] != long_a[:, 1024]).any()
    return [
        {"metric": "pallas_device_checks_passed", "value": 4, "unit": "checks",
         "vs_baseline": 1.0}
    ]


def main(attempt: int = 0) -> list[dict]:
    import jax
    import jax.numpy as jnp

    from timed_design_tpu.models import timed

    # device-only Pallas certification first; the headline throughput
    # metric stays the LAST printed JSON line (the driver parses that one)
    pre_metrics = device_checks()

    # flagship: real-scale TIMED (296k params), bf16 MXU path (1.7x vs f32)
    model = timed(compute_dtype=jnp.bfloat16)
    batch = 512
    # seed the base tensor with the RETRY attempt index: a retried run
    # re-executing value-identical steps could be served by the
    # transport's execution cache built by the failed attempt — a fresh
    # base array makes every step of every attempt bitwise-new
    x = jnp.asarray(
        np.random.default_rng(attempt).random((batch, 21, 21, 21, 5)),
        jnp.bfloat16,
    )
    variables = jax.jit(model.init)(jax.random.key(0), x[:1])

    from timed_design_tpu.utils.xla_opts import tpu_compiler_options

    @functools.partial(jax.jit, compiler_options=tpu_compiler_options())
    def step(v, x, i):
        # (i % 251) is exactly representable in bf16 (integers < 256), so
        # every step's input tensor is bitwise distinct — a small *1e-6
        # perturbation would collapse to 2-3 values at bf16 resolution and
        # defeat the anti-caching methodology this file documents
        probs = model.apply(v, x + (i % 251).astype(jnp.bfloat16))
        return probs.sum() + i.astype(jnp.float32)

    float(step(variables, x, jnp.int32(0)))  # compile + true sync

    def timed_round(n: int, base: int) -> float:
        """Run n unique steps and return wall time INCLUDING a value fetch of
        the last output — on remote PJRT transports only a value fetch is a
        reliable completion barrier (block_until_ready can report eagerly)."""
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out = step(variables, x, jnp.int32(base + i + 1))
        float(out)
        return time.perf_counter() - t0

    # Round bases are chosen so the (base+i+1) % 251 residue ranges are
    # DISJOINT across rounds: warmup -> 1..5, small -> 11..30, large ->
    # 101..180. With colliding ranges (round-2 used bases 10k/20k/50k:
    # small's residues 212..231 all recur inside large's 172..250,0) up to
    # 20 of the large round's steps could be served by the transport's
    # value-keyed execution cache, deflating dt_large and inflating the
    # marginal throughput.
    timed_round(5, 0)  # warmup
    # Marginal throughput: (dt_large - dt_small) removes the constant fetch
    # RTT, leaving pure per-step device time.
    n_small, n_large = 20, 80
    dt_small = timed_round(n_small, 10)
    dt_large = timed_round(n_large, 100)
    frames_per_sec = (n_large - n_small) * batch / max(dt_large - dt_small, 1e-6)
    return pre_metrics + [
        {
            "metric": "timed_inference_frames_per_sec_per_chip",
            "value": round(frames_per_sec, 1),
            "unit": "frames/s",
            "vs_baseline": round(frames_per_sec / TF_CPU_BASELINE_FRAMES_PER_SEC, 1),
        }
    ]


def _run_with_retry(fn, attempts: int = 3) -> None:
    """The tunneled TPU transport throws transient FAILED_PRECONDITION
    errors a few times a day; a flake must not record a bench failure.
    Metrics are printed HERE, only after a fully successful run — printing
    inside fn would emit duplicate JSON lines when a retry rewinds it."""
    for attempt in range(attempts):
        try:
            for m in fn(attempt=attempt):
                print(json.dumps(m))
            return
        except Exception as e:  # noqa: BLE001 - retried, re-raised at the end
            if attempt == attempts - 1:
                raise
            import sys
            import traceback

            print(f"# bench attempt {attempt + 1} failed "
                  f"({type(e).__name__}); retrying", file=sys.stderr)
            traceback.print_exc(file=sys.stderr)
            time.sleep(10)


def _watchdog_reexec(per_attempt_s: int = 1500, attempts: int = 3) -> int:
    """Run the real bench in a child process with a hard timeout.

    The tunneled transport has congestion windows where the FIRST device op
    blocks for >25 min (a 256x256 matmul measured >1500 s on 2026-08-17);
    exceptions retry fine (_run_with_retry) but a HANG would otherwise
    stall the driver's round-end bench indefinitely. The child inherits
    stdout, and JSON lines print only after a fully successful run, so a
    killed child cannot emit partial metrics."""
    import os
    import subprocess
    import sys

    per_attempt_s = int(os.environ.get("_TD_BENCH_TIMEOUT", per_attempt_s))
    env = dict(os.environ, _TD_BENCH_INNER="1")
    for attempt in range(attempts):
        try:
            rc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *sys.argv[1:]],
                env=env, timeout=per_attempt_s,
            ).returncode
        except subprocess.TimeoutExpired:
            print(f"# bench attempt {attempt + 1} timed out after "
                  f"{per_attempt_s}s (tunnel congestion?); retrying",
                  file=sys.stderr)
            continue
        if rc == 0:
            return 0
        print(f"# bench attempt {attempt + 1} exited rc={rc}",
              file=sys.stderr)
    print("# bench FAILED: all attempts hung or errored — likely a tunnel "
          "congestion window, not a code regression; re-run when the "
          "transport recovers", file=sys.stderr)
    return 1


if __name__ == "__main__":
    import os
    import sys

    if os.environ.get("_TD_BENCH_INNER") != "1":
        sys.exit(_watchdog_reexec())
    if "--e2e" in sys.argv:
        _run_with_retry(bench_e2e)
    else:
        _run_with_retry(main)
