"""Batched prediction engine: frames -> per-residue probabilities -> outputs.

TPU-native redesign of the reference's core engine `load_dataset_and_predict`
(predict.py:28-194). Differences by design:

  * one jit-compiled program per model (fixed batch shape; final batch is
    padded) instead of per-batch `model.predict` calls;
  * frames stream through a prefetching loader (io/h5frames.py) with
    host->device transfer overlapped with compute, instead of reopening the
    HDF5 file per batch (utils.py:514 — the reference's I/O bottleneck);
  * probability CSVs stream to disk per drained batch (the reference's own
    append-mode format, resume-compatible via ``start_batch``); the host
    keeps only the float16 decode matrix per model plus one float64
    running sum for ``--ensemble`` — bounded at the reference's
    million-frame benchmark scale;
  * multi-chip: the batch axis shards over a `Mesh`'s data axis (weights
    replicated) — the idiomatic replacement for the reference's absent
    multi-device path.

The emitted artifact set matches the reference byte-for-byte where formats
matter: `{model}.csv` (float16), `{model}_rot.csv` (raw 338-class, full
precision), `encoded_labels.csv`, `datasetmap.txt`, SRB `{model}.txt`,
`{model}.fasta`, `dataset.fasta`, consensus files (README.md:119-131).
"""
from __future__ import annotations

import collections
import dataclasses
import threading
import typing as t
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ..constants import ROTAMER_CATEGORIES, ROTAMER_TO_AA_ONEHOT
from ..io import (
    DatasetMap,
    FrameBatchLoader,
    create_flat_dataset_map,
    extract_sequences,
    get_pdb_keys_to_filter,
    load_datasetmap,
    save_consensus_probs,
    save_datasetmap,
    save_dict_to_fasta,
    save_srb_datasetmap,
)
from ..models import KerasH5Model, ModelSpec
from ..parallel.mesh import batch_sharding, make_mesh, replicate
from ..utils.timing import PhaseTimer


@dataclasses.dataclass
class PredictionResult:
    """Reference-shaped result bundle (predict.py:187-194)."""

    flat_dataset_map: DatasetMap
    pdb_to_sequence: dict[str, str]
    pdb_to_probability: dict[str, np.ndarray]
    pdb_to_real_sequence: dict[str, str]
    pdb_to_consensus: dict[str, str] | None
    pdb_to_consensus_prob: dict[str, np.ndarray] | None
    timings: dict[str, float] = dataclasses.field(default_factory=dict)


class Predictor:
    """Jit-compiled batched forward pass over a device mesh."""

    def __init__(
        self,
        model: t.Union[KerasH5Model, tuple],
        batch_size: int = 512,
        mesh=None,
        transfer_dtype=None,
        model_name: str | None = None,
        quantize: str | None = None,
    ):
        """``model``: a KerasH5Model, or ``(flax_module, variables)``.

        ``transfer_dtype``: host->device frame dtype. Set to ``jnp.bfloat16``
        when the model computes in bf16 — the values are identical to the
        model's own on-device input cast, but the wire carries half the
        bytes (2x e2e on transfer-bound links; this dev tunnel moves
        ~32 MB/s, so it dominates there).

        ``model_name``: registry name, used to skip the tuned compiler
        options on architectures where they measured slower (ProDCoNN).

        ``quantize``: None (production) or a ``models/quantize.py`` mode
        ('int8'/'int8-fake'/'w8') — traces the forward with quantized
        convs. Measured SLOWER than bf16 on this chip's XLA build
        (BASELINE.md "Quantized inference"); kept as a characterized
        option, not a default.
        """
        self.mesh = mesh if mesh is not None else make_mesh()
        n_data = self.mesh.shape["data"]
        # round batch up so it splits evenly across the data axis
        self.batch_size = -(-batch_size // n_data) * n_data
        self._transfer_dtype = transfer_dtype
        self.quantize = quantize

        if isinstance(model, KerasH5Model):
            fn = model.apply
            params = model.weights
            self.n_classes = model.n_classes
        else:
            module, params = model
            fn = lambda v, x: module.apply(v, x)  # noqa: E731
            self.n_classes = module.n_classes
        if quantize is not None:
            from ..models.quantize import quantize_fn

            fn = quantize_fn(fn, quantize)
        self.params = replicate(params, self.mesh)
        self._sharding = batch_sharding(self.mesh)
        from ..utils.xla_opts import tpu_compiler_options

        self._fn = jax.jit(
            fn,
            in_shardings=(None, self._sharding),
            out_shardings=self._sharding,
            # +4% (TIMED) to +17.5% (DenseCPD) on the conv stacks from a
            # larger scoped-VMEM budget (utils/xla_opts.py — per-arch
            # measurements there); None on non-TPU backends / ProDCoNN
            compiler_options=tpu_compiler_options(
                list(self.mesh.devices.flat), model_name=model_name
            ),
        )

    def to_device(self, chunk) -> jax.Array:
        """Pad to the compiled batch, cast, and place on the mesh.

        Accepts host (numpy) OR device (jax) arrays — device-resident frames
        from the on-device voxelizer stay on device (no host roundtrip; over
        this dev tunnel that roundtrip costs ~1 s per 76-residue design).
        The returned batch can be fed to ``run_device_batch`` of ANY
        predictor sharing this mesh/batch size — the multi-model engine path
        transfers frames once and runs every model on the same device array.
        """
        n = chunk.shape[0]
        dt = self._transfer_dtype
        if isinstance(chunk, jax.Array):
            if dt is not None:
                chunk = chunk.astype(dt)
            if n < self.batch_size:
                chunk = jnp.pad(
                    chunk,
                    [(0, self.batch_size - n)] + [(0, 0)] * (chunk.ndim - 1),
                )
        else:
            if n < self.batch_size:
                chunk = np.concatenate(
                    [chunk,
                     np.zeros((self.batch_size - n, *chunk.shape[1:]),
                              chunk.dtype)]
                )
            chunk = jnp.asarray(chunk) if dt is None else jnp.asarray(chunk, dt)
        return jax.device_put(chunk, self._sharding)

    def run_device_batch(self, x: jax.Array):
        """Launch the compiled forward on an already-placed batch (async)."""
        return self._fn(self.params, x)

    def _dispatch(self, chunk):
        """Pad + device_put + launch; returns the (async) device result."""
        return self.run_device_batch(self.to_device(chunk))

    def predict_stream(
        self,
        batches: t.Iterable[tuple[np.ndarray, int]],
        max_in_flight: int = 8,
    ) -> t.Iterator[np.ndarray]:
        """Pipelined prediction over an iterable of (frames, n_valid).

        Dispatches up to ``max_in_flight`` batches before fetching the
        oldest result, so host->device transfer, MXU compute, and the
        result fetch all overlap — a synchronous fetch per batch would
        serialize the link RTT into every step (the reference's per-batch
        `model.predict` pattern, predict.py:142). Yields (n_valid,
        n_classes) arrays in input order.
        """
        pending: collections.deque = collections.deque()
        for frames, n_valid in batches:
            pending.append((self._dispatch(frames), n_valid))
            if len(pending) >= max_in_flight:
                out, n = pending.popleft()
                yield np.asarray(out)[:n]
        while pending:
            out, n = pending.popleft()
            yield np.asarray(out)[:n]

    def predict_probs(self, frames: np.ndarray) -> np.ndarray:
        """Predict (N, n_classes) for any N — pads to the compiled batch."""
        B = self.batch_size
        chunks = (
            (frames[s : s + B], min(B, frames.shape[0] - s))
            for s in range(0, frames.shape[0], B)
        )
        parts = list(self.predict_stream(chunks))
        return (
            np.concatenate(parts)
            if parts
            else np.empty((0, self.n_classes), np.float32)
        )


def _resolve_model(m, compute_dtype=None, allow_random_weights=False):
    """Path/.h5 -> KerasH5Model; "Name@ckpt.npz" -> trained Flax model;
    bare registry name -> randomly-initialized Flax model, REFUSED unless
    ``allow_random_weights`` (benchmarks/tests only — the reference always
    loads real weights, predict.py:121, and silently random predictions are
    garbage the user cannot distinguish from real ones).

    ``compute_dtype=jnp.bfloat16`` runs convs on the MXU at bf16 rate
    (measured 1.7x on v5e) with fp32 accumulation — the serving default via
    DesignSession.
    """
    from ..models import load_model

    if isinstance(m, KerasH5Model):
        return m, m.name
    if isinstance(m, tuple):
        # a top-level flax module HAS a name attribute set to None — the
        # getattr default alone doesn't cover it, and a None name crashes
        # the output-path construction downstream
        return m, getattr(m[0], "name", None) or "model"
    if isinstance(m, (str, Path)) and "@" in str(m):
        # "<RegistryName>@<checkpoint.npz>": trained weights from cli/train.py
        from ..models import get_model_spec
        from ..train import load_checkpoint_params

        name, ckpt = str(m).split("@", 1)
        spec = get_model_spec(name)
        from ..train import load_checkpoint_build_kwargs

        # checkpoints trained with architecture overrides (td-train
        # --filters) record them; rebuilding with registry defaults would
        # pair the module with a mismatched parameter tree
        kw = load_checkpoint_build_kwargs(ckpt)
        if compute_dtype is not None:
            kw["compute_dtype"] = compute_dtype
        module = spec.build(**kw)
        variables = load_checkpoint_params(ckpt)
        return (module, variables), spec.name
    resolved = load_model(m, compute_dtype=compute_dtype)
    if isinstance(resolved, KerasH5Model):
        return resolved, resolved.name
    spec: ModelSpec = resolved
    if not allow_random_weights:
        raise ValueError(
            f"model {str(m)!r} resolves to registry architecture "
            f"{spec.name!r} with NO weights — predictions would be random "
            "garbage. Pass a .h5 weights file, a 'Name@checkpoint.npz' from "
            "cli/train.py, or set allow_random_weights=True "
            "(--allow-random-weights on the CLI) for benchmarking."
        )
    import sys

    print(
        f"WARNING: using RANDOMLY INITIALIZED weights for {spec.name} — "
        "outputs are not real designs (benchmark mode).",
        file=sys.stderr,
    )
    module = spec.build(
        **({"compute_dtype": compute_dtype} if compute_dtype is not None else {})
    )
    from ..voxel import Codec

    codec = Codec.from_string(spec.codec)
    x = jnp.zeros((1, 21, 21, 21, codec.n_channels), jnp.float32)
    variables = module.init(jax.random.key(0), x)
    return (module, variables), spec.name


def _datasetmap_matches_dataset(dmap, dataset_path: Path) -> bool:
    """Cheap consistency check: do the map's rows describe THIS dataset?

    Flat layout: row count plus first/last index entries must agree.
    Tree layout: the first and last entries' pdb/chain/rid nodes must
    exist. O(1) h5 metadata reads — not a full scan."""
    import h5py

    from ..io.h5frames import _is_flat_layout

    if not dmap.entries:
        return False
    try:
        with h5py.File(dataset_path, "r") as f:
            if _is_flat_layout(f):
                n = f["index_pdb"].shape[0]
                if n == len(dmap.entries):
                    for i in (0, len(dmap.entries) - 1):
                        pdb, chain, rid, _ = dmap.entries[i]
                        row = (
                            _dec(f["index_pdb"][i]),
                            _dec(f["index_chain"][i]),
                            _dec(f["index_residue"][i]),
                        )
                        if row != (pdb, chain, rid):
                            return False
                    return True
                # a blacklist-filtered map is a legitimate SUBSET: verify
                # membership instead (one index read, not a frame scan)
                rows = set(zip(
                    (_dec(v) for v in f["index_pdb"][()]),
                    (_dec(v) for v in f["index_chain"][()]),
                    (_dec(v) for v in f["index_residue"][()]),
                ))
                return all(
                    (dmap.entries[i][0], dmap.entries[i][1],
                     dmap.entries[i][2]) in rows
                    for i in (0, len(dmap.entries) - 1)
                )
            for i in (0, len(dmap.entries) - 1):
                pdb, chain, rid, _ = dmap.entries[i]
                if pdb not in f or chain not in f[pdb] or rid not in f[pdb][chain]:
                    return False
            return True
    except OSError:
        return False


def _dec(v) -> str:
    return v.decode() if isinstance(v, bytes) else str(v)


def load_dataset_and_predict(
    models: list,
    dataset_path: Path,
    batch_size: int = 512,
    start_batch: int = 0,
    dataset_map_path: Path = Path("datasetmap.txt"),
    blacklist: Path | None = None,
    predict_rotamers: bool = False,
    model_name_suffix: str = "",
    is_consensus: bool = False,
    path_to_output: Path = Path.cwd(),
    mesh=None,
    float16_decode: bool = True,
    compute_dtype=None,
    allow_random_weights: bool = False,
    ensemble: bool = False,
    quantize: str | None = None,
) -> PredictionResult:
    """Engine entry point — reference-parity surface (predict.py:28-194).

    Streams all frames from the HDF5 dataset ONCE, runs every model on each
    device-resident batch, and emits the full artifact set per model (the
    reference re-streams the dataset per model, predict.py:114-142). In
    rotamer mode the raw 338-class matrix goes
    to ``{model}_rot.csv`` and the argmax-collapsed 20-class one-hots to
    ``{model}.csv``; the fasta decode runs on the 338-class matrix cast to
    float16 (mirroring the reference's CSV round-trip at predict.py:163) so
    argmax tie-breaking matches bit-for-bit.

    ``ensemble=True`` (beyond the reference, which only runs models
    separately, predict.py:114) additionally averages the per-model
    probability matrices in full float32 precision — the models must share a
    head size — and emits the same artifact set under the name
    ``ensemble{suffix}`` (csv/fasta/SRB map, consensus when requested). The
    device cost is already paid: every model ran on the same device-resident
    batches, so the ensemble is one host-side mean. The returned bundle is
    then the ENSEMBLE's (per-model bundles still land on disk).
    """
    timer = PhaseTimer()
    path_to_output = Path(path_to_output)
    dataset_path = Path(dataset_path)

    filter_list = get_pdb_keys_to_filter(blacklist) if blacklist else []

    with timer.phase("datasetmap"):
        dataset_map_path = Path(dataset_map_path)
        if (
            not dataset_map_path.exists()
            and not dataset_map_path.is_absolute()
            and (path_to_output / dataset_map_path).exists()
        ):
            # a previous run with this path_to_output saved the generated
            # map THERE (below) — a CWD-relative default must find it again
            # instead of regenerating forever
            dataset_map_path = path_to_output / dataset_map_path
        if Path(dataset_map_path).exists():
            # the engine needs the per-residue ("old") format for frame
            # lookup; an SRB/new-format map would die deep in the parser
            # with an IndexError — detect and explain instead
            head = Path(dataset_map_path).read_text(errors="replace")[:64]
            if head.startswith("ignore_uncommon"):
                raise ValueError(
                    f"{dataset_map_path} is an SRB/new-format datasetmap "
                    "(count rows, no residue labels); prediction needs the "
                    "per-residue map. Delete it to regenerate, or point "
                    "dataset_map_path elsewhere."
                )
            dmap = load_datasetmap(Path(dataset_map_path), is_old=True)
            # a loaded map must actually DESCRIBE this dataset: a stale
            # file from a different run (reused output dir, leftover CWD
            # file) would index the HDF5 with the wrong (pdb,chain,rid)
            # rows — KeyError deep in the loader at best, silently
            # mispaired sequences at worst. Regenerate on mismatch.
            if not _datasetmap_matches_dataset(dmap, dataset_path):
                print(
                    f"# {dataset_map_path} does not match {dataset_path} "
                    f"(stale map from another dataset?) — regenerating"
                )
                dmap = None
        else:
            dmap = None
        if dmap is None:
            dmap, _ = create_flat_dataset_map(
                dataset_path, filter_list, remove_blacklist_silently=True
            )
            # save under the REQUESTED filename so the next run with the
            # same dataset_map_path finds it (a fixed 'datasetmap.txt'
            # would leave non-default names regenerating forever)
            save_datasetmap(dmap, path_to_output / dataset_map_path.name)

    # Resolve every model up front and stream the dataset ONCE: each batch
    # crosses host->device a single time and every model's compiled program
    # runs on the same device-resident frames. The reference re-reads the
    # whole HDF5 dataset per model (predict.py:114-142); on hardware where
    # the loader runs at ~80% of chip compute this fused pass makes each
    # additional model cost only its MXU time. (Peak host memory holds all
    # models' probability matrices at once — at rotamer width that is
    # N_frames x 338 x 4 bytes per model; fine at benchmark scales.)
    if mesh is None:
        from ..parallel.mesh import make_mesh

        mesh = make_mesh()
    if not models:
        raise ValueError("no models given")
    resolved_models: list[tuple] = []
    for m in models:
        model, model_name = _resolve_model(
            m, compute_dtype=compute_dtype,
            allow_random_weights=allow_random_weights,
        )
        resolved_models.append((model, model_name + model_name_suffix))
    predictors = [
        Predictor(model, batch_size=batch_size, mesh=mesh,
                  transfer_dtype=compute_dtype, model_name=name,
                  quantize=quantize)
        for model, name in resolved_models
    ]
    if ensemble:
        # fail before streaming: a head mismatch (20-class vs 338-rotamer
        # zoo members) makes the mean meaningless
        if len(predictors) < 2:
            raise ValueError(
                "ensemble=True needs at least two models to average"
            )
        heads = {p.n_classes for p in predictors}
        if len(heads) != 1:
            raise ValueError(
                "ensemble requires models with matching heads; got class "
                f"counts {sorted(heads)} — mixing 20-residue and 338-rotamer "
                "models cannot be averaged"
            )
    # fail before streaming: the emit path is head-global (338-rotamer CSVs
    # + argmax-collapse vs 20-class decode), so every model must match the
    # predict_rotamers flag — a 338-head model decoded as 20-class indexes
    # past the amino-acid alphabet, and a 20-head model under rotamer mode
    # runs its argmax through ROTAMER_TO_AA_ONEHOT with the wrong semantics
    # (silent garbage). The reference has the same implicit contract
    # (predict.py:120-142) but dies opaquely instead.
    for p, (_, name) in zip(predictors, resolved_models):
        if predict_rotamers and p.n_classes != 338:
            raise ValueError(
                f"predict_rotamers=True but model {name!r} has a "
                f"{p.n_classes}-class head (expected 338). Run 20-class "
                "models in a separate invocation without --predict_rotamers."
            )
        if not predict_rotamers and p.n_classes == 338:
            raise ValueError(
                f"model {name!r} has a 338-rotamer head; pass "
                "--predict_rotamers (or run it separately from 20-class "
                "models — the artifact format is per-run)."
            )

    # append on resume so earlier batches' rows survive (the reference's
    # append-mode CSVs, predict.py:145); truncate on fresh runs so a
    # stale file can't duplicate rows
    resuming = start_batch > 0

    loader = FrameBatchLoader(
        dataset_path, dmap, batch_size=predictors[0].batch_size,
        start_batch=start_batch,
    )
    # --- scale-safe accumulation (the reference streams append-mode per
    # batch, predict.py:145; holding every model's float32 matrix PLUS
    # float64 ensemble copies crashed at its benchmark scale — 3 rotamer
    # models over 1M frames is ~8 GB before an np.stack doubles it):
    #   * probability CSVs stream to disk per drained batch (bytes
    #     identical — np.savetxt appends are the reference's own format);
    #   * decode keeps only the float16 matrix it needs anyway
    #     (float16_decode default; 2 bytes/value, half the old peak);
    #   * --ensemble accumulates ONE float64 running sum in place —
    #     no per-member float64 copies, no stack.
    # Peak host memory: n_models x N x C x 2B (f16) + N x C x 8B when
    # ensembling — ~2.4 GB for 3 rotamer models over 500k frames.
    n_models = len(predictors)
    n_classes = predictors[0].n_classes
    decode_parts: list[list[np.ndarray]] = [[] for _ in predictors]
    ens_sum: np.ndarray | None = None
    ens_off = 0
    if ensemble and not resuming:
        ens_sum = np.zeros((dmap.n_residues, n_classes), np.float64)

    class _ModelCSVStream:
        """Per-model append writer: the raw matrix (full precision in
        rotamer mode, float16 otherwise) + the rotamer argmax one-hots."""

        def __init__(self, model_name: str, append: bool = resuming):
            mode = "ab" if append else "wb"
            self.main_path = path_to_output / (
                f"{model_name}_rot.csv" if predict_rotamers
                else f"{model_name}.csv"
            )
            self.onehot_path = path_to_output / f"{model_name}.csv"
            self._main = open(self.main_path, mode)
            self._onehot = (
                open(self.onehot_path, mode) if predict_rotamers else None
            )

        def write(self, rows: np.ndarray) -> None:
            from ..io.writers import write_prediction_rows

            if predict_rotamers:
                write_prediction_rows(self._main, rows, float16=False)
                onehot = ROTAMER_TO_AA_ONEHOT[rows.argmax(axis=1)]
                write_prediction_rows(self._onehot, onehot, float16=True)
            else:
                write_prediction_rows(self._main, rows, float16=True)

        def close(self) -> None:
            self._main.close()
            if self._onehot is not None:
                self._onehot.close()

    streams = [_ModelCSVStream(name) for _, name in resolved_models]
    labels_file = open(
        path_to_output / "encoded_labels.csv", "ab" if resuming else "wb"
    )
    try:
        with timer.phase("predict"):
            # pipelined: loader prefetch, H2D, compute, and fetch overlap;
            # in-flight dispatch groups shrink as the model count grows so
            # HBM stays bounded
            pending: collections.deque = collections.deque()
            max_in_flight = max(2, 8 // n_models)

            from ..io.writers import write_int_csv

            # ---- writer thread (VERDICT r4 next #7) ----------------------
            # CSV formatting + appends ran on the dispatch thread through
            # round 4 — 193 s of a 587 s 500k-frame run was serial write
            # time the device spent idle. One consumer thread drains a
            # bounded queue IN ORDER (append order, and therefore resume
            # semantics and artifact bytes, are exactly the serial path's);
            # the native f16 formatter releases the GIL, so formatting
            # genuinely overlaps dispatch on multi-core hosts.
            import queue as _queue

            write_q: _queue.Queue = _queue.Queue(maxsize=4)
            writer_err: list[BaseException] = []
            _STOP = object()

            def _write_batch(outs_np, y, n):
                nonlocal ens_off
                y_int = y[:n].astype(np.int64)
                if not write_int_csv(labels_file, y_int):
                    np.savetxt(labels_file, y_int, delimiter=",", fmt="%i")
                for i, rows in enumerate(outs_np):
                    streams[i].write(rows)
                    decode_parts[i].append(
                        rows.astype(np.float16) if float16_decode else rows
                    )
                    if ens_sum is not None:
                        # accumulate exactly what the streamed CSV holds
                        # (f16 rows outside rotamer mode): a fresh run and a
                        # --start_batch resume (which re-reads the CSVs)
                        # must produce identical ensemble bytes
                        ens_sum[ens_off : ens_off + n] += (
                            rows if predict_rotamers
                            else rows.astype(np.float16)
                        )
                ens_off += n

            def _writer():
                while True:
                    item = write_q.get()
                    try:
                        if item is _STOP:
                            return
                        if not writer_err:  # fail-fast: skip after an error
                            _write_batch(*item)
                    except BaseException as e:  # noqa: BLE001 - re-raised on main
                        writer_err.append(e)
                    finally:
                        write_q.task_done()

            writer_th = threading.Thread(
                target=_writer, name="csv-writer", daemon=True
            )
            writer_th.start()

            def _drain_one():
                outs, y, n = pending.popleft()
                # the device fetch stays HERE: it is the completion wait
                # that throttles dispatch (backpressure), and fetching on
                # the writer thread would serialize fetch behind formatting
                outs_np = [np.asarray(out)[:n] for out in outs]
                if writer_err:
                    raise writer_err[0]
                write_q.put((outs_np, y, n))

            try:
                for X, y, n_valid in loader:
                    x_dev = predictors[0].to_device(X[:n_valid])
                    pending.append(
                        ([p.run_device_batch(x_dev) for p in predictors],
                         y, n_valid)
                    )
                    if len(pending) >= max_in_flight:
                        _drain_one()
                while pending:
                    _drain_one()
            finally:
                write_q.put(_STOP)
                writer_th.join()
            if writer_err:
                raise writer_err[0]
    finally:
        labels_file.close()
        for s in streams:
            s.close()

    def _emit_outputs(probs, model_name, *, read_back, write_csv=False,
                      main_csv=None):
        """Decode one model's matrix and write its non-streamed artifacts.

        The probability CSVs were streamed during prediction; ``write_csv``
        is only for the ensemble matrix (computed after the stream).
        Returns (decoded, full_probs) where full_probs covers ALL residues
        even on resume (re-read from the appended CSV, the reference's own
        flow at predict.py:163)."""
        with timer.phase("write"):
            if write_csv:
                # same emit contract as the streamed per-model CSVs — one
                # writer, so the formats cannot diverge
                s = _ModelCSVStream(model_name, append=False)
                s.write(probs)
                s.close()
                main_csv = s.main_path
            save_srb_datasetmap(dmap, model_name, path_to_output)

        with timer.phase("decode"):
            if read_back:
                # earlier batches live only in the appended CSV: read the
                # FULL matrix back for decoding
                from ..io import load_prediction_matrix

                probs = load_prediction_matrix(main_csv, dtype=np.float64)
                if probs.shape[0] != dmap.n_residues:
                    raise ValueError(
                        f"Resume mismatch: {main_csv} holds {probs.shape[0]} "
                        f"rows but the dataset map has {dmap.n_residues} "
                        "residues — was --start_batch consistent with the "
                        "previous run's batch size?"
                    )
                if predict_rotamers:
                    # the paired one-hot {model}.csv was appended blindly —
                    # a crash between the two sequential batch writes leaves
                    # it a batch short (or long). The validated matrix is
                    # authoritative: regenerate the derived file from it.
                    from ..io.writers import write_prediction_rows

                    onehot20 = ROTAMER_TO_AA_ONEHOT[probs.argmax(axis=1)]
                    with open(
                        path_to_output / f"{model_name}.csv", "wb"
                    ) as f:
                        write_prediction_rows(f, onehot20, float16=True)
            # the reference decodes from a float16 re-read of its CSV
            # (predict.py:163) and keeps that dtype all the way through —
            # including the NMR consensus (prev+cur)/2 accumulation, which
            # therefore rounds to float16 at every step (utils.py:694-713).
            # An upcast to float64 here preserved argmaxes but drifted the
            # consensus values (caught by the composed-pipeline byte-diff,
            # tests/test_reference_pipeline_e2e.py).
            decode_probs = probs.astype(np.float16) if float16_decode else probs
            decoded = extract_sequences(
                dmap,
                decode_probs,
                rotamer_categories=ROTAMER_CATEGORIES if predict_rotamers else None,
                is_consensus=is_consensus,
            )

        with timer.phase("write"):
            save_dict_to_fasta(decoded.pdb_to_sequence, model_name, path_to_output)
            save_dict_to_fasta(decoded.pdb_to_real_sequence, "dataset", path_to_output)
            if decoded.pdb_to_consensus:
                save_dict_to_fasta(
                    decoded.pdb_to_consensus, model_name + "_consensus", path_to_output
                )
                save_consensus_probs(
                    decoded.pdb_to_consensus_prob, model_name, path_to_output
                )
        return decoded, probs

    result: PredictionResult | None = None
    for model_i, (predictor, (_, model_name)) in enumerate(
        zip(predictors, resolved_models)
    ):
        probs = (
            np.concatenate(decode_parts[model_i])
            if decode_parts[model_i]
            else np.zeros(
                (0, predictor.n_classes),
                np.float16 if float16_decode else np.float32,
            )
        )
        decode_parts[model_i] = []  # free as each model finishes decoding
        decoded, full_probs = _emit_outputs(
            probs, model_name, read_back=resuming,
            main_csv=streams[model_i].main_path,
        )
        if ensemble and resuming:
            # the streamed rows only cover start_batch..; the read-back
            # matrix is the full one — accumulate it in place (float64,
            # no per-member copies kept)
            m = np.asarray(full_probs, dtype=np.float64)
            ens_sum = m if ens_sum is None else ens_sum + m
        result = PredictionResult(
            dmap, *decoded.astuple(), timings=timer.summary()
        )
    assert result is not None, "no models given"

    if ensemble:
        # one float64 running sum -> mean; fresh runs accumulated CSV-
        # precision rows during the stream, resumed runs the CSV read-backs
        # (the members' matrices as the reference would see them,
        # predict.py:163) — identical values, so resume cannot flip
        # near-tied ensemble argmaxes. The ensemble CSV is always written
        # fresh — its member sums are complete either way.
        mean_probs = ens_sum / n_models
        decoded, _ = _emit_outputs(
            mean_probs, "ensemble" + model_name_suffix,
            read_back=False, write_csv=True,
        )
        result = PredictionResult(
            dmap, *decoded.astuple(), timings=timer.summary()
        )
    return result


def _structure_model_key(model) -> tuple:
    """Stable identity for a ``predict_structure`` model argument.

    Path-like models key on (string, mtime, size) so an updated weights/
    checkpoint file is re-resolved; in-memory models key on object ids —
    safe only because the cache entry keeps a strong reference to the
    keyed objects (ids cannot be reused while the entry lives).
    """
    if isinstance(model, (str, Path)):
        s = str(model)
        p = Path(s.split("@", 1)[1]) if "@" in s else Path(s)
        try:
            st = p.stat()
            return ("path", s, st.st_mtime_ns, st.st_size)
        except OSError:
            return ("name", s)  # bare registry name
    if isinstance(model, tuple):
        return ("obj",) + tuple(id(x) for x in model)
    return ("obj", id(model))


# (key, batch_size, mesh-id) -> (Predictor, model_name, strong refs).
# Library users looping structures through this documented no-HDF5 path
# paid a FULL recompile per call (every Predictor jits afresh) — ~20-40 s
# per structure on a cold tunnel for a millisecond forward. Bounded LRU:
# model zoo sweeps over a handful of models stay warm, and entries pin
# their key objects so id()-keys stay valid.
_STRUCTURE_PREDICTOR_CACHE: collections.OrderedDict = (
    collections.OrderedDict()
)
_STRUCTURE_PREDICTOR_CAPACITY = 4
# one lock around lookup+insert+evict: predict_structure is documented for
# concurrent callers (serving worker threads), and an unlocked get ->
# move_to_end pair can straddle another thread's eviction (KeyError)
_STRUCTURE_PREDICTOR_LOCK = threading.Lock()


def predict_structure(
    structure_or_path,
    model,
    codec=None,
    gaussian: bool = True,
    batch_size: int = 512,
    mesh=None,
    allow_random_weights: bool = False,
):
    """Full on-device pipeline: PDB -> frames -> probabilities.

    The no-HDF5 fast path (the UI's interactive flow, ui.py:916-947, without
    the intermediate dataset file): voxelization and CNN run back-to-back on
    device. Returns (probs (R, n_classes), FrameAtoms).

    Consecutive calls with the same (model, batch_size, mesh) reuse one
    compiled Predictor (LRU of 4) — no per-call recompile.
    """
    from ..structure import Structure, load_pdb
    from ..voxel import Codec, structure_to_frame_atoms, voxelize_frame_atoms

    if not isinstance(structure_or_path, Structure):
        structure_or_path = load_pdb(Path(structure_or_path))
    cache_key = (
        _structure_model_key(model),
        batch_size,
        id(mesh) if mesh is not None else None,
        # random-weight opt-in is part of the identity: a cache entry built
        # under allow_random_weights=True must not satisfy a caller that
        # didn't opt in (that caller is owed _resolve_model's ValueError)
        bool(allow_random_weights),
    )
    with _STRUCTURE_PREDICTOR_LOCK:
        hit = _STRUCTURE_PREDICTOR_CACHE.get(cache_key)
        if hit is not None:
            _STRUCTURE_PREDICTOR_CACHE.move_to_end(cache_key)
    if hit is not None:
        predictor, model_name = hit[0], hit[1]
    else:
        # resolve + construct outside the lock (Predictor init may compile);
        # concurrent misses on the same key waste a build but stay correct —
        # last insert wins
        resolved, model_name = _resolve_model(
            model, allow_random_weights=allow_random_weights
        )
        predictor = Predictor(resolved, batch_size=batch_size, mesh=mesh,
                              model_name=model_name)
        with _STRUCTURE_PREDICTOR_LOCK:
            _STRUCTURE_PREDICTOR_CACHE[cache_key] = (
                predictor, model_name, model, mesh,
            )
            while (len(_STRUCTURE_PREDICTOR_CACHE)
                   > _STRUCTURE_PREDICTOR_CAPACITY):
                _STRUCTURE_PREDICTOR_CACHE.popitem(last=False)
    if codec is None:
        # registry models know their codec (TIMED_Charge needs the 6-channel
        # CNOCACBQ — hardcoding CNOCACB here built 5-channel frames for it);
        # same resolution DesignSession uses
        from ..models import MODEL_REGISTRY

        spec = MODEL_REGISTRY.get(model_name)
        codec = Codec.from_string(spec.codec) if spec else Codec.CNOCACB()
    elif isinstance(codec, str):
        codec = Codec.from_string(codec)
    fa = structure_to_frame_atoms(structure_or_path, codec)
    frames = voxelize_frame_atoms(fa, codec, gaussian=gaussian)
    probs = predictor.predict_probs(frames)  # device-resident, no roundtrip
    return probs, fa
