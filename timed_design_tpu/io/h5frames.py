"""aposteriori-HDF5 frame dataset ingest: metadata, flat map, batch streaming.

Reads the dataset layout documented at design_utils/utils.py:238-251 and
replaces the reference's per-batch ``h5py.File`` reopen + per-residue dataset
reads (utils.py:487-530 — its I/O bottleneck, SURVEY.md §3.1) with a single
open handle and a prefetching batch iterator that overlaps HDF5 decompression
with device compute.
"""
from __future__ import annotations

import dataclasses
import queue
import threading
import typing as t
import warnings
from pathlib import Path

import h5py
import ml_dtypes
import numpy as np

from ..constants import AA3, AA3_TO_INT, UNCOMMON_RESIDUE_DICT
from .datasetmap import DatasetMap


def flat_frame_dtype(f: h5py.File) -> np.dtype:
    """Logical dtype of a flat file's ``/frames`` dataset.

    bfloat16 frames are stored as their raw bits in a uint16 dataset (HDF5
    has no bfloat16 type) with ``frame_dtype='bfloat16'`` in the file attrs;
    everything else reads as the dataset's own dtype.
    """
    if str(f.attrs.get("frame_dtype", "")) == "bfloat16":
        return np.dtype(ml_dtypes.bfloat16)
    return f["frames"].dtype


def read_flat_frames(f: h5py.File, sel=np.s_[:]) -> np.ndarray:
    """Read (a slice of) a flat file's frames in their logical dtype."""
    raw = f["frames"][sel]
    logical = flat_frame_dtype(f)
    return raw.view(logical) if raw.dtype != logical else raw


@dataclasses.dataclass
class FrameDatasetMetadata:
    """Validated dataset attrs (reference utils.py:230-281)."""

    make_frame_dataset_ver: str
    frame_dims: tuple[int, int, int, int]
    atom_encoder: list[str]
    encode_cb: bool
    atom_filter_fn: str
    residue_encoder: list[str]
    frame_edge_length: float
    voxels_as_gaussian: bool

    COMPATIBLE_MAJOR = "2"  # aposteriori 2.x datasets (setup.py pins 2.4.0)

    @staticmethod
    def from_file(path: Path) -> "FrameDatasetMetadata":
        with h5py.File(path, "r") as f:
            a = dict(f.attrs.items())
        meta = FrameDatasetMetadata(
            make_frame_dataset_ver=str(a["make_frame_dataset_ver"]),
            frame_dims=tuple(int(x) for x in a["frame_dims"]),
            atom_encoder=[str(x) for x in a["atom_encoder"]],
            encode_cb=bool(a["encode_cb"]),
            atom_filter_fn=str(a.get("atom_filter_fn", "")),
            residue_encoder=[str(x) for x in a.get("residue_encoder", [])],
            frame_edge_length=float(a["frame_edge_length"]),
            voxels_as_gaussian=bool(a["voxels_as_gaussian"]),
        )
        major = meta.make_frame_dataset_ver.split(".")[0]
        if major != FrameDatasetMetadata.COMPATIBLE_MAJOR:
            raise ValueError(
                f"Dataset version {meta.make_frame_dataset_ver} is incompatible "
                f"with supported major version {FrameDatasetMetadata.COMPATIBLE_MAJOR}. "
                f"Re-create the dataset."
            )
        return meta


def _residue_sort_key(rid: str) -> tuple:
    """Natural order for residue ids, per id: numeric part then insertion
    code ('2' < '10' < '100' < '100A' < '100B'). A single id like '100A'
    must not demote the WHOLE chain to lexicographic order (where
    '10' < '2')."""
    import re

    m = re.match(r"^\s*(-?\d+)(.*)$", rid)
    if m:
        return (0, int(m.group(1)), m.group(2))
    return (1, 0, rid)


def get_pdb_keys_to_filter(pdb_key_path: Path, file_extension: str = ".txt") -> list[str]:
    """Collect 4-letter PDB codes from blacklist files (utils.py:284-315)."""
    files = list(Path(pdb_key_path).glob(f"**/*{file_extension}"))
    if not files:
        raise ValueError("Expected at least 1 pdb key file.")
    keys: list[str] = []
    for f in files:
        for token in f.read_text().split():
            keys.append(token[:4])
    return keys


def _is_flat_layout(f: h5py.File) -> bool:
    return str(f.attrs.get("layout", "")) == "flat" and "frames" in f


def create_flat_dataset_map(
    frame_dataset: Path,
    filter_list: t.Sequence[str] = (),
    remove_blacklist_silently: bool = False,
) -> tuple[DatasetMap, set[str]]:
    """Flatten the h5 pdb/chain/residue tree into an ordered residue list.

    Reference behavior (utils.py:318-407): residues sorted numerically within
    each chain, uncommon residue labels remapped with a warning, blacklisted
    4-letter codes either rejected (error) or skipped (warning).

    Flat-layout datasets (voxel/dataset.py `layout='flat'`) carry their map
    in the `/index_*` columns — read directly, preserving row order.
    """
    entries: list[tuple[str, str, str, str]] = []
    pdbs: set[str] = set()
    with h5py.File(frame_dataset, "r") as f:
        if _is_flat_layout(f):
            cols = [
                [v.decode() if isinstance(v, bytes) else str(v) for v in f[c][()]]
                for c in ("index_pdb", "index_chain", "index_residue",
                          "index_label")
            ]
            filtered_any = False
            warned_codes: set[str] = set()
            for pdb_code, chain, rid, label in zip(*cols):
                if pdb_code[:4] in filter_list:
                    if remove_blacklist_silently:
                        filtered_any = True
                        # same observability as the tree branch below: the
                        # user verifying their blacklist took effect must
                        # see it regardless of file layout (once per pdb —
                        # flat rows are per-residue)
                        if pdb_code not in warned_codes:
                            warned_codes.add(pdb_code)
                            warnings.warn(
                                f"PDB code {pdb_code} was found in "
                                f"benchmark set; removed."
                            )
                        continue
                    raise ValueError(f"PDB code {pdb_code} is blacklisted.")
                if label not in AA3:
                    # same contract as the tree path below: remap with a
                    # warning, fail loudly on anything unknown rather than
                    # flowing bogus labels into the datasetmap
                    if label in UNCOMMON_RESIDUE_DICT:
                        warnings.warn(
                            f"{label} is not a standard residue; converted "
                            f"to {UNCOMMON_RESIDUE_DICT[label]}."
                        )
                        label = UNCOMMON_RESIDUE_DICT[label]
                    else:
                        raise ValueError(
                            f"Expected natural amino acid, but got {label}."
                        )
                entries.append((pdb_code, chain, rid, label))
                pdbs.add(pdb_code)
            return DatasetMap(
                entries=entries,
                # entry order == row order only when nothing was filtered
                row_identity_for=(
                    None if filtered_any
                    else str(Path(frame_dataset).resolve())
                ),
            ), pdbs
        for pdb_code in f:
            if pdb_code[:4] in filter_list:
                if remove_blacklist_silently:
                    warnings.warn(
                        f"PDB code {pdb_code} was found in benchmark set; removed."
                    )
                    continue
                raise ValueError(
                    f"PDB code {pdb_code} is blacklisted. Pass "
                    f"remove_blacklist_silently=True to skip it instead."
                )
            for chain_id in f[pdb_code]:
                chain = f[pdb_code][chain_id]
                residue_ids = sorted(chain.keys(), key=_residue_sort_key)
                for rid in residue_ids:
                    label = chain[rid].attrs["label"]
                    label = label.decode() if isinstance(label, bytes) else str(label)
                    if label not in AA3:
                        if label in UNCOMMON_RESIDUE_DICT:
                            warnings.warn(
                                f"{label} is not a standard residue; converted to "
                                f"{UNCOMMON_RESIDUE_DICT[label]}."
                            )
                            label = UNCOMMON_RESIDUE_DICT[label]
                        else:
                            raise ValueError(
                                f"Expected natural amino acid, but got {label}."
                            )
                    entries.append((pdb_code, chain_id, str(rid), label))
                    pdbs.add(pdb_code)
    return DatasetMap(entries=entries), pdbs


class FrameBatchLoader:
    """Streamed batch reader over a flat dataset map.

    One persistent h5 handle; a background thread prefetches the next batch
    while the current one computes — the TPU-native replacement for
    load_batch's reopen-per-batch pattern (utils.py:487-530).

    Yields ``(X, y)``: frames ``(B, V, V, V, C)`` float32 and one-hot labels
    ``(B, 20)`` float32. The final batch is padded to ``batch_size`` with
    zeros (``n_valid`` attribute on the yielded tuple's third element) so
    every step has the same shape and XLA compiles exactly once.
    """

    def __init__(
        self,
        dataset_path: Path,
        dmap: DatasetMap,
        batch_size: int,
        start_batch: int = 0,
        prefetch: int = 2,
        native_inflate: bool = True,
        shuffle: bool = False,
        shuffle_seed: int = 0,
    ):
        """``shuffle=True`` draws a fresh global permutation of the residue
        entries on every ``__iter__`` (i.e. per epoch) — required for
        training; inference keeps map order. Flat-layout reads go through
        the sorted-gather path when shuffled."""
        assert dmap.is_old, "FrameBatchLoader requires a per-residue dataset map"
        if shuffle and start_batch:
            # a resumed run would skip start_batch batches of a FRESH
            # permutation — neither continuing the crashed epoch nor
            # covering the data (some frames twice, others never)
            raise ValueError(
                "start_batch resume is incompatible with shuffle=True: "
                "the skipped batches would come from a new permutation."
            )
        self.dataset_path = Path(dataset_path)
        self.entries = dmap.entries
        self.shuffle = shuffle
        self._shuffle_rng = np.random.default_rng(shuffle_seed)
        self._dmap_identity_for = dmap.row_identity_for
        self.batch_size = batch_size
        self.start_batch = start_batch
        self.prefetch = prefetch
        self.native_inflate = native_inflate
        # multi-chunk datasets (h5py auto-chunking splits one frame into ~32
        # chunks) only beat plain h5py reads when decompression parallelizes:
        # the per-chunk Python overhead loses on <=2 cores (measured 455 vs
        # 579 frames/s on 1 core; single-chunk frames win everywhere).
        import os

        self._native_multichunk = (os.cpu_count() or 1) > 2
        self.meta = FrameDatasetMetadata.from_file(self.dataset_path)
        self.n_batches = -(-len(self.entries) // batch_size)

    @staticmethod
    def _raw_gzip_chunks(
        node, allow_multichunk: bool = True
    ) -> list[tuple[tuple, bytes]] | None:
        """[(chunk_offset, compressed bytes)] when the dataset is gzip-only
        (no shuffle/fletcher32/scaleoffset); None otherwise. Handles any
        chunk layout — h5py's auto-chunking splits even one frame into ~32
        chunks, and real aposteriori datasets look the same. The
        ``allow_multichunk`` gate must reject BEFORE any chunk reads (the
        point of gating is to skip that work on few-core hosts)."""
        try:
            if (
                node.compression != "gzip"
                or node.shuffle
                or node.fletcher32
                or node.scaleoffset is not None
                or node.chunks is None
            ):
                return None
            if not allow_multichunk and tuple(node.chunks) != tuple(node.shape):
                return None
            dsid = node.id
            out = []
            for ci in range(dsid.get_num_chunks()):
                info = dsid.get_chunk_info(ci)
                if info.filter_mask != 0:
                    return None
                out.append(
                    (info.chunk_offset,
                     dsid.read_direct_chunk(info.chunk_offset)[1])
                )
            return out
        except Exception:
            return None

    @staticmethod
    def _assemble_chunks(dst: np.ndarray, chunk_shape: tuple,
                         parts: list[tuple[tuple, np.ndarray]]) -> None:
        """Copy inflated full-size chunks into place, clipping edge chunks
        (HDF5 stores edge chunks at full chunk size)."""
        shape = dst.shape
        for offset, tmp in parts:
            sel_dst = tuple(
                slice(o, min(o + c, s))
                for o, c, s in zip(offset, chunk_shape, shape)
            )
            sel_src = tuple(
                slice(0, min(c, s - o))
                for o, c, s in zip(offset, chunk_shape, shape)
            )
            dst[sel_dst] = tmp[sel_src]

    def _read_batch(
        self, f: h5py.File, entries, index: int
    ) -> tuple[np.ndarray, np.ndarray, int]:
        batch = entries[index * self.batch_size : (index + 1) * self.batch_size]
        dims = self.meta.frame_dims
        X = np.zeros((self.batch_size, *dims), dtype=np.float32)
        y = np.zeros((self.batch_size, 20), dtype=np.float32)
        # raw-chunk path: read compressed bytes under h5py's lock, inflate in
        # the native thread pool (io/fast_inflate.py) — h5py cannot
        # parallelize decompression itself (global lock)
        srcs: list[bytes] = []
        dsts: list[np.ndarray] = []
        # per frame: (batch idx, key, dtype buffer, chunk shape, parts)
        frames: list[tuple[int, tuple, np.ndarray, tuple, list]] = []
        for i, (pdb, chain, rid, label) in enumerate(batch):
            node = f[pdb][chain][rid]
            raws = (
                self._raw_gzip_chunks(node, self._native_multichunk)
                if self.native_inflate
                else None
            )
            if raws is not None:
                buf = (
                    X[i]
                    if node.dtype == np.float32
                    else np.empty(node.shape, node.dtype)
                )
                cshape = tuple(node.chunks)
                parts = []
                single = len(raws) == 1 and cshape == tuple(node.shape)
                for offset, raw in raws:
                    tmp = buf if single else np.empty(cshape, node.dtype)
                    srcs.append(raw)
                    dsts.append(tmp)
                    if not single:
                        parts.append((offset, tmp))
                frames.append((i, (pdb, chain, rid), buf, cshape, parts))
            else:
                X[i] = node[()]
            enc = node.attrs.get("encoded_residue")
            if enc is not None:
                y[i] = np.asarray(enc, dtype=np.float32)
            else:
                y[i, AA3_TO_INT[label]] = 1.0
        if srcs:
            from .fast_inflate import inflate_many

            try:
                inflate_many(srcs, dsts)
                for i, _, buf, cshape, parts in frames:
                    if parts:
                        self._assemble_chunks(buf, cshape, parts)
                    if buf.base is not X:
                        X[i] = buf  # dtype cast (bool/f64 datasets)
            except ValueError:  # corrupt chunk: re-read through HDF5 proper
                for i, key, _, _, _ in frames:
                    X[i] = f[key[0]][key[1]][key[2]][()]
        return X, y, len(batch)

    def _flat_rows(self, f: h5py.File) -> np.ndarray:
        """Row index per dataset-map entry (identity when the map came from
        the same flat file; a lookup when the user supplied a resumed or
        reordered map)."""
        if (
            self._dmap_identity_for is not None
            and self._dmap_identity_for == str(self.dataset_path.resolve())
            and len(self.entries) == f["frames"].shape[0]
        ):
            return np.arange(len(self.entries), dtype=np.int64)
        key_to_row = {}
        cols = [
            [v.decode() if isinstance(v, bytes) else str(v) for v in f[c][()]]
            for c in ("index_pdb", "index_chain", "index_residue")
        ]
        for row, key in enumerate(zip(*cols)):
            key_to_row[key] = row
        return np.array(
            [key_to_row[(p, c, r)] for p, c, r, _ in self.entries], np.int64
        )

    def _flat_setup(self, f: h5py.File):
        """Pick the fastest read path for this flat file.

        Returns ``(mm, logical)``: an ``np.memmap`` over the raw frame bytes
        when the dataset is contiguous and unfiltered (full in-order batches
        then yield zero-copy views — the page-cache read happens inside the
        pipelined H2D transfer instead of a host memcpy stage), else
        ``mm=None`` and batches go through ``read_direct``. ``logical`` is
        the dtype batches are yielded in (bfloat16 for bf16-stored files —
        numerically identical to the engine's own bf16 wire cast of float32
        frames, `engine/predictor.py:to_device`)."""
        ds = f["frames"]
        logical = flat_frame_dtype(f)
        mm = None
        try:
            offset = ds.id.get_offset()  # None for chunked datasets
            if (
                ds.chunks is None
                and ds.compression is None
                and offset is not None
            ):
                mm = np.memmap(
                    self.dataset_path, dtype=ds.dtype, mode="r",
                    offset=offset, shape=ds.shape,
                )
        except Exception:
            mm = None
        return mm, logical

    def _read_batch_flat(
        self,
        f: h5py.File,
        rows: np.ndarray,
        index: int,
        mm: np.ndarray | None = None,
        logical: np.dtype | None = None,
    ) -> tuple[np.ndarray, np.ndarray, int]:
        sel = rows[index * self.batch_size : (index + 1) * self.batch_size]
        n = len(sel)
        ds = f["frames"]
        if logical is None:
            logical = flat_frame_dtype(f)
        # bf16 files read raw uint16 bits and reinterpret; everything else
        # keeps the historical float32 batch dtype (read_direct casts)
        buf_dtype = ds.dtype if logical != ds.dtype else np.float32
        start = int(sel[0]) if n else 0
        in_order = bool(n) and np.array_equal(sel, np.arange(start, start + n))
        if in_order and mm is not None and n == self.batch_size:
            # zero-copy view into the file mapping (views keep the mmap
            # alive via .base); no padding needed for a full batch
            X = mm[start : start + n]
            if logical != X.dtype:
                X = X.view(logical)
            y = np.zeros((self.batch_size, 20), np.float32)
            y[:n] = np.asarray(f["labels"][start : start + n], np.float32)
            return X, y, n
        X = np.zeros((self.batch_size, *ds.shape[1:]), buf_dtype)
        if in_order:
            # contiguous run: single read_direct (~20k f32 / ~35k bf16
            # frames/s/core measured on a 1-core host)
            ds.read_direct(X[:n], np.s_[start : start + n])
            labels = f["labels"][start : start + n]
        else:  # arbitrary order: sorted fancy read, then un-sort
            order = np.argsort(sel, kind="stable")
            sorted_rows = sel[order]
            tmp = ds[sorted_rows.tolist()]
            X[order] = tmp
            labels = np.zeros((n, 20), f["labels"].dtype)
            labels[order] = f["labels"][sorted_rows.tolist()]
        if logical != X.dtype:
            X = X.view(logical)
        y = np.zeros((self.batch_size, 20), np.float32)
        y[:n] = np.asarray(labels, np.float32)
        return X, y, n

    def __iter__(self):
        # max(1, ...): stdlib Queue(maxsize=0) means UNBOUNDED — a user
        # asking for prefetch=0 ("no readahead") would instead have the
        # producer thread buffer the whole dataset onto the host
        q: queue.Queue = queue.Queue(maxsize=max(1, self.prefetch))
        stop = object()
        cancel = threading.Event()

        perm = (
            self._shuffle_rng.permutation(len(self.entries))
            if self.shuffle
            else None
        )

        def put(item) -> bool:
            # bounded-wait put so an abandoned iterator (consumer breaks
            # mid-stream) can't leave the producer blocked forever on a
            # full queue, leaking the thread and the open h5 handle
            while not cancel.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            # ANY producer failure must reach the consumer — dying without
            # enqueueing a sentinel would leave the consumer blocked in
            # q.get() forever (e.g. a dataset-map entry absent from the
            # flat file raising KeyError in _flat_rows).
            try:
                with h5py.File(self.dataset_path, "r") as f:
                    if _is_flat_layout(f):
                        rows = self._flat_rows(f)
                        if perm is not None:
                            rows = rows[perm]
                        mm, logical = self._flat_setup(f)
                        for index in range(self.start_batch, self.n_batches):
                            if not put(self._read_batch_flat(
                                    f, rows, index, mm, logical)):
                                return
                    else:
                        entries = (
                            [self.entries[i] for i in perm]
                            if perm is not None
                            else self.entries
                        )
                        for index in range(self.start_batch, self.n_batches):
                            if not put(self._read_batch(f, entries, index)):
                                return
            except BaseException as e:  # noqa: BLE001 - re-raised in consumer
                put(("__producer_error__", e))
                return
            put(stop)

        th = threading.Thread(target=producer, daemon=True)
        th.start()
        try:
            while True:
                item = q.get()
                if item is stop:
                    break
                if isinstance(item, tuple) and len(item) == 2 and item[0] == "__producer_error__":
                    raise item[1]
                yield item
        finally:
            cancel.set()
            th.join()


def convert_to_flat(
    src: Path, dst: Path, chunk_rows: int = 512,
    frame_dtype: str = "float32",
) -> Path:
    """Convert an aposteriori tree-layout dataset to the flat fast layout.

    One-time cost; afterwards batch loading runs ~40x faster on gzip tree
    datasets (tiny per-residue compressed reads -> contiguous reads / mmap
    views). Frame values and order are preserved exactly (the flat row order
    is the create_flat_dataset_map order of the source).

    The frame count is known up front here, so ``/frames`` is written
    CONTIGUOUS (not chunked): the loader then serves full in-order batches
    as zero-copy mmap views and the host memcpy stage disappears entirely
    (``chunk_rows`` is kept for API compatibility; it has no effect on an
    uncompressed contiguous dataset).

    ``frame_dtype``:
      * ``"float32"`` (default) — exact copy of the source values.
      * ``"bfloat16"`` — stores the frames pre-cast to bfloat16 (raw bits in
        a uint16 dataset + ``frame_dtype`` attr). For the production bf16
        inference path this is NUMERICALLY FREE — the engine casts float32
        frames to bfloat16 on the wire anyway (`Predictor.to_device`) — and
        it halves both the file size and every downstream byte: disk reads,
        page-cache footprint, and host->device transfer. Measured on a
        1-core host: 35.3k frames/s via read_direct vs 13.6k float32.
    """
    if frame_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"frame_dtype must be 'float32' or 'bfloat16', got {frame_dtype!r}"
        )
    src, dst = Path(src), Path(dst)
    dmap, _ = create_flat_dataset_map(src)
    with h5py.File(src, "r") as fin, h5py.File(dst, "w") as fout:
        for k, v in fin.attrs.items():
            fout.attrs[k] = v
        fout.attrs["layout"] = "flat"
        if frame_dtype == "bfloat16":
            fout.attrs["frame_dtype"] = "bfloat16"
        dims = tuple(int(x) for x in fin.attrs["frame_dims"])
        n = len(dmap.entries)
        frames = fout.create_dataset(
            "frames", shape=(n, *dims),
            dtype=np.uint16 if frame_dtype == "bfloat16" else np.float32,
        )
        # label dtype follows the SOURCE: the tree reader preserves float
        # (soft/probability) `encoded_residue` attrs (see _read_batch), so
        # the flat copy must too — an unconditional int8 cast would
        # truncate every fractional value to 0 and silently zero the
        # labels. Labels are buffered host-side during the SINGLE copy pass
        # (n x 20 floats is tiny next to the frames) and the output dtype
        # picked at the end — a pre-scan would double every node's HDF5
        # metadata reads on ordinary all-integer datasets.
        label_buf = np.zeros((n, 20), np.float64)
        str_t = h5py.string_dtype()
        cols = {
            name: fout.create_dataset(name, shape=(n,), dtype=str_t)
            for name in ("index_pdb", "index_chain", "index_residue",
                         "index_label")
        }
        for i, (pdb, chain, rid, label) in enumerate(dmap.entries):
            node = fin[pdb][chain][rid]
            if frame_dtype == "bfloat16":
                frames[i] = np.asarray(
                    node[()], ml_dtypes.bfloat16
                ).view(np.uint16)
            else:
                frames[i] = node[()]
            enc = node.attrs.get("encoded_residue")
            if enc is not None:
                label_buf[i] = np.asarray(enc, np.float64)
            else:
                label_buf[i, AA3_TO_INT[label]] = 1
            cols["index_pdb"][i] = pdb
            cols["index_chain"][i] = chain
            cols["index_residue"][i] = rid
            cols["index_label"][i] = label
        label_dtype = (
            np.int8
            if np.array_equal(label_buf, np.round(label_buf))
            else np.float32
        )
        fout.create_dataset(
            "labels", data=label_buf.astype(label_dtype), dtype=label_dtype
        )
    return dst
