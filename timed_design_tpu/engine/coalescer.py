"""Request coalescing: pack concurrent design requests into shared device
batches.

The TPU-idiomatic serving design: one chip eats a 512-frame batch in ~18 ms
(BASELINE.md), but a single design request is typically a 76-residue
backbone — running requests one-at-a-time through the compiled batch leaves
>80% of each program's rows as padding and caps throughput at 1/latency
(the round-2 `td-serve` design: a global lock, cli/serve.py). Here each
request thread voxelizes its own structure (overlapping with other
requests and with device runs — JAX dispatch is thread-safe), a worker
thread drains every pre-voxelized request queued at the moment the device
frees up, packs their frames into the predictor's compiled batch, runs
ONE program, and fans per-request slices back through futures.
Under N concurrent clients the batch fills with real rows and throughput
scales far past 1/latency; an idle server still runs each request
immediately (zero added latency — the default collection window is
"whatever is queued", not a timer).

The reference has no serving story beyond its per-request streamlit app
(reference ui.py:916-947: re-voxelize to an intermediate HDF5 on disk per
click), so this surface is framework-only.
"""
from __future__ import annotations

import queue
import threading
import time
import typing as t
from concurrent.futures import Future

import numpy as np

_CLOSE = object()


class CoalescingDesigner:
    """Thread-safe façade over a :class:`DesignSession` that batches
    concurrent ``design`` calls into shared device programs.

    Parameters
    ----------
    session:
        The compiled DesignSession (one model, one mesh).
    max_group_residues:
        Stop draining the queue once this many frame rows are gathered in
        one group (bounds host memory and keeps the pipeline moving).
        Defaults to 8x the predictor's compiled batch.
    window_ms:
        Optional collection window. 0 (default) = run with whatever is
        queued when the worker frees up — no added latency for idle
        servers. >0 trades that much latency for potentially fuller
        batches under bursty load.
    """

    def __init__(
        self,
        session,
        max_group_residues: int | None = None,
        window_ms: float = 0.0,
    ):
        self.session = session
        self.max_group_residues = (
            max_group_residues or 8 * session.predictor.batch_size
        )
        self.window_s = window_ms / 1e3
        # BOUNDED: queued items now carry device-resident frame tensors
        # (voxelized on the request threads), so an unbounded queue under
        # N slow-to-drain clients would pin unbounded HBM. A full queue
        # blocks design() callers — backpressure, not OOM; the worker
        # always drains, so blocked puts cannot deadlock.
        self._queue: queue.Queue = queue.Queue(maxsize=32)
        # serializes the closed-check+enqueue against close(): without it a
        # design() that passed the check could enqueue AFTER the _CLOSE
        # sentinel and hang forever on a future no worker will resolve
        self._close_lock = threading.Lock()
        self._stats_lock = threading.Lock()
        self.stats = {
            "requests": 0,
            "groups": 0,
            "max_group_requests": 0,
            "max_group_residues": 0,
        }
        self._closed = False
        self._thread = threading.Thread(
            target=self._loop, daemon=True, name="coalescer"
        )
        self._thread.start()

    # -------------------------------------------------- public surface
    def design(self, structure) -> tuple[np.ndarray, t.Any, dict]:
        """Blocking: parse-ready Structure -> (probs, FrameAtoms, timings).

        Called from any number of request threads. ``timings`` carries the
        per-request voxelisation time, the shared prediction time of the
        group this request rode in, and the group's size (so callers can
        see the coalescing that actually happened).

        Voxelization runs HERE, on the calling request thread (JAX
        dispatch is thread-safe): under N concurrent clients the N
        voxelizations overlap each other and the worker's device runs,
        instead of serializing back-to-back on the single worker thread —
        and a parse/voxelize error propagates straight to its own caller.
        """
        from ..voxel import structure_to_frame_atoms, voxelize_frame_atoms

        session = self.session
        t0 = time.perf_counter()
        fa = structure_to_frame_atoms(structure, session.codec)
        frames = voxelize_frame_atoms(
            fa, session.codec, gaussian=session.gaussian
        )
        dt_vox = time.perf_counter() - t0
        return self.submit_frames(frames, fa, dt_vox).result()

    def submit_frames(self, frames, fa, dt_vox: float = 0.0) -> Future:
        """Enqueue pre-voxelized frames; the returned Future resolves to
        the same ``(probs, fa, timings)`` tuple ``design`` returns.

        The non-blocking half of :meth:`design` — lets a caller fan ONE
        voxelization out to several designers (the ensemble path) and wait
        on all of them concurrently instead of serializing member waits."""
        fut: Future = Future()
        with self._close_lock:
            if self._closed:
                # after close() the worker is gone; enqueueing would hang
                # the caller forever on a future nothing will ever resolve
                raise RuntimeError("CoalescingDesigner is closed")
            self._queue.put((frames, fa, fut, dt_vox))
        return fut

    def close(self) -> None:
        with self._close_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(_CLOSE)
        self._thread.join(timeout=10)

    # -------------------------------------------------- worker
    def _drain_group(self) -> list | None:
        """Block for the first request, then gather everything already
        queued (plus anything arriving inside the optional window)."""
        first = self._queue.get()
        if first is _CLOSE:
            return None
        group = [first]
        residues = int(first[0].shape[0])
        deadline = time.perf_counter() + self.window_s
        while residues < self.max_group_residues:
            try:
                timeout = deadline - time.perf_counter()
                item = (
                    self._queue.get(timeout=timeout)
                    if timeout > 0
                    else self._queue.get_nowait()
                )
            except queue.Empty:
                break
            if item is _CLOSE:
                self._queue.put(_CLOSE)  # re-post so the loop exits next
                break
            group.append(item)
            residues += int(item[0].shape[0])
        return group

    def _loop(self) -> None:
        while True:
            group = self._drain_group()
            if group is None:
                return
            try:
                self._run_group(group)
            except BaseException as e:  # noqa: BLE001 - worker must survive
                for _, _, fut, _ in group:
                    if not fut.done():
                        fut.set_exception(e)

    def _run_group(self, group: list) -> None:
        session = self.session
        # requests arrive pre-voxelized (design() runs the voxelizer on the
        # request thread so N clients' voxelizations overlap)
        ready = [(fut, fa, frames, dt_vox)
                 for frames, fa, fut, dt_vox in group]

        t1 = time.perf_counter()
        if len(ready) == 1:
            # solo request: the predictor's own pad-and-run path, no
            # packing dispatches
            probs = session.predictor.predict_probs(ready[0][2])
        else:
            probs = self._predict_packed([r[2] for r in ready])
        dt_predict = time.perf_counter() - t1

        n_res = int(sum(r[2].shape[0] for r in ready))
        with self._stats_lock:
            s = self.stats
            s["requests"] += len(ready)
            s["groups"] += 1
            s["max_group_requests"] = max(s["max_group_requests"], len(ready))
            s["max_group_residues"] = max(s["max_group_residues"], n_res)

        self._fanout(ready, probs, dt_predict, n_res)

    def _predict_packed(self, parts: list) -> np.ndarray:
        """Pack per-request device frames into shared compiled batches.

        Shape discipline is the whole game here: a naive
        ``jnp.concatenate(parts)`` is keyed on the full tuple of input
        shapes, so every new group composition compiles a fresh XLA
        program (measured on the TPU tunnel: coalescing ran SLOWER than
        the serial lock because of exactly this churn). Instead each
        request is written into a chunk-granular zeros buffer with
        ``dynamic_update_slice`` at a *dynamic* offset — the only program
        keys are (buffer chunk count, request length), and a new protein
        length already costs a voxelizer compile anyway. The buffer then
        streams through the predictor's fixed compiled batch program.
        """
        import jax
        import jax.numpy as jnp

        predictor = self.session.predictor
        B = predictor.batch_size
        dtype = predictor._transfer_dtype or parts[0].dtype
        total = sum(int(p.shape[0]) for p in parts)
        if total == 0:
            # a group of all-empty requests (e.g. structures with no
            # standard residues): np.concatenate over zero chunks raises —
            # return the same empty result the solo path produces
            return np.zeros((0, predictor.n_classes), np.float32)
        rows = -(-total // B) * B
        buf = jnp.zeros((rows, *parts[0].shape[1:]), dtype)
        offset = 0
        for p in parts:
            buf = jax.lax.dynamic_update_slice(
                buf, p.astype(dtype),
                (jnp.int32(offset),) + (0,) * (buf.ndim - 1),
            )
            offset += int(p.shape[0])
        chunks = (
            (buf[s : s + B], min(B, total - s)) for s in range(0, total, B)
        )
        out = list(predictor.predict_stream(chunks))
        return np.concatenate(out)

    def _fanout(self, ready: list, probs: np.ndarray, dt_predict: float,
                n_res: int) -> None:
        offset = 0
        for fut, fa, frames, dt_vox in ready:
            r = int(frames.shape[0])
            timings = {
                "voxelisation": dt_vox,
                "prediction": dt_predict,
                "group_requests": len(ready),
                "group_residues": n_res,
            }
            fut.set_result((probs[offset : offset + r], fa, timings))
            offset += r


class SerialDesigner:
    """Lock-serialized fallback with the CoalescingDesigner interface —
    used when coalescing is explicitly disabled (--no-coalesce)."""

    def __init__(self, session):
        self.session = session
        self._lock = threading.Lock()
        self.stats = {"requests": 0, "groups": 0,
                      "max_group_requests": 1, "max_group_residues": 0}

    def design(self, structure):
        with self._lock:
            probs, fa = self.session.design(structure)
            timings = dict(self.session.last_timings)
            timings["group_requests"] = 1
            timings["group_residues"] = int(np.asarray(probs).shape[0])
            self.stats["requests"] += 1
            self.stats["groups"] += 1
            self.stats["max_group_residues"] = max(
                self.stats["max_group_residues"],
                timings["group_residues"],
            )
            return probs, fa, timings

    def submit_frames(self, frames, fa, dt_vox: float = 0.0) -> Future:
        """Synchronous counterpart of CoalescingDesigner.submit_frames —
        runs under the lock and returns an already-resolved Future, so the
        ensemble path works identically with coalescing disabled."""
        fut: Future = Future()
        try:
            t0 = time.perf_counter()
            with self._lock:
                probs = self.session.predictor.predict_probs(frames)
                n_res = int(np.asarray(probs).shape[0])
                self.stats["requests"] += 1
                self.stats["groups"] += 1
                self.stats["max_group_residues"] = max(
                    self.stats["max_group_residues"], n_res
                )
            timings = {
                "voxelisation": dt_vox,
                "prediction": time.perf_counter() - t0,
                "group_requests": 1,
                "group_residues": n_res,
            }
            fut.set_result((probs, fa, timings))
        except BaseException as e:  # noqa: BLE001 - deliver to the waiter
            fut.set_exception(e)
        return fut

    def close(self) -> None:
        pass


class EnsembleDesigner:
    """A virtual designer that averages several same-head designers.

    ``design`` voxelizes the structure ONCE (all members must share the
    voxel spec — codec and Gaussian mode — or the mean would average
    predictions over different inputs), fans the device-resident frames out
    to every member's queue, waits on all futures concurrently, and returns
    the float64-accumulated mean of the members' probability matrices. The
    members keep coalescing their own traffic meanwhile — an ensemble
    request's frames ride each member's shared batches like any other
    request's. Serving counterpart of ``td-predict --ensemble``
    (engine/predictor.py); the reference runs models only separately
    (predict.py:114).

    Members are NOT owned: ``close`` is a no-op so a server that lists the
    members individually can close them exactly once.
    """

    def __init__(self, members: list):
        members = list(members)
        if len(members) < 2:
            raise ValueError(
                "ensemble needs at least two member models to average"
            )
        heads = {m.session.n_classes for m in members}
        if len(heads) != 1:
            raise ValueError(
                "ensemble requires models with matching heads; got class "
                f"counts {sorted(heads)} — mixing 20-residue and 338-rotamer "
                "models cannot be averaged"
            )
        specs = {(m.session.codec, m.session.gaussian) for m in members}
        if len(specs) != 1:
            raise ValueError(
                "ensemble members must share the voxel spec (codec + "
                f"gaussian); got {sorted(map(str, specs))}"
            )
        self.members = members
        self.session = members[0].session  # head/codec surface for callers
        self._stats_lock = threading.Lock()
        self.stats = {"requests": 0, "members": len(members)}

    def design(self, structure) -> tuple[np.ndarray, t.Any, dict]:
        from ..voxel import structure_to_frame_atoms, voxelize_frame_atoms

        session = self.session
        t0 = time.perf_counter()
        fa = structure_to_frame_atoms(structure, session.codec)
        frames = voxelize_frame_atoms(
            fa, session.codec, gaussian=session.gaussian
        )
        dt_vox = time.perf_counter() - t0
        futs = [m.submit_frames(frames, fa, dt_vox) for m in self.members]
        results = [f.result() for f in futs]
        probs = np.mean(
            np.stack([np.asarray(p, np.float64) for p, _, _ in results]),
            axis=0,
        ).astype(np.float32)
        timings = {
            "voxelisation": dt_vox,
            # members run concurrently; the slowest bounds the request
            "prediction": max(tm["prediction"] for _, _, tm in results),
            "ensemble_members": len(self.members),
            "group_requests": max(tm["group_requests"] for _, _, tm in results),
            "group_residues": max(tm["group_residues"] for _, _, tm in results),
        }
        with self._stats_lock:
            self.stats["requests"] += 1
        return probs, fa, timings

    def close(self) -> None:
        pass
