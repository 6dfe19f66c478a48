"""`td-serve` — production design service over HTTP (no streamlit).

A minimal stdlib HTTP endpoint around `engine.DesignSession`: the model
loads and compiles ONCE at startup; every request then runs voxelize +
predict back-to-back on device (44-58 ms warm latency measured on v5e for a
76-residue backbone — the reference has no serving story beyond its
interactive streamlit app, which re-voxelizes to disk per request,
ui.py:916-947).

    td-serve --model TIMED.h5 --port 8080

API (JSON):
  GET  /healthz           -> {"status": "ok", "model": ..., "n_classes": ...}
  POST /design            body: PDB text (or {"pdb": "...", "n_samples": N,
                          "temperature": T, "seed": S} JSON; omit seed for
                          fresh draws per request). Returns designed
                          sequence, per-residue probabilities, residue ids,
                          timings, the seed used, and optional MC samples.
  POST /report            same body; returns the self-contained HTML design
                          report (report.py) instead of JSON.
  GET  /metrics           Prometheus text format: request counts by
                          endpoint/status, latency histograms, coalescer
                          batching stats per model.

With several --model flags a request's "model" field picks one; --ensemble
additionally serves a virtual "ensemble" model that voxelizes once and
averages every member's probabilities (same-head models only — the serving
counterpart of `td-predict --ensemble`).

Threading: concurrent requests are COALESCED into shared device batches
(engine/coalescer.py): a worker thread packs whatever requests are queued
into one compiled program run and fans the results back, so under N
clients the 512-frame batch fills with real rows and throughput scales far
past 1/latency. An idle server runs each request immediately — the default
collection window is "whatever is queued", not a timer. `--no-coalesce`
restores the round-2 lock-serialized behavior.
"""
from __future__ import annotations

import argparse
import json
import os
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="Serve sequence design over HTTP")
    p.add_argument("--model", type=str, required=True, action="append",
                   help=".h5 weights, Name@checkpoint.npz, or registry name "
                        "with --allow-random-weights. Repeatable: every "
                        "model loads at startup, requests pick one with a "
                        '"model" field (default: the first)')
    p.add_argument("--codec", type=str, default=None)
    p.add_argument("--host", type=str, default="127.0.0.1")
    p.add_argument("--port", type=int, default=8080)
    p.add_argument("--batch_size", type=int, default=512)
    p.add_argument("--compute_dtype", type=str, default="bfloat16",
                   choices=["float32", "bfloat16"])
    p.add_argument("--quantize", type=str, default=None,
                   choices=["int8", "int8-fake", "w8"],
                   help="serve with quantized convs (models/quantize.py); "
                        "measured SLOWER than bf16 on v5e XLA — "
                        "characterization option (BASELINE.md)")
    p.add_argument("--allow-random-weights", action="store_true",
                   dest="allow_random_weights")
    p.add_argument("--no-coalesce", action="store_true", dest="no_coalesce",
                   help="serialize requests through a lock instead of "
                        "batching concurrent requests into shared device "
                        "programs")
    p.add_argument("--coalesce_window_ms", type=float, default=0.0,
                   help="optional collection window: wait this long for "
                        "more requests before launching a batch (default "
                        "0: run with whatever is queued)")
    p.add_argument("--ensemble", action="store_true",
                   help='also serve a virtual "ensemble" model that '
                        "averages every loaded model's probabilities "
                        "(needs >=2 --model with the same head; pick it "
                        'with "model": "ensemble"). One voxelization per '
                        "request — the frames ride each member's shared "
                        "batches")
    return p


MAX_SAMPLES_PER_REQUEST = 10_000  # one request must not OOM the device
# largest accepted request body; generous for PDBs (a 50k-atom structure is
# ~4 MB of text) while bounding request-driven host memory
MAX_BODY_BYTES = 64 * 1024 * 1024

# matplotlib's pyplot state machine (the Gcf figure registry the report
# renderer goes through) is NOT thread-safe; ThreadingHTTPServer runs each
# /report on its own thread, so renders are serialized. Design requests are
# unaffected — they coalesce through the worker, not this lock.
_RENDER_LOCK = threading.Lock()


class ServerMetrics:
    """Thread-safe request counters + latency histograms, rendered in the
    Prometheus text exposition format (GET /metrics). The reference has no
    serving observability at all; this is table stakes for a production
    deployment (scrape-able by any Prometheus/Grafana stack)."""

    # seconds; warm designs measure 0.04-0.06 s, cold compiles minutes
    BUCKETS = (0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 30.0, 120.0)

    def __init__(self):
        import threading

        self._lock = threading.Lock()
        self._requests: dict[tuple[str, int], int] = {}
        self._hist: dict[str, list[int]] = {}
        self._sum: dict[str, float] = {}
        self._count: dict[str, int] = {}

    def observe(self, endpoint: str, status: int, seconds: float):
        with self._lock:
            key = (endpoint, status)
            self._requests[key] = self._requests.get(key, 0) + 1
            if endpoint not in self._hist:
                self._hist[endpoint] = [0] * (len(self.BUCKETS) + 1)
                self._sum[endpoint] = 0.0
                self._count[endpoint] = 0
            buckets = self._hist[endpoint]
            for i, le in enumerate(self.BUCKETS):
                if seconds <= le:
                    buckets[i] += 1
                    break
            else:
                buckets[-1] += 1
            self._sum[endpoint] += seconds
            self._count[endpoint] += 1

    @staticmethod
    def _label(value) -> str:
        """Escape a Prometheus label value (exposition format: backslash,
        double quote, newline) — a model name like ``my"model`` must not
        invalidate the whole /metrics payload for the scraper."""
        return (
            str(value)
            .replace("\\", "\\\\")
            .replace('"', '\\"')
            .replace("\n", "\\n")
        )

    def render(self, designers: dict) -> str:
        esc = self._label
        lines = [
            "# HELP td_requests_total HTTP requests by endpoint and status.",
            "# TYPE td_requests_total counter",
        ]
        with self._lock:
            for (ep, status), n in sorted(self._requests.items()):
                lines.append(
                    f'td_requests_total{{endpoint="{ep}",status="{status}"}} {n}'
                )
            lines += [
                "# HELP td_request_duration_seconds Request wall time.",
                "# TYPE td_request_duration_seconds histogram",
            ]
            for ep in sorted(self._hist):
                cum = 0
                for le, n in zip(self.BUCKETS, self._hist[ep]):
                    cum += n
                    lines.append(
                        f'td_request_duration_seconds_bucket{{endpoint="{ep}"'
                        f',le="{le}"}} {cum}'
                    )
                cum += self._hist[ep][-1]
                lines.append(
                    f'td_request_duration_seconds_bucket{{endpoint="{ep}"'
                    f',le="+Inf"}} {cum}'
                )
                lines.append(
                    f'td_request_duration_seconds_sum{{endpoint="{ep}"}} '
                    f"{self._sum[ep]:.6f}"
                )
                lines.append(
                    f'td_request_duration_seconds_count{{endpoint="{ep}"}} '
                    f"{self._count[ep]}"
                )
        lines += [
            "# HELP td_coalescer_stat Designer batching stats by model.",
            "# TYPE td_coalescer_stat gauge",
        ]
        for name, d in sorted(designers.items()):
            for k, v in dict(d.stats).items():
                lines.append(
                    f'td_coalescer_stat{{model="{esc(name)}",stat="{esc(k)}"}} {v}'
                )
        lines += [
            "# HELP td_model_n_classes Output classes per served model.",
            "# TYPE td_model_n_classes gauge",
        ]
        for name, d in sorted(designers.items()):
            lines.append(
                f'td_model_n_classes{{model="{esc(name)}"}} '
                f"{d.session.n_classes}"
            )
        return "\n".join(lines) + "\n"


def _design_core(designer, pdb_text: str):
    """The shared parse -> design -> decode pipeline behind /design and
    /report: returns (probs, probs20, designed_seq, fa, timings).

    ``designer``: CoalescingDesigner/SerialDesigner — its ``design``
    returns (probs, FrameAtoms, timings) and is safe from any thread."""
    from ..constants import AA1, compress_rotamer_probs
    from ..structure import parse_pdb_string

    structure = parse_pdb_string(pdb_text, name="query")[0]
    probs, fa, timings = designer.design(structure)
    probs = np.asarray(probs)
    probs20 = (
        compress_rotamer_probs(probs) if probs.shape[1] == 338 else probs
    )
    seq = "".join(np.array(list(AA1))[np.asarray(probs20).argmax(1)])
    return probs, np.asarray(probs20), seq, fa, timings


def _design_payload(designer, pdb_text: str, n_samples: int = 0,
                    temperature: float = 0.2, seed: int | None = None) -> dict:
    probs, probs20, seq, fa, timings = _design_core(designer, pdb_text)
    rotamer = probs.shape[1] == 338
    out = {
        "sequence": seq,
        "n_residues": len(seq),
        "rotamer_head": rotamer,
        "residues": [f"{c}{r}" for c, r in zip(fa.chain_ids, fa.residue_ids)],
        "probabilities": np.asarray(probs20).round(6).tolist(),
        "timings_s": {
            k: (round(v, 4) if isinstance(v, float) else v)
            for k, v in timings.items()
        },
    }
    if n_samples > 0:
        import jax

        from ..sample.sampler import apply_temperature, sample_structure

        if seed is None:
            # fresh draws per request; pass "seed" for reproducibility
            seed = int.from_bytes(os.urandom(4), "little")
        p = apply_temperature(probs, float(temperature))
        samples = sample_structure(
            np.asarray(p), int(n_samples), jax.random.key(seed),
            rotamer_mode=rotamer,
        )
        out["seed"] = seed
        out["samples"] = [
            {"sequence": s, "charge": round(float(c), 4),
             "isoelectric_point": round(float(pi), 4),
             "molecular_weight": round(float(mw), 2),
             "molar_extinction": round(float(ex), 1)}
            for s, c, pi, mw, ex in samples
        ]
    return out


def _report_document(designer, pdb_text: str, model_name: str) -> str:
    """POST /report: design + render the static HTML report for one backbone.

    The native sequence comes from the uploaded structure's own residues —
    the same comparison the UI's output section draws (ui.py:328-531)."""
    from ..constants import AA3_TO_AA1
    from ..report import render_design_report

    probs, _probs20, designed, fa, _ = _design_core(designer, pdb_text)
    native = "".join(AA3_TO_AA1.get(l, "X") for l in fa.labels)
    # one report section PER CHAIN — a multi-chain backbone rendered as one
    # section would silently mix chains' sequences/metrics under one title
    chains = list(dict.fromkeys(fa.chain_ids))
    if not chains:
        designed_d = {"query": designed}
        native_d = {"query": native}
        probs_d = {"query": probs}
    else:
        designed_d, native_d, probs_d = {}, {}, {}
        for ch in chains:
            idx = [i for i, c in enumerate(fa.chain_ids) if c == ch]
            key = f"query{ch}"
            designed_d[key] = "".join(designed[i] for i in idx)
            native_d[key] = "".join(native[i] for i in idx)
            probs_d[key] = probs[idx]
    with _RENDER_LOCK:
        return render_design_report(
            designed_d, native_d, probs_d, model_name=model_name
        )


def make_server(designer, host: str, port: int, model_name: str,
                extra_designers: dict | None = None):
    """``designer``/``model_name``: the default model. ``extra_designers``:
    {name: designer} for additional models — a request's JSON ``"model"``
    field picks one; same-model requests coalesce together (each model has
    its own worker/queue, so mixed traffic never packs incompatible
    heads)."""
    import time

    session = designer.session
    designers = {model_name: designer, **(extra_designers or {})}
    metrics = ServerMetrics()

    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            self._record(code)

        def _record(self, code: int):
            t0 = getattr(self, "_t0", None)
            if t0 is not None:
                ep = (
                    self.path
                    if self.path in ("/design", "/report", "/healthz",
                                     "/metrics")
                    else "other"
                )
                metrics.observe(ep, code, time.perf_counter() - t0)
                self._t0 = None  # one observation per request

        def log_message(self, fmt, *args):  # quiet: one line per request
            print(f"{self.address_string()} {fmt % args}")

        def do_GET(self):
            self._t0 = time.perf_counter()
            if self.path == "/healthz":
                self._send(200, {"status": "ok", "model": model_name,
                                 "models": {
                                     name: d.session.n_classes
                                     for name, d in designers.items()
                                 },
                                 "n_classes": session.n_classes,
                                 "coalescer": dict(designer.stats)})
            elif self.path == "/metrics":
                body = metrics.render(designers).encode()
                self.send_response(200)
                self.send_header(
                    "Content-Type", "text/plain; version=0.0.4"
                )
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
                self._record(200)
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        def _send_html(self, doc: str):
            body = doc.encode()
            self.send_response(200)
            self.send_header("Content-Type", "text/html; charset=utf-8")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)
            self._record(200)

        def do_POST(self):
            self._t0 = time.perf_counter()
            if self.path not in ("/design", "/report"):
                self._send(404, {"error": f"unknown path {self.path}"})
                return
            try:
                length = int(self.headers.get("Content-Length", 0))
            except ValueError:
                self._send(400, {"error": "malformed Content-Length"})
                return
            if length < 0:
                # rfile.read(-1) would block until the client closes,
                # hanging this handler thread
                self._send(400, {"error": "malformed Content-Length"})
                return
            if length > MAX_BODY_BYTES:
                self._send(413, {
                    "error": f"request body too large "
                             f"({length} > {MAX_BODY_BYTES} bytes)"})
                return
            try:
                raw = self.rfile.read(length).decode()
            except UnicodeDecodeError:
                # e.g. a gzipped .pdb1.gz posted verbatim — a 400, not a
                # crashed handler thread / dropped connection
                self._send(400, {
                    "error": "request body must be UTF-8 text "
                             "(PDB or JSON); got binary data"})
                return
            n_samples, temperature, seed = 0, 0.2, None
            req_model = model_name
            pdb_text = raw
            if raw.lstrip()[:1] in ("{", "["):  # JSON body (PDB text can't start with these)
                # TypeError included: non-dict JSON bodies ('[1,2]') and
                # null fields (int(None)) must surface as a 400, not a
                # dropped connection
                try:
                    req = json.loads(raw)
                    pdb_text = req["pdb"]
                    if not isinstance(pdb_text, str):
                        raise TypeError("'pdb' must be a string")
                    ns = req.get("n_samples")
                    n_samples = 0 if ns is None else int(ns)
                    t = req.get("temperature")
                    temperature = 0.2 if t is None else float(t)
                    seed = req.get("seed")
                    seed = None if seed is None else int(seed)
                    # only an ABSENT/null "model" falls back to the default;
                    # "" or other falsy junk must 400 like any unknown name,
                    # not silently route to the default model's head
                    m = req.get("model")
                    req_model = model_name if m is None else m
                    if not isinstance(req_model, str):
                        raise TypeError("'model' must be a string")
                except (ValueError, KeyError, TypeError, OverflowError) as e:
                    # OverflowError: {"n_samples": 1e400} parses to inf and
                    # int(inf) raises it — must be a 400, not a dropped
                    # connection
                    self._send(400, {"error": f"bad JSON request: {e}"})
                    return
            if not 0 <= n_samples <= MAX_SAMPLES_PER_REQUEST:
                self._send(400, {
                    "error": f"n_samples must be in "
                             f"[0, {MAX_SAMPLES_PER_REQUEST}]"})
                return
            if not temperature >= 0:  # also rejects NaN
                self._send(400, {"error": "temperature must be >= 0"})
                return
            d = designers.get(req_model)
            if d is None:
                self._send(400, {
                    "error": f"unknown model {req_model!r}; serving: "
                             f"{sorted(designers)}"})
                return
            try:
                # the designer batches concurrent requests into shared
                # device programs; MC sampling below runs on this request
                # thread (device dispatch is thread-safe) so the worker
                # keeps coalescing predictions meanwhile
                if self.path == "/report":
                    self._send_html(_report_document(d, pdb_text, req_model))
                    return
                payload = _design_payload(
                    d, pdb_text, n_samples, temperature, seed
                )
            except Exception as e:  # noqa: BLE001 - surface as HTTP 422
                self._send(422, {"error": str(e)})
                return
            payload["model"] = req_model
            self._send(200, payload)

    return ThreadingHTTPServer((host, port), Handler)


def _add_ensemble(designers: dict) -> None:
    """--ensemble: register the virtual averaging model under "ensemble".

    Fails at startup, not on the first request: <2 models or a head/codec
    mismatch makes the mean meaningless."""
    from ..engine.coalescer import EnsembleDesigner

    if "ensemble" in designers:
        raise SystemExit(
            'a model is already named "ensemble" — cannot add the '
            "virtual ensemble designer"
        )
    try:
        designers["ensemble"] = EnsembleDesigner(list(designers.values()))
    except ValueError as e:
        raise SystemExit(f"--ensemble: {e}") from None


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    from ..engine import DesignSession

    from ..engine.coalescer import CoalescingDesigner, SerialDesigner

    def make_designer(model: str):
        session = DesignSession(
            model, codec=args.codec, batch_size=args.batch_size,
            compute_dtype=args.compute_dtype,
            allow_random_weights=args.allow_random_weights,
            quantize=args.quantize,
        )
        return (
            SerialDesigner(session)
            if args.no_coalesce
            else CoalescingDesigner(session, window_ms=args.coalesce_window_ms)
        )

    designers = {}
    for model in args.model:  # repeatable --model: one designer each
        d = make_designer(model)
        name = d.session.model_name
        if name in designers:
            raise SystemExit(f"duplicate model name {name!r}")
        designers[name] = d
    if args.ensemble:
        _add_ensemble(designers)
    default_name = next(iter(designers))
    designer = designers[default_name]
    server = make_server(
        designer, args.host, args.port, default_name,
        extra_designers={
            k: v for k, v in designers.items() if k != default_name
        },
    )
    mode = "serial" if args.no_coalesce else "coalescing"
    print(f"Serving {', '.join(designers)} (default {default_name}, "
          f"{mode}) on http://{args.host}:{args.port}  "
          f"(POST /design, GET /healthz)")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        for d in designers.values():
            d.close()


if __name__ == "__main__":
    main()
