"""Output writers, byte-compatible with the reference at the edges.

Emits the same artifact set as predict.py/sample.py (reference README.md:119-
131): per-model probability CSVs (float16 quirk preserved as an option,
utils.py:768), encoded-label CSVs, datasetmap.txt, fasta files, PDBench/SRB
datasetmaps, and consensus probability files. Keeping these byte-compatible
lets PDBench / downstream scripts consume our outputs unchanged.
"""
from __future__ import annotations

import json
import typing as t
from pathlib import Path

import numpy as np

from .datasetmap import (  # noqa: F401 (re-export)
    SRB_HEADER,
    DatasetMap,
    save_srb_datasetmap,
)


def save_dict_to_fasta(
    pdb_to_sequence: dict[str, str], model_name: str, path_to_output: Path = Path.cwd()
) -> Path:
    """``>{pdb}\\n{seq}`` fasta writer (reference utils.py:595-613)."""
    path = Path(path_to_output) / f"{model_name}.fasta"
    with open(path, "w") as f:
        for pdb, seq in pdb_to_sequence.items():
            f.write(f">{pdb}\n{seq}\n")
    return path


_F16_CSV_TABLE: np.ndarray | None = None


def _f16_csv_table() -> np.ndarray:
    """``'%.18e' % v`` bytes for every float16 bit pattern (finite,
    non-negative entries only — others stay empty and force the fallback).

    All such strings are exactly 24 bytes (f16 exponents never exceed two
    digits), which makes CSV emission a pure byte-table gather — measured
    ~100x faster than np.savetxt's per-row % formatting, byte-identical
    output. Built lazily once (~65k format calls, tens of ms).
    """
    global _F16_CSV_TABLE
    if _F16_CSV_TABLE is None:
        vals = np.arange(65536, dtype=np.uint16).view(np.float16)
        # signbit, not >=0: -0.0 compares equal to 0 but formats as
        # '-0.000...e+00' (25 bytes) and would corrupt the fixed-width gather
        ok = np.isfinite(vals) & ~np.signbit(vals)
        # numeric uint8 rows, not an S24 array: flexible-dtype fancy
        # indexing goes through numpy's per-element slow path (measured
        # 9 s/17M cells on a 1-vCPU host vs ~0.5 s for the uint8 gather)
        tab = np.zeros((65536, 25), dtype=np.uint8)
        f64 = vals.astype(np.float64)
        for i in np.nonzero(ok)[0]:
            s = b"%.18e" % f64[i]
            assert len(s) == 24, s
            tab[i, :24] = np.frombuffer(s, np.uint8)
        tab[:, 24] = ord(",")
        _F16_CSV_TABLE = tab
    return _F16_CSV_TABLE


def write_float16_csv(f, data: np.ndarray,
                      rows_per_chunk: int | None = None) -> bool:
    """Fast path: write ``data`` as float16 CSV rows, byte-identical to
    ``np.savetxt(f, data.astype(float16), delimiter=',')``.

    ``f`` must be a BINARY-mode file. Returns False (nothing written) when
    the data contains negatives/non-finite values — the caller falls back
    to np.savetxt (probability matrices never do; this keeps the writer
    safe for arbitrary matrices).
    """
    a = np.ascontiguousarray(np.asarray(data), np.float16)
    if a.ndim != 2 or a.size == 0:
        return False
    with np.errstate(invalid="ignore"):
        if not bool(np.isfinite(a).all()) or bool(np.signbit(a).any()):
            return False
    # chunked gather: a whole-matrix buffer is 25 bytes/cell (~500 MB for a
    # 1M x 20 ensemble write) — bound the transient to ~32 MB and hand the
    # uint8 array straight to write() (buffer protocol, no tobytes() copy)
    table = _f16_csv_table()
    codes = a.view(np.uint16)
    if rows_per_chunk is None:
        rows_per_chunk = max(1, (32 << 20) // (a.shape[1] * 25))
    for start in range(0, a.shape[0], rows_per_chunk):
        buf = table[codes[start : start + rows_per_chunk]]
        buf[:, -1, 24] = ord("\n")
        f.write(buf)
    return True


def write_prediction_rows(f, rows: np.ndarray, float16: bool) -> None:
    """One probability block to an open BINARY-mode CSV file — the fast
    float16 table path / native %.18e formatter when possible, np.savetxt
    (identical bytes) otherwise."""
    if float16 and write_float16_csv(f, rows):
        return
    if not float16:
        from .fast_fmt import write_e18_csv

        if write_e18_csv(f, rows):
            return
    data = np.asarray(rows)
    if float16:
        data = data.astype(np.float16)
    np.savetxt(f, data, delimiter=",")


def write_int_csv(f, data: np.ndarray) -> bool:
    """Fast path: single-digit integer CSV rows, byte-identical to
    ``np.savetxt(f, data, delimiter=',', fmt='%i')``.

    The encoded-label one-hots (utils.py:753-760) are 0/1 matrices as wide
    as the class count — per-cell '%i' formatting through np.savetxt was
    ~40 ms per 512x338 batch. ``f`` must be BINARY-mode. Returns False
    (nothing written) for non-integer dtypes or any value outside 0..9."""
    a = np.asarray(data)
    if a.ndim != 2 or a.size == 0 or not np.issubdtype(a.dtype, np.integer):
        return False
    if int(a.min()) < 0 or int(a.max()) > 9:
        return False
    rows_per_chunk = max(1, (32 << 20) // (a.shape[1] * 2))
    for start in range(0, a.shape[0], rows_per_chunk):
        block = a[start : start + rows_per_chunk]
        buf = np.empty(block.shape + (2,), np.uint8)
        buf[..., 0] = block.astype(np.uint8) + ord("0")
        buf[..., 1] = ord(",")
        buf[:, -1, 1] = ord("\n")
        f.write(buf)
    return True


def save_prediction_csv(
    probs: np.ndarray,
    model_name: str,
    path_to_output: Path = Path.cwd(),
    append: bool = True,
    float16: bool = True,
    rotamer: bool = False,
) -> Path:
    """Append a probability block to ``{model}.csv`` / ``{model}_rot.csv``.

    ``float16=True`` reproduces the reference's precision quirk
    (utils.py:768: predictions cast to float16 before savetxt) so outputs are
    numerically identical; pass False for full precision. Rotamer outputs get
    the ``_rot.csv`` suffix (fixing the reference's missing f-prefix at
    predict.py:123 — downstream scripts expect ``TIMED_rot.csv``).
    """
    suffix = "_rot.csv" if rotamer else ".csv"
    path = Path(path_to_output) / f"{model_name}{suffix}"
    with open(path, "ab" if append else "wb") as f:
        write_prediction_rows(f, probs, float16)
    return path


def save_encoded_labels(
    y_true: np.ndarray, path_to_output: Path = Path.cwd(), append: bool = True
) -> Path:
    """``encoded_labels.csv`` int one-hot rows (utils.py:753-760)."""
    path = Path(path_to_output) / "encoded_labels.csv"
    y = np.asarray(y_true)
    with open(path, "ab" if append else "wb") as f:
        if not write_int_csv(f, y):
            np.savetxt(f, y, delimiter=",", fmt="%i")
    return path


def save_consensus_probs(
    pdb_to_consensus_prob: dict[str, np.ndarray],
    model_name: str,
    path_to_output: Path = Path.cwd(),
) -> tuple[Path, Path]:
    """SRB-format consensus outputs (utils.py:569-592): ``{model}_consensus.txt``
    count header + ``{model}_consensus.csv`` stacked probabilities."""
    path_txt = Path(path_to_output) / f"{model_name}_consensus.txt"
    path_csv = Path(path_to_output) / f"{model_name}_consensus.csv"
    # both files are written from the FULL consensus dict in one call (the
    # decode step always sees the complete matrix, even on --start_batch
    # resume), so truncate: append would duplicate rows on re-runs and
    # desync the txt count header from the csv
    with open(path_txt, "w") as d, open(path_csv, "w") as p:
        d.write(SRB_HEADER)
        for pdb, predictions in pdb_to_consensus_prob.items():
            d.write(f"{pdb} {len(predictions)}\n")
            np.savetxt(p, np.asarray(predictions), delimiter=",")
    return path_txt, path_csv


def save_sampled(
    pdb_to_sampled: dict[str, list[tuple]],
    filename: str,
    mode: str = "all",
) -> list[str]:
    """Sampled-sequence writers (reference sampling_utils.py:12-50).

    ``pdb_to_sampled`` maps pdb -> list of (sequence, charge, iso_ph, mw, ext)
    tuples. Writes fasta and/or json plus the metrics CSV with the reference's
    exact header.
    """
    output_paths = []
    if mode != "fasta":
        path = f"{filename}.json"
        output_paths.append(path)
        with open(path, "w") as f:
            json.dump(
                {pdb: [list(s) for s in seqs] for pdb, seqs in pdb_to_sampled.items()},
                f,
            )
    if mode != "json":
        path = f"{filename}.fasta"
        output_paths.append(path)
        with open(path, "w") as f:
            for pdb, seq_list in pdb_to_sampled.items():
                for i, seq in enumerate(seq_list):
                    f.write(f">{pdb}_{i}\n{seq[0]}\n")
    path = f"{filename}_metrics.csv"
    output_paths.append(path)
    with open(path, "w") as f:
        f.write(
            "pdb,sequence,charge,isoelectric_point,molecular_weight,molar_extinction\n"
        )
        for pdb, seq_list in pdb_to_sampled.items():
            for seq in seq_list:
                f.write(f"{pdb},{seq[0]},{seq[1]},{seq[2]},{seq[3]},{seq[4]}\n")
    return output_paths


def load_prediction_matrix(path: Path, dtype=np.float64) -> np.ndarray:
    """Load a probability CSV back (reference predict.py:163, sample.py:32)."""
    return np.loadtxt(Path(path), delimiter=",", dtype=dtype, ndmin=2)
