"""BLOSUM62 substitution matrix.

Replaces the reference's inline 210-entry upper-triangular dict
(design_utils/utils.py:806-1083, lookup at utils.py:172-187) with the full
symmetric NCBI BLOSUM62 matrix stored as a dense int array — a single gather
on device scores a whole alignment at once, instead of a Python dict probe
per position.
"""
from __future__ import annotations

import numpy as np

# NCBI BLOSUM62 alphabet (23 letters incl. ambiguity codes B/Z/X).
BLOSUM62_ALPHABET = "ARNDCQEGHILKMFPSTWYVBZX"
_B62_ROWS = [
    #  A   R   N   D   C   Q   E   G   H   I   L   K   M   F   P   S   T   W   Y   V   B   Z   X
    [  4, -1, -2, -2,  0, -1, -1,  0, -2, -1, -1, -1, -1, -2, -1,  1,  0, -3, -2,  0, -2, -1,  0],  # A
    [ -1,  5,  0, -2, -3,  1,  0, -2,  0, -3, -2,  2, -1, -3, -2, -1, -1, -3, -2, -3, -1,  0, -1],  # R
    [ -2,  0,  6,  1, -3,  0,  0,  0,  1, -3, -3,  0, -2, -3, -2,  1,  0, -4, -2, -3,  3,  0, -1],  # N
    [ -2, -2,  1,  6, -3,  0,  2, -1, -1, -3, -4, -1, -3, -3, -1,  0, -1, -4, -3, -3,  4,  1, -1],  # D
    [  0, -3, -3, -3,  9, -3, -4, -3, -3, -1, -1, -3, -1, -2, -3, -1, -1, -2, -2, -1, -3, -3, -2],  # C
    [ -1,  1,  0,  0, -3,  5,  2, -2,  0, -3, -2,  1,  0, -3, -1,  0, -1, -2, -1, -2,  0,  3, -1],  # Q
    [ -1,  0,  0,  2, -4,  2,  5, -2,  0, -3, -3,  1, -2, -3, -1,  0, -1, -3, -2, -2,  1,  4, -1],  # E
    [  0, -2,  0, -1, -3, -2, -2,  6, -2, -4, -4, -2, -3, -3, -2,  0, -2, -2, -3, -3, -1, -2, -1],  # G
    [ -2,  0,  1, -1, -3,  0,  0, -2,  8, -3, -3, -1, -2, -1, -2, -1, -2, -2,  2, -3,  0,  0, -1],  # H
    [ -1, -3, -3, -3, -1, -3, -3, -4, -3,  4,  2, -3,  1,  0, -3, -2, -1, -3, -1,  3, -3, -3, -1],  # I
    [ -1, -2, -3, -4, -1, -2, -3, -4, -3,  2,  4, -2,  2,  0, -3, -2, -1, -2, -1,  1, -4, -3, -1],  # L
    [ -1,  2,  0, -1, -3,  1,  1, -2, -1, -3, -2,  5, -1, -3, -1,  0, -1, -3, -2, -2,  0,  1, -1],  # K
    [ -1, -1, -2, -3, -1,  0, -2, -3, -2,  1,  2, -1,  5,  0, -2, -1, -1, -1, -1,  1, -3, -1, -1],  # M
    [ -2, -3, -3, -3, -2, -3, -3, -3, -1,  0,  0, -3,  0,  6, -4, -2, -2,  1,  3, -1, -3, -3, -1],  # F
    [ -1, -2, -2, -1, -3, -1, -1, -2, -2, -3, -3, -1, -2, -4,  7, -1, -1, -4, -3, -2, -2, -1, -2],  # P
    [  1, -1,  1,  0, -1,  0,  0,  0, -1, -2, -2,  0, -1, -2, -1,  4,  1, -3, -2, -2,  0,  0,  0],  # S
    [  0, -1,  0, -1, -1, -1, -1, -2, -2, -1, -1, -1, -1, -2, -1,  1,  5, -2, -2,  0, -1, -1,  0],  # T
    [ -3, -3, -4, -4, -2, -2, -3, -2, -2, -3, -2, -3, -1,  1, -4, -3, -2, 11,  2, -3, -4, -3, -2],  # W
    [ -2, -2, -2, -3, -2, -1, -2, -3,  2, -1, -1, -2, -1,  3, -3, -2, -2,  2,  7, -1, -3, -2, -1],  # Y
    [  0, -3, -3, -3, -1, -2, -2, -3, -3,  3,  1, -2,  1, -1, -2, -2,  0, -3, -1,  4, -3, -2, -1],  # V
    [ -2, -1,  3,  4, -3,  0,  1, -1,  0, -3, -4,  0, -3, -3, -2,  0, -1, -4, -3, -3,  4,  1, -1],  # B
    [ -1,  0,  0,  1, -3,  3,  4, -2,  0, -3, -3,  1, -1, -3, -1,  0, -1, -3, -2, -2,  1,  4, -1],  # Z
    [  0, -1, -1, -1, -2, -1, -1, -1, -1, -1, -1, -1, -1, -1, -2,  0,  0, -2, -1, -1, -1, -1, -1],  # X
]
BLOSUM62_MATRIX = np.array(_B62_ROWS, dtype=np.int32)
_LETTER_TO_IDX = {c: i for i, c in enumerate(BLOSUM62_ALPHABET)}


def lookup_blosum62(res_a: str, res_b: str) -> int:
    """Score a residue pair (symmetric). Reference: utils.py:172-187."""
    return int(BLOSUM62_MATRIX[_LETTER_TO_IDX[res_a], _LETTER_TO_IDX[res_b]])


def blosum62_scores(seq_a: str, seq_b: str) -> np.ndarray:
    """Vectorized per-position BLOSUM62 scores for two equal-length sequences."""
    ia = np.array([_LETTER_TO_IDX[c] for c in seq_a])
    ib = np.array([_LETTER_TO_IDX[c] for c in seq_b])
    return BLOSUM62_MATRIX[ia, ib]


def sequence_similarity(seq_a: str, seq_b: str) -> float:
    """Fraction of positions with a positive BLOSUM62 score.

    Matches the UI's "Sequence Similarity" metric (ui.py BLOSUM similarity
    display): a position counts as similar when its substitution score > 0.
    """
    if len(seq_a) != len(seq_b):
        raise ValueError(f"Length mismatch: {len(seq_a)} vs {len(seq_b)}")
    if not seq_a:
        return 0.0
    return float((blosum62_scores(seq_a, seq_b) > 0).mean())
