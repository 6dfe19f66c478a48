"""Constants layer: orderings, rotamer codec, BLOSUM62.

The rotamer reduction guide is the reference's documented ground truth
(design_utils/utils.py:425); everything downstream keys off it.
"""
import numpy as np
import pytest

from timed_design_tpu.constants import (
    AA1,
    AA3,
    CHI_COUNTS,
    N_ROTAMER_CLASSES,
    REDUCTION_GUIDE,
    ROTAMER_CATEGORIES,
    ROTAMER_CATEGORIES_1LETTER,
    ROTAMER_TO_AA,
    ROTAMER_TO_AA_ONEHOT,
    blosum62_scores,
    compress_rotamer_probs,
    encode_chi_bins_to_rotamer,
    get_rotamer_codec,
    lookup_blosum62,
    sequence_similarity,
    sequence_to_int,
    int_to_sequence,
)

# The exact guide from the reference (utils.py:425,
# github.com/wells-wood-research/timed-design/issues/7).
REFERENCE_REDUCTION_GUIDE = [
    0, 1, 4, 13, 40, 49, 50, 59, 68, 149,
    158, 185, 194, 203, 230, 311, 314, 317, 320, 329,
]


def test_aa_ordering_alphabetical():
    assert list(AA1) == sorted(AA1)
    assert AA1[0] == "A" and AA3[0] == "ALA"
    assert len(AA1) == 20


def test_reduction_guide_matches_reference():
    assert list(REDUCTION_GUIDE) == REFERENCE_REDUCTION_GUIDE


def test_rotamer_codec_structure():
    assert len(ROTAMER_CATEGORIES) == N_ROTAMER_CLASSES == 338
    # First categories: ALA_0 then CYS_{1,2,3} (reference utils.py:422 docstring)
    assert ROTAMER_CATEGORIES[0] == "ALA_0"
    assert ROTAMER_CATEGORIES[1:4] == ["CYS_1", "CYS_2", "CYS_3"]
    assert ROTAMER_CATEGORIES[49] == "GLY_0"
    # Block sizes are 3**n_chi
    for i, res in enumerate(AA3):
        end = REFERENCE_REDUCTION_GUIDE[i + 1] if i < 19 else 338
        assert end - REFERENCE_REDUCTION_GUIDE[i] == (
            3 ** CHI_COUNTS[res] if CHI_COUNTS[res] else 1
        )


def test_rotamer_onehot_rows_sum_to_one():
    assert ROTAMER_TO_AA_ONEHOT.shape == (338, 20)
    np.testing.assert_array_equal(ROTAMER_TO_AA_ONEHOT.sum(axis=1), np.ones(338))
    # Every rotamer's AA matches its category prefix
    for k, name in enumerate(ROTAMER_CATEGORIES):
        assert AA3[ROTAMER_TO_AA[k]] == name.split("_")[0]
        assert ROTAMER_CATEGORIES_1LETTER[k] == AA1[ROTAMER_TO_AA[k]]


def test_compress_rotamer_predictions_shape_and_mass():
    # Mirrors reference tests/test_utils.py:6-11 (shape) + conservation of mass.
    rng = np.random.default_rng(0)
    p = rng.random((7, 338))
    p /= p.sum(axis=1, keepdims=True)
    out = compress_rotamer_probs(p)
    assert out.shape == (7, 20)
    np.testing.assert_allclose(out.sum(axis=1), 1.0, atol=1e-6)
    # Equivalence with np.add.reduceat over the reduction guide
    ref = np.add.reduceat(p, REFERENCE_REDUCTION_GUIDE, axis=1)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_get_rotamer_codec_reference_shape():
    codec, cats, guide = get_rotamer_codec(return_reduction_guide=True)
    assert len(codec) == 338 and len(cats) == 338
    assert list(guide) == REFERENCE_REDUCTION_GUIDE
    np.testing.assert_array_equal(codec[68], ROTAMER_TO_AA_ONEHOT[68])


def test_encode_chi_bins():
    # ALA has no chis -> class 0
    assert encode_chi_bins_to_rotamer(0, ()) == 0
    # CYS bins 1..3 -> classes 1..3
    assert encode_chi_bins_to_rotamer(1, (1,)) == 1
    assert encode_chi_bins_to_rotamer(1, (3,)) == 3
    # LYS_1111 is the first LYS class (offset 68)
    assert encode_chi_bins_to_rotamer(8, (1, 1, 1, 1)) == 68
    assert ROTAMER_CATEGORIES[68] == "LYS_1111"
    # LYS_3333 is the last LYS class (148)
    assert encode_chi_bins_to_rotamer(8, (3, 3, 3, 3)) == 148
    # Wrong arity -> None
    assert encode_chi_bins_to_rotamer(8, (1, 2)) is None
    assert encode_chi_bins_to_rotamer(1, (4,)) is None


def test_blosum62_spot_values():
    # Spot-check against the reference's inline dict values (utils.py:806-1083)
    assert lookup_blosum62("W", "F") == 1
    assert lookup_blosum62("F", "W") == 1  # symmetric
    assert lookup_blosum62("L", "R") == -2
    assert lookup_blosum62("W", "W") == 11
    assert lookup_blosum62("B", "B") == 4
    assert lookup_blosum62("X", "X") == -1
    assert lookup_blosum62("A", "A") == 4
    assert lookup_blosum62("C", "C") == 9


def test_sequence_similarity():
    assert sequence_similarity("ACD", "ACD") == 1.0
    # W vs F scores +1 (similar); A vs W scores -3 (not)
    assert sequence_similarity("W", "F") == 1.0
    assert sequence_similarity("A", "W") == 0.0
    np.testing.assert_array_equal(blosum62_scores("WA", "FW"), [1, -3])
    with pytest.raises(ValueError):
        sequence_similarity("AA", "A")


def test_sequence_int_roundtrip():
    seq = "MQIFVKTLTGKTITLEVEPSD"
    assert int_to_sequence(sequence_to_int(seq)) == seq
