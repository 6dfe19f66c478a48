"""Quantized inference (models/quantize.py): math, parity bounds, isolation.

The reference has no quantization (fp32 Keras forward, predict.py:142);
this characterizes the TPU-native int8/w8 path. Speed verdict lives in
BASELINE.md ("Quantized inference": int8 convs are SLOWER than bf16 through
this XLA build — measured, not assumed); these tests pin the NUMERICS so
the path stays correct while it waits for an XLA build with a fast int8
conv lowering.
"""
from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from timed_design_tpu.models import timed
from timed_design_tpu.models.quantize import quantize_fn, quantized_convs


@pytest.fixture(scope="module")
def timed_model():
    # reduced conv stack: int8 convs EMULATE on the CPU test backend (XLA
    # has no int8 conv lowering there either — a full-size TIMED int8
    # compile+run measured 252 s vs 14 s base), and quantization numerics
    # per layer are architecture-independent
    m = timed(filters=(8, 16))
    x = jnp.zeros((1, 21, 21, 21, 5), jnp.float32)
    v = m.init(jax.random.key(0), x)
    return m, v


@pytest.fixture(scope="module")
def ubq_frames():
    """Real 1ubq voxelized frames — the oracle input (BASELINE config #1)."""
    from timed_design_tpu.structure import load_pdb
    from timed_design_tpu.voxel import (
        Codec,
        structure_to_frame_atoms,
        voxelize_frame_atoms,
    )

    codec = Codec.from_string("CNOCACB")
    ubq = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    fa = structure_to_frame_atoms(load_pdb(ubq), codec)
    return np.asarray(voxelize_frame_atoms(fa, codec))


def test_int8_conv_matches_integer_emulation():
    """The int8 path is EXACTLY quantize -> integer conv -> rescale: parity
    with an explicit emulation (float conv over the quantized operands —
    identical while products stay in f32's exact-integer range)."""
    rng = np.random.default_rng(3)
    lhs = jnp.asarray(rng.random((2, 5, 5, 5, 3)), jnp.float32)
    ker = jnp.asarray(rng.standard_normal((3, 3, 3, 3, 4)), jnp.float32)
    dn = jax.lax.conv_dimension_numbers(
        lhs.shape, ker.shape, ("NDHWC", "DHWIO", "NDHWC")
    )
    with quantized_convs("int8"):
        got = jax.lax.conv_general_dilated(
            lhs, ker, (1, 1, 1), "SAME", dimension_numbers=dn
        )
    s_w = np.abs(np.asarray(ker)).max(axis=(0, 1, 2, 3)) / 127
    wq = np.clip(np.round(np.asarray(ker) / s_w), -127, 127)
    s_x = np.abs(np.asarray(lhs)).max() / 127
    xq = np.clip(np.round(np.asarray(lhs) / s_x), -127, 127)
    ref = jax.lax.conv_general_dilated(
        jnp.asarray(xq, jnp.float32), jnp.asarray(wq, jnp.float32),
        (1, 1, 1), "SAME", dimension_numbers=dn,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref) * (s_x * s_w), rtol=1e-5, atol=1e-5
    )


def test_quantized_modes_parity_bounds_on_oracle(timed_model, ubq_frames):
    """Pin the parity bounds on the oracle input (1ubq frames through
    TIMED): every mode must argmax-agree on >= 95% of residues with
    probability deltas < 2e-3 (measured: agreement 1.0, max delta ~4e-4 —
    the pins leave noise margin while still failing any real numerics
    break)."""
    m, v = timed_model
    x = jnp.asarray(ubq_frames, jnp.float32)
    base = np.asarray(jax.jit(lambda v, x: m.apply(v, x))(v, x))
    for mode in ("w8", "int8-fake", "int8"):
        q = np.asarray(
            jax.jit(quantize_fn(lambda v, x: m.apply(v, x), mode))(v, x)
        )
        agree = float((q.argmax(1) == base.argmax(1)).mean())
        delta = float(np.abs(q - base).max())
        assert agree >= 0.95, (mode, agree)
        assert delta < 2e-3, (mode, delta)
        np.testing.assert_allclose(q.sum(axis=1), 1.0, atol=1e-4)


def test_quantized_trace_does_not_leak(timed_model, ubq_frames):
    """A quantized trace must leave subsequent unquantized traces bitwise
    identical to a never-quantized run (the gate consults its contextvar
    at trace time only)."""
    m, v = timed_model
    x = jnp.asarray(ubq_frames[:8], jnp.float32)
    before = np.asarray(jax.jit(lambda v, x: m.apply(v, x))(v, x))
    jax.jit(quantize_fn(lambda v, x: m.apply(v, x), "int8"))(v, x)
    after = np.asarray(jax.jit(lambda v, x: m.apply(v, x))(v, x))
    np.testing.assert_array_equal(before, after)


def test_quantize_mode_validated():
    with pytest.raises(ValueError, match="quantize mode"):
        quantize_fn(lambda x: x, "int4")
    with pytest.raises(ValueError, match="quantize mode"):
        with quantized_convs("fp8"):
            pass


def test_engine_quantize_flag(tmp_path, timed_model):
    """--quantize w8 through the full engine: valid artifact set, decoded
    probabilities close to the unquantized run's."""
    from timed_design_tpu.engine import load_dataset_and_predict
    from timed_design_tpu.io import load_prediction_matrix
    from timed_design_tpu.voxel import make_frame_dataset

    m, v = timed_model
    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    ds = make_frame_dataset([src], tmp_path / "d.hdf5", codec="CNOCBCA",
                            layout="flat")
    outs = {}
    for tag, q in (("base", None), ("w8", "w8")):
        out = tmp_path / tag
        out.mkdir()
        load_dataset_and_predict(
            [(m, v)], ds, batch_size=32, path_to_output=out,
            dataset_map_path=out / "datasetmap.txt", quantize=q,
        )
        outs[tag] = load_prediction_matrix(out / "model.csv")
    assert outs["w8"].shape == outs["base"].shape == (76, 20)
    # float16 CSV precision: quantization deltas (~4e-4) are mostly below
    # the f16 quantum; bound the disagreement loosely
    assert np.abs(
        outs["w8"].astype(np.float32) - outs["base"].astype(np.float32)
    ).max() < 5e-3
