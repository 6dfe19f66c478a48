"""Keras-h5 importer parity vs real TF/Keras forward passes.

The reference's model zoo ships as Keras `.h5` releases (predict.py:121);
these tests build equivalent Keras graphs with random weights, save them to
h5, import with our h5py-only importer, and require prediction parity —
covering the SURVEY.md §7 risk "Keras h5 import without TF" (BatchNorm
moving stats, DHWIO kernel layout, ELU, pooling, merges).
"""
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

import jax
import jax.numpy as jnp

from timed_design_tpu.models import load_keras_model

keras = tf.keras


def _timed_like_keras(n_classes=20, channels=5):
    """TIMED-shaped graph: [Conv3D-ELU-BN]x3, SpatialDropout, 1x1x1 conv,
    GAP, softmax (reference README.md:254)."""
    m = keras.Sequential()
    m.add(keras.layers.Input(shape=(21, 21, 21, channels)))
    for f in (8, 16, 16):
        m.add(keras.layers.Conv3D(f, 3, padding="same"))
        m.add(keras.layers.ELU())
        m.add(keras.layers.BatchNormalization())
    m.add(keras.layers.SpatialDropout3D(0.1))
    m.add(keras.layers.Conv3D(n_classes, 1, padding="same"))
    m.add(keras.layers.GlobalAveragePooling3D())
    m.add(keras.layers.Softmax())
    return m


def _functional_keras():
    """Functional graph with branches/merges + pooling + dense head
    (DenseNet/ProDCoNN-style elements)."""
    inp = keras.layers.Input(shape=(21, 21, 21, 5))
    a = keras.layers.Conv3D(8, 3, padding="same", activation="relu")(inp)
    b = keras.layers.Conv3D(8, 1, padding="same", activation="elu")(inp)
    x = keras.layers.Concatenate()([a, b])
    x = keras.layers.BatchNormalization()(x)
    x = keras.layers.Activation("relu")(x)
    y = keras.layers.Conv3D(16, 3, padding="same")(x)
    x = keras.layers.Conv3D(16, 1, padding="same")(x)
    x = keras.layers.Add()([x, y])
    x = keras.layers.MaxPooling3D(2)(x)
    x = keras.layers.AveragePooling3D(2, padding="same")(x)
    x = keras.layers.Flatten()(x)
    x = keras.layers.Dense(32, activation="relu")(x)
    x = keras.layers.Dropout(0.5)(x)
    x = keras.layers.Dense(20, activation="softmax")(x)
    return keras.Model(inp, x)


def _randomize_bn(model, rng):
    """Give BatchNorm non-trivial moving stats so the test catches mistakes."""
    for layer in model.layers:
        if isinstance(layer, keras.layers.BatchNormalization):
            w = layer.get_weights()
            w[0] = rng.normal(1.0, 0.2, w[0].shape).astype(np.float32)  # gamma
            w[1] = rng.normal(0.0, 0.2, w[1].shape).astype(np.float32)  # beta
            w[2] = rng.normal(0.0, 0.5, w[2].shape).astype(np.float32)  # mean
            w[3] = rng.uniform(0.5, 2.0, w[3].shape).astype(np.float32)  # var
            layer.set_weights(w)


@pytest.mark.parametrize("maker", [_timed_like_keras, _functional_keras])
def test_h5_import_parity(tmp_path, maker):
    rng = np.random.default_rng(0)
    kmodel = maker()
    _randomize_bn(kmodel, rng)
    path = tmp_path / "model.h5"
    kmodel.save(path)

    x = rng.random((4, 21, 21, 21, 5)).astype(np.float32)
    ref = kmodel.predict(x, verbose=0)

    jmodel = load_keras_model(path)
    out = np.asarray(jax.jit(jmodel)(jnp.asarray(x)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5, rtol=1e-4)


def test_h5_import_n_classes(tmp_path):
    kmodel = _timed_like_keras(n_classes=338)
    path = tmp_path / "rot.h5"
    kmodel.save(path)
    jmodel = load_keras_model(path)
    assert jmodel.n_classes == 338


def test_h5_import_bf16_close(tmp_path):
    """bfloat16 compute stays within coarse tolerance of f32 (MXU path)."""
    rng = np.random.default_rng(1)
    kmodel = _timed_like_keras()
    _randomize_bn(kmodel, rng)
    path = tmp_path / "model.h5"
    kmodel.save(path)
    x = rng.random((2, 21, 21, 21, 5)).astype(np.float32)
    ref = np.asarray(load_keras_model(path)(jnp.asarray(x)))
    bf = np.asarray(load_keras_model(path, compute_dtype=jnp.bfloat16)(jnp.asarray(x)))
    np.testing.assert_allclose(bf, ref, atol=3e-2)
    np.testing.assert_array_equal(bf.argmax(1), ref.argmax(1))
