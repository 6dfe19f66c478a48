"""Engine + Keras-h5 importer integration: the reference's exact workflow.

Builds a small TIMED-shaped Keras model, saves it as `.h5` (exactly what the
reference distributes, README.md:100-104), then runs the full
`load_dataset_and_predict` pipeline over the 1ubq frame dataset with that
file — asserting our engine output equals the TF forward pass on the same
frames (the SURVEY north star: probability CSVs matching to float16
precision).
"""
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from timed_design_tpu.engine import load_dataset_and_predict
from timed_design_tpu.io import (
    FrameBatchLoader,
    create_flat_dataset_map,
    load_prediction_matrix,
)
from timed_design_tpu.voxel import make_frame_dataset


@pytest.fixture(scope="module")
def ubq_h5(tmp_path_factory):
    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    out = tmp_path_factory.mktemp("h5") / "data.hdf5"
    return make_frame_dataset([src], out, codec="CNOCACB")


@pytest.fixture(scope="module")
def keras_h5(tmp_path_factory):
    keras = tf.keras
    m = keras.Sequential()
    m.add(keras.layers.Input(shape=(21, 21, 21, 5)))
    for f in (8, 16):
        m.add(keras.layers.Conv3D(f, 3, padding="same"))
        m.add(keras.layers.ELU())
        m.add(keras.layers.BatchNormalization())
    m.add(keras.layers.Conv3D(20, 1, padding="same"))
    m.add(keras.layers.GlobalAveragePooling3D())
    m.add(keras.layers.Softmax())
    path = tmp_path_factory.mktemp("model") / "TIMED_small.h5"
    m.save(path)
    return path, m


def test_engine_with_keras_h5(tmp_path, ubq_h5, keras_h5):
    h5_path, kmodel = keras_h5
    result = load_dataset_and_predict(
        [str(h5_path)], ubq_h5, batch_size=32,
        path_to_output=tmp_path, dataset_map_path=tmp_path / "datasetmap.txt",
    )
    assert "1ubqA" in result.pdb_to_sequence
    seq = result.pdb_to_sequence["1ubqA"]
    assert len(seq) == 76

    # Parity against the TF forward on the same frames, to f16 precision
    # (our CSV preserves the reference's float16 cast, utils.py:768)
    dmap, _ = create_flat_dataset_map(ubq_h5)
    X = np.concatenate([x[:n] for x, _, n in FrameBatchLoader(ubq_h5, dmap, 32)])
    ref = kmodel.predict(X, verbose=0)
    ours = load_prediction_matrix(tmp_path / "TIMED_small.csv")
    np.testing.assert_allclose(ours, ref.astype(np.float16), atol=2e-3)
    # argmax parity wherever the decision margin exceeds the float16
    # rounding tolerance (random-weight outputs are near-uniform, so
    # exact-tie rows can legitimately flip under the reference's f16 cast)
    top2 = np.sort(ref, axis=1)[:, -2:]
    decided = (top2[:, 1] - top2[:, 0]) > 2e-3
    if decided.any():
        assert (ours.argmax(1)[decided] == ref.argmax(1)[decided]).all()


def test_engine_multi_model_ensemble(tmp_path, ubq_h5, keras_h5):
    """Reference supports a models list (predict.py:114): every model gets
    its own artifact set; encoded_labels written once."""
    h5_path, _ = keras_h5
    import shutil

    h5_b = tmp_path / "TIMED_b.h5"
    shutil.copy(h5_path, h5_b)
    load_dataset_and_predict(
        [str(h5_path), str(h5_b)], ubq_h5, batch_size=32,
        path_to_output=tmp_path, dataset_map_path=tmp_path / "datasetmap.txt",
    )
    assert (tmp_path / "TIMED_small.csv").exists()
    assert (tmp_path / "TIMED_b.csv").exists()
    assert (tmp_path / "TIMED_small.fasta").exists()
    assert (tmp_path / "TIMED_b.fasta").exists()
    # labels written once (76 rows, not 152)
    labels = (tmp_path / "encoded_labels.csv").read_text().strip().splitlines()
    assert len(labels) == 76
