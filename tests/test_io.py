"""IO layer: datasetmap formats, writers, h5 ingest, decoding."""
from pathlib import Path

import numpy as np
import pytest

from timed_design_tpu.io import (
    DatasetMap,
    FrameBatchLoader,
    FrameDatasetMetadata,
    create_flat_dataset_map,
    extract_sequences,
    load_datasetmap,
    load_prediction_matrix,
    save_datasetmap,
    save_dict_to_fasta,
    save_prediction_csv,
    save_sampled,
    save_srb_datasetmap,
)
from timed_design_tpu.voxel import make_frame_dataset


@pytest.fixture(scope="module")
def ubq_h5(tmp_path_factory):
    from pathlib import Path

    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    out = tmp_path_factory.mktemp("h5") / "data.hdf5"
    return make_frame_dataset([src], out, codec="CNOCBCA")


def test_flat_dataset_map(ubq_h5):
    dmap, pdbs = create_flat_dataset_map(ubq_h5)
    assert pdbs == {"1ubq"}
    assert dmap.n_residues == 76
    assert dmap.entries[0] == ("1ubq", "A", "1", "MET")
    # numerically sorted residue ids
    ids = [int(e[2]) for e in dmap.entries]
    assert ids == sorted(ids)


def test_blacklist_filtering(ubq_h5):
    with pytest.raises(ValueError):
        create_flat_dataset_map(ubq_h5, filter_list=["1ubq"])
    with pytest.warns(UserWarning):
        dmap, pdbs = create_flat_dataset_map(
            ubq_h5, filter_list=["1ubq"], remove_blacklist_silently=True
        )
    assert dmap.n_residues == 0


def test_metadata(ubq_h5):
    meta = FrameDatasetMetadata.from_file(ubq_h5)
    assert meta.frame_dims == (21, 21, 21, 5)
    assert meta.voxels_as_gaussian
    assert meta.atom_encoder == ["C", "N", "O", "CB", "CA"]


def test_batch_loader(ubq_h5):
    dmap, _ = create_flat_dataset_map(ubq_h5)
    loader = FrameBatchLoader(ubq_h5, dmap, batch_size=32)
    assert loader.n_batches == 3
    batches = list(loader)
    assert len(batches) == 3
    X, y, n = batches[0]
    assert X.shape == (32, 21, 21, 21, 5) and y.shape == (32, 20) and n == 32
    # last batch padded: 76 = 32+32+12
    X2, y2, n2 = batches[2]
    assert n2 == 12
    assert (X2[12:] == 0).all()
    # labels are one-hot; first residue is MET (index 10)
    assert y[0].sum() == 1 and y[0][10] == 1


def test_datasetmap_roundtrip(tmp_path, ubq_h5):
    dmap, _ = create_flat_dataset_map(ubq_h5)
    p = save_datasetmap(dmap, tmp_path / "datasetmap.txt")
    loaded = load_datasetmap(p, is_old=True)
    assert loaded.entries == dmap.entries

    srb = save_srb_datasetmap(dmap, "TIMED", tmp_path)
    text = srb.read_text()
    assert text.startswith("ignore_uncommon False\ninclude_pdbs\n##########\n")
    assert "1ubqA 76" in text
    loaded_new = load_datasetmap(srb)
    assert loaded_new.counts == [("1ubqA", 76)]
    assert loaded_new.n_residues == 76


def test_prediction_csv_float16_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    probs = rng.random((5, 20))
    probs /= probs.sum(1, keepdims=True)
    p = save_prediction_csv(probs, "TIMED", tmp_path, float16=True)
    assert p.name == "TIMED.csv"
    back = load_prediction_matrix(p)
    # float16 quirk: roundtrip matches the float16 cast, not the original
    np.testing.assert_allclose(back, probs.astype(np.float16).astype(np.float64))
    # rotamer naming (fixes reference predict.py:123 f-string bug)
    p2 = save_prediction_csv(probs, "TIMED", tmp_path, rotamer=True)
    assert p2.name == "TIMED_rot.csv"


def test_float16_csv_fast_writer_byte_parity():
    """The table-gather float16 CSV writer must be byte-identical to
    np.savetxt('%.18e') — including zeros, ones, subnormals, and the f16
    max; negatives/non-finite rows must refuse (caller falls back)."""
    import io as _io

    from timed_design_tpu.io.writers import write_float16_csv

    rng = np.random.default_rng(3)
    cases = [
        rng.random((40, 20)),
        np.array([[0.0, 1.0, 6e-8, 65504.0, 5.96e-8, 0.1]]),  # edges
        np.full((3, 5), 1 / 3),
    ]
    for data in cases:
        f16 = np.asarray(data, np.float16)
        buf_ref = _io.BytesIO()
        np.savetxt(buf_ref, f16, delimiter=",")
        buf_fast = _io.BytesIO()
        assert write_float16_csv(buf_fast, data)
        assert buf_fast.getvalue() == buf_ref.getvalue()
        # the memory-bounding row chunking (exercise a chunk boundary that
        # does NOT divide the row count) must not change a byte
        for chunk in (1, 3):
            buf_chunked = _io.BytesIO()
            assert write_float16_csv(buf_chunked, data, rows_per_chunk=chunk)
            assert buf_chunked.getvalue() == buf_ref.getvalue()
    for bad in (np.array([[0.5, -0.1]]), np.array([[np.nan, 0.5]]),
                np.array([[np.inf, 0.5]])):
        buf = _io.BytesIO()
        assert not write_float16_csv(buf, bad)
        assert buf.getvalue() == b""


def test_e18_csv_native_writer_byte_parity():
    """The native %.18e formatter (rotamer mode streams full-precision
    matrices; np.savetxt's per-cell Python formatting dominated the engine's
    host cost at benchmark scale) must be byte-identical to np.savetxt —
    correctly-rounded digits included — and refuse anything outside the
    fixed-width fast path BEFORE writing a byte."""
    import io as _io

    from timed_design_tpu.io.fast_fmt import native_available, write_e18_csv

    if not native_available():
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(7)
    cases = [
        rng.random((97, 338)).astype(np.float32),
        rng.random((40, 20)),  # float64
        np.array([[0.0, 1.0, 1 / 3, 0.1, 6e-8, 65504.0, 5.96e-8,
                   1e-37, 3.3e38]], np.float32),
        np.exp(rng.uniform(-220, 220, (50, 7))),  # wide f64 exponents
        np.array([[1e-98, 1e99, 0.0, 1e-45]]),  # fast-path bounds
    ]
    for i, data in enumerate(cases):
        buf_ref = _io.BytesIO()
        np.savetxt(buf_ref, data, delimiter=",")
        buf_fast = _io.BytesIO()
        assert write_e18_csv(buf_fast, data), i
        assert buf_fast.getvalue() == buf_ref.getvalue(), i
    for bad in (np.array([[0.5, -0.1]]), np.array([[np.nan, 1.0]]),
                np.array([[np.inf, 1.0]]), np.array([[1e-200, 1.0]]),
                np.array([[1e101]])):  # 3-digit exponents refuse too
        buf = _io.BytesIO()
        assert not write_e18_csv(buf, bad)
        assert buf.getvalue() == b""


def test_int_csv_fast_writer_byte_parity():
    """The digit-table int writer (encoded_labels.csv one-hots) must match
    np.savetxt(fmt='%i') bytes and refuse multi-digit/negative/float data."""
    import io as _io

    from timed_design_tpu.io.writers import write_int_csv

    rng = np.random.default_rng(11)
    lab = np.zeros((100, 23), np.int64)
    lab[np.arange(100), rng.integers(0, 23, 100)] = 1
    for data in (lab, rng.integers(0, 10, (7, 4)).astype(np.int32)):
        buf_ref = _io.BytesIO()
        np.savetxt(buf_ref, data, delimiter=",", fmt="%i")
        buf_fast = _io.BytesIO()
        assert write_int_csv(buf_fast, data)
        assert buf_fast.getvalue() == buf_ref.getvalue()
    for bad in (np.array([[10, 1]]), np.array([[-1, 1]]),
                np.array([[0.5, 1.0]])):
        buf = _io.BytesIO()
        assert not write_int_csv(buf, bad)
        assert buf.getvalue() == b""


def test_fasta_writer(tmp_path):
    p = save_dict_to_fasta({"1abcA": "MKV", "2xyzB": "GG"}, "TIMED", tmp_path)
    assert p.read_text() == ">1abcA\nMKV\n>2xyzB\nGG\n"


def test_consensus_writer_idempotent(tmp_path):
    """Re-running a prediction into the same output dir must not append a
    second copy of the consensus matrix: the txt count header and the csv
    row count have to stay in sync."""
    from timed_design_tpu.io import save_consensus_probs

    probs = {"1abc": np.full((3, 20), 0.05), "2xyz": np.full((2, 20), 0.05)}
    save_consensus_probs(probs, "TIMED", tmp_path)
    path_txt, path_csv = save_consensus_probs(probs, "TIMED", tmp_path)
    n_rows = len(path_csv.read_text().strip().splitlines())
    assert n_rows == 5  # not 10
    assert "1abc 3" in path_txt.read_text()


def test_save_sampled(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    samples = {"1abcA": [("MKV", 0.5, 7.0, 375.2, 0), ("MAV", -0.5, 6.0, 333.0, 0)]}
    paths = save_sampled(samples, "out", mode="all")
    assert len(paths) == 3
    fasta = (tmp_path / "out.fasta").read_text()
    assert ">1abcA_0\nMKV\n>1abcA_1\nMAV\n" == fasta
    csv = (tmp_path / "out_metrics.csv").read_text().splitlines()
    assert csv[0] == "pdb,sequence,charge,isoelectric_point,molecular_weight,molar_extinction"
    assert csv[1].startswith("1abcA,MKV,0.5,7.0,")


def test_extract_sequences_new_map():
    # 5 residues over two chains, 20 classes
    P = np.zeros((5, 20))
    P[np.arange(5), [10, 0, 5, 8, 19]] = 1.0  # M A G K Y
    dmap = DatasetMap(counts=[("1abcA", 3), ("2xyzB", 2)])
    dec = extract_sequences(dmap, P)
    assert dec.pdb_to_sequence == {"1abcA": "MAG", "2xyzB": "KY"}
    assert dec.pdb_to_probability["1abcA"].shape == (3, 20)


def test_extract_sequences_old_map_and_real_seq():
    P = np.zeros((3, 20))
    P[:, 0] = 1.0  # AAA predicted
    dmap = DatasetMap(entries=[
        ("1abc", "A", "1", "MET"), ("1abc", "A", "2", "LYS"), ("1abc", "A", "3", "GLY"),
    ])
    dec = extract_sequences(dmap, P)
    assert dec.pdb_to_sequence == {"1abcA": "AAA"}
    assert dec.pdb_to_real_sequence == {"1abcA": "MKG"}


def test_extract_sequences_rotamer_categories():
    from timed_design_tpu.constants import ROTAMER_CATEGORIES

    P = np.zeros((2, 338))
    P[0, 0] = 1.0  # ALA_0
    P[1, 68] = 1.0  # LYS_1111
    dmap = DatasetMap(counts=[("1abcA", 2)])
    dec = extract_sequences(dmap, P, rotamer_categories=ROTAMER_CATEGORIES)
    assert dec.pdb_to_sequence == {"1abcA": "AK"}


def test_extract_sequences_consensus():
    P = np.zeros((4, 20))
    # state 0 prefers A (0.6), state 1 prefers C (0.8) -> consensus prefers C
    P[0] = P[1] = np.eye(20)[0] * 0.6 + np.eye(20)[1] * 0.4
    P[2] = P[3] = np.eye(20)[0] * 0.2 + np.eye(20)[1] * 0.8
    dmap = DatasetMap(counts=[("1abc_0A", 2), ("1abc_1A", 2)])
    dec = extract_sequences(dmap, P, is_consensus=True)
    assert dec.pdb_to_consensus == {"1abc": "CC"}
    np.testing.assert_allclose(
        dec.pdb_to_consensus_prob["1abc"][0][:2], [0.4, 0.6]
    )


# ---------------------------------------------------------- flat layout


@pytest.fixture(scope="module")
def ubq_flat_h5(tmp_path_factory):
    from pathlib import Path

    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    out = tmp_path_factory.mktemp("h5flat") / "data_flat.hdf5"
    return make_frame_dataset([src], out, codec="CNOCBCA", layout="flat")


def test_flat_layout_matches_tree(ubq_h5, ubq_flat_h5):
    """Writer parity: flat and tree datasets hold identical frames/labels
    in identical map order."""
    dm_tree, _ = create_flat_dataset_map(ubq_h5)
    dm_flat, _ = create_flat_dataset_map(ubq_flat_h5)
    assert dm_tree.entries == dm_flat.entries

    batches_t = list(FrameBatchLoader(ubq_h5, dm_tree, batch_size=32))
    batches_f = list(FrameBatchLoader(ubq_flat_h5, dm_flat, batch_size=32))
    assert len(batches_t) == len(batches_f)
    for (Xt, yt, nt), (Xf, yf, nf) in zip(batches_t, batches_f):
        assert nt == nf
        np.testing.assert_array_equal(Xt, Xf)
        np.testing.assert_array_equal(yt, yf)


def test_convert_to_flat_roundtrip(ubq_h5, tmp_path):
    from timed_design_tpu.io import convert_to_flat

    dst = convert_to_flat(ubq_h5, tmp_path / "conv.hdf5")
    dm_src, _ = create_flat_dataset_map(ubq_h5)
    dm_dst, _ = create_flat_dataset_map(dst)
    assert dm_src.entries == dm_dst.entries
    for (Xs, ys, ns), (Xd, yd, nd) in zip(
        FrameBatchLoader(ubq_h5, dm_src, batch_size=64),
        FrameBatchLoader(dst, dm_dst, batch_size=64),
    ):
        np.testing.assert_array_equal(Xs, Xd)
        np.testing.assert_array_equal(ys, yd)


def test_flat_loader_reordered_map(ubq_flat_h5):
    """A user-supplied (non-row-order) map reads via the fancy-index path
    and returns frames matching the per-entry tree semantics."""
    dmap, _ = create_flat_dataset_map(ubq_flat_h5)
    rev = DatasetMap(entries=list(reversed(dmap.entries)))
    fwd = np.concatenate(
        [X[:n] for X, _, n in FrameBatchLoader(ubq_flat_h5, dmap, batch_size=32)]
    )
    bwd = np.concatenate(
        [X[:n] for X, _, n in FrameBatchLoader(ubq_flat_h5, rev, batch_size=32)]
    )
    np.testing.assert_array_equal(fwd, bwd[::-1])


def test_flat_loader_start_batch_resume(ubq_flat_h5):
    dmap, _ = create_flat_dataset_map(ubq_flat_h5)
    full = list(FrameBatchLoader(ubq_flat_h5, dmap, batch_size=32))
    resumed = list(
        FrameBatchLoader(ubq_flat_h5, dmap, batch_size=32, start_batch=2)
    )
    assert len(full) == 3 and len(resumed) == 1
    np.testing.assert_array_equal(full[2][0], resumed[0][0])


def test_convert_to_flat_bf16_matches_wire_cast(ubq_h5, tmp_path):
    """bfloat16 flat storage yields exactly the values the engine's own
    bf16 wire cast of float32 frames produces (Predictor.to_device) — the
    numerically-free claim behind the ~2.6x loader speedup."""
    import ml_dtypes

    from timed_design_tpu.io import convert_to_flat

    f32 = convert_to_flat(ubq_h5, tmp_path / "f32.hdf5")
    bf16 = convert_to_flat(
        ubq_h5, tmp_path / "bf16.hdf5", frame_dtype="bfloat16"
    )
    dm32, _ = create_flat_dataset_map(f32)
    dm16, _ = create_flat_dataset_map(bf16)
    assert dm32.entries == dm16.entries
    for (X32, y32, n32), (X16, y16, n16) in zip(
        FrameBatchLoader(f32, dm32, batch_size=32),
        FrameBatchLoader(bf16, dm16, batch_size=32),
    ):
        assert n32 == n16
        assert X16.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(X32.astype(ml_dtypes.bfloat16), X16)
        np.testing.assert_array_equal(y32, y16)


def test_flat_contiguous_serves_mmap_views(ubq_h5, tmp_path):
    """convert_to_flat writes /frames contiguous; the loader then serves
    full in-order batches as zero-copy views into the file mapping (the
    page-cache read happens inside the pipelined H2D transfer, not as a
    host memcpy stage)."""
    import h5py

    from timed_design_tpu.io import convert_to_flat

    dst = convert_to_flat(ubq_h5, tmp_path / "contig.hdf5")
    with h5py.File(dst) as f:
        assert f["frames"].chunks is None  # contiguous => mmap-able
    dmap, _ = create_flat_dataset_map(dst)
    batches = list(FrameBatchLoader(dst, dmap, batch_size=32))
    assert [n for _, _, n in batches] == [32, 32, 12]
    full = batches[0][0]
    assert not full.flags.owndata  # a view, not a copy
    assert isinstance(full.base, np.memmap) or isinstance(
        getattr(full.base, "base", None), np.memmap
    )
    tail = batches[2][0]
    assert tail.shape[0] == 32 and tail.flags.owndata  # padded copy
    # values match the chunked (read_direct) flat path exactly
    chunked = make_frame_dataset(
        [Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"],
        tmp_path / "chunked.hdf5", codec="CNOCBCA", layout="flat",
    )
    dmc, _ = create_flat_dataset_map(chunked)
    for (Xa, ya, na), (Xb, yb, nb) in zip(
        batches, FrameBatchLoader(chunked, dmc, batch_size=32)
    ):
        np.testing.assert_array_equal(Xa[:na], Xb[:nb])
        np.testing.assert_array_equal(ya, yb)


def test_make_frame_dataset_flat_bf16(tmp_path):
    """The voxelizer's flat writer stores bf16 frames (uint16 bits + attr)
    that load as the f32 layout's frames cast to bf16."""
    import h5py
    import ml_dtypes

    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    f32 = make_frame_dataset([src], tmp_path / "f32.hdf5", codec="CNOCBCA",
                             layout="flat")
    b16 = make_frame_dataset([src], tmp_path / "b16.hdf5", codec="CNOCBCA",
                             layout="flat", frame_dtype="bfloat16")
    with h5py.File(b16) as f:
        assert f["frames"].dtype == np.uint16
        assert str(f.attrs["frame_dtype"]) == "bfloat16"
    dm32, _ = create_flat_dataset_map(f32)
    dm16, _ = create_flat_dataset_map(b16)
    for (X32, _, _), (X16, _, _) in zip(
        FrameBatchLoader(f32, dm32, batch_size=32),
        FrameBatchLoader(b16, dm16, batch_size=32),
    ):
        assert X16.dtype == ml_dtypes.bfloat16
        np.testing.assert_array_equal(X32.astype(ml_dtypes.bfloat16), X16)


def test_frame_dtype_validation(tmp_path, ubq_h5):
    from timed_design_tpu.io import convert_to_flat

    src = Path(__file__).parent / "testing_files" / "1ubq.pdb1.gz"
    with pytest.raises(ValueError, match="frame_dtype"):
        convert_to_flat(ubq_h5, tmp_path / "x.hdf5", frame_dtype="int8")
    with pytest.raises(ValueError, match="frame_dtype"):
        make_frame_dataset([src], tmp_path / "y.hdf5", layout="tree",
                           frame_dtype="bfloat16")


def test_convert_dataset_cli(ubq_h5, tmp_path, monkeypatch):
    from timed_design_tpu.cli.convert_dataset import main as convert_main

    dst = tmp_path / "flat.hdf5"
    convert_main([str(ubq_h5), str(dst)])
    dm, _ = create_flat_dataset_map(dst)
    assert len(dm.entries) == 76


# ------------------------------------------------------ native inflate pool


def test_inflate_many_native_matches_zlib():
    import zlib

    from timed_design_tpu.io.fast_inflate import inflate_many, native_available

    rng = np.random.default_rng(0)
    arrays = [rng.random((21, 21, 21, 5)).astype(np.float32) for _ in range(7)]
    srcs = [zlib.compress(a.tobytes()) for a in arrays]
    dsts = [np.empty_like(a) for a in arrays]
    inflate_many(srcs, dsts)
    for a, d in zip(arrays, dsts):
        np.testing.assert_array_equal(a, d)
    if not native_available():  # parity below still runs via the fallback
        pytest.skip("no C++ toolchain: native inflate pool unavailable")

    with pytest.raises(ValueError):
        inflate_many([b"not a zlib stream"], [np.empty(4, np.float32)])


def test_loader_native_inflate_matches_h5py(ubq_h5):
    """Tree-layout batches via the raw-chunk + native-inflate path must be
    bit-identical to plain h5py reads."""
    dmap, _ = create_flat_dataset_map(ubq_h5)
    fast = list(FrameBatchLoader(ubq_h5, dmap, batch_size=32))
    plain = list(
        FrameBatchLoader(ubq_h5, dmap, batch_size=32, native_inflate=False)
    )
    assert len(fast) == len(plain) == 3
    for (Xf, yf, nf), (Xp, yp, np_) in zip(fast, plain):
        assert nf == np_
        np.testing.assert_array_equal(Xf, Xp)
        np.testing.assert_array_equal(yf, yp)


def test_loader_raw_chunk_path_actually_engages(ubq_h5, tmp_path):
    """Guard against the fast path silently degrading to h5py reads."""
    import h5py

    with h5py.File(ubq_h5) as f:
        pdb = next(iter(f))
        chain = next(iter(f[pdb]))
        rid = next(iter(f[pdb][chain]))
        node = f[pdb][chain][rid]
        raws = FrameBatchLoader._raw_gzip_chunks(node)
        assert raws is not None
        assert sum(len(r) for _, r in raws) < node.nbytes  # actually compressed
        # our writer emits one whole-frame chunk
        assert len(raws) == 1 and raws[0][0] == (0, 0, 0, 0)
    # uncompressed dataset -> no raw path
    with h5py.File(tmp_path / "nocomp.hdf5", "w") as f:
        d = f.create_dataset("x", data=np.zeros((4, 4), np.float32))
        assert FrameBatchLoader._raw_gzip_chunks(d) is None


def test_loader_native_inflate_multichunk_autochunked(tmp_path, ubq_h5):
    """Foreign files (h5py/aposteriori auto-chunking splits one frame into
    ~32 chunks, incl. clipped edge chunks) must read identically through
    the multi-chunk assembly path."""
    import h5py

    dst = tmp_path / "auto.hdf5"
    with h5py.File(ubq_h5) as fin, h5py.File(dst, "w") as fout:
        for k, v in fin.attrs.items():
            fout.attrs[k] = v
        for pdb in fin:
            for ch in fin[pdb]:
                for rid in fin[pdb][ch]:
                    node = fin[pdb][ch][rid]
                    d = fout.create_dataset(
                        f"{pdb}/{ch}/{rid}", data=node[()], compression="gzip"
                    )  # default auto-chunking -> multi-chunk
                    for k, v in node.attrs.items():
                        d.attrs[k] = v
    with h5py.File(dst) as f:
        node = f["1ubq"]["A"]["1"]
        assert len(FrameBatchLoader._raw_gzip_chunks(node)) > 1
    dmap, _ = create_flat_dataset_map(dst)
    fast_loader = FrameBatchLoader(dst, dmap, batch_size=32)
    fast_loader._native_multichunk = True  # engages only on >2-core hosts
    fast = list(fast_loader)
    plain = list(FrameBatchLoader(dst, dmap, batch_size=32, native_inflate=False))
    for (Xf, yf, _), (Xp, yp, _) in zip(fast, plain):
        np.testing.assert_array_equal(Xf, Xp)
        np.testing.assert_array_equal(yf, yp)


def test_inflate_many_concurrent_callers():
    """inflate_pool_run must be reentrancy-safe: concurrent loader producer
    threads in one process share the module-global pool."""
    import threading
    import zlib

    from timed_design_tpu.io.fast_inflate import inflate_many

    rng = np.random.default_rng(1)
    arrays = [rng.random((21, 21, 21, 5)).astype(np.float32) for _ in range(8)]
    srcs = [zlib.compress(a.tobytes()) for a in arrays]
    errors = []

    def work():
        try:
            for _ in range(20):
                dsts = [np.empty_like(a) for a in arrays]
                inflate_many(srcs, dsts)
                for a, d in zip(arrays, dsts):
                    np.testing.assert_array_equal(a, d)
        except Exception as e:  # pragma: no cover - failure reporting
            errors.append(e)

    threads = [threading.Thread(target=work) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
        assert not t.is_alive(), "inflate pool deadlocked"
    assert not errors, errors


def test_loader_surfaces_producer_errors(ubq_flat_h5):
    """A dataset-map entry absent from the flat file must raise in the
    consumer, not hang it (the producer thread dies otherwise)."""
    dmap, _ = create_flat_dataset_map(ubq_flat_h5)
    bad = DatasetMap(entries=dmap.entries + [("zzzz", "Z", "1", "ALA")])
    with pytest.raises(KeyError):
        list(FrameBatchLoader(ubq_flat_h5, bad, batch_size=32))


def test_flat_rows_identity_fast_path(ubq_flat_h5):
    """Maps from create_flat_dataset_map carry row-identity provenance; the
    loader must use arange instead of the O(N) key dict."""
    import h5py

    dmap, _ = create_flat_dataset_map(ubq_flat_h5)
    assert dmap.row_identity_for == str(ubq_flat_h5.resolve())
    loader = FrameBatchLoader(ubq_flat_h5, dmap, batch_size=32)
    with h5py.File(ubq_flat_h5) as f:
        rows = loader._flat_rows(f)
    np.testing.assert_array_equal(rows, np.arange(76))
    # a reordered user map loses provenance -> lookup path
    rev = DatasetMap(entries=list(reversed(dmap.entries)))
    loader2 = FrameBatchLoader(ubq_flat_h5, rev, batch_size=32)
    with h5py.File(ubq_flat_h5) as f:
        rows2 = loader2._flat_rows(f)
    np.testing.assert_array_equal(rows2, np.arange(76)[::-1])


def test_loader_shuffle_per_epoch(ubq_flat_h5, ubq_h5):
    """shuffle=True permutes residues globally with a fresh order each
    epoch; the (frame, label) pairing must survive (flat AND tree)."""
    for path in (ubq_flat_h5, ubq_h5):
        dmap, _ = create_flat_dataset_map(path)
        base = FrameBatchLoader(path, dmap, batch_size=76)
        X0, y0, _ = next(iter(base))
        loader = FrameBatchLoader(path, dmap, batch_size=76, shuffle=True,
                                  shuffle_seed=7)
        X1, y1, _ = next(iter(loader))
        X2, y2, _ = next(iter(loader))  # second epoch: different order
        assert not np.array_equal(X1, X0)
        assert not np.array_equal(X2, X1)
        # same multiset of frames, and pairing preserved: match each
        # shuffled frame back to its original index via exact equality
        def key(X):
            return {X[i].tobytes(): i for i in range(76)}

        k0 = key(X0)
        for Xs, ys in ((X1, y1), (X2, y2)):
            for i in range(76):
                j = k0[Xs[i].tobytes()]
                np.testing.assert_array_equal(ys[i], y0[j])


def test_residue_sort_key_insertion_codes():
    """One '100A'-style id must not demote the chain to lexicographic order
    ('10' < '2')."""
    from timed_design_tpu.io.h5frames import _residue_sort_key

    ids = ["100A", "2", "10", "100", "9", "100B", "-1"]
    assert sorted(ids, key=_residue_sort_key) == [
        "-1", "2", "9", "10", "100", "100A", "100B"
    ]


def test_tree_map_order_with_insertion_codes(tmp_path):
    """create_flat_dataset_map orders '100A' after '100' and numerically
    throughout, even though int('100A') raises."""
    import h5py

    p = tmp_path / "ins.hdf5"
    with h5py.File(p, "w") as f:
        ch = f.create_group("1abc").create_group("A")
        for rid in ["2", "10", "100", "100A", "9"]:
            d = ch.create_dataset(rid, data=np.zeros((2, 2, 2, 2), np.float32))
            d.attrs["label"] = "ALA"
    dmap, _ = create_flat_dataset_map(p)
    assert [rid for _, _, rid, _ in dmap.entries] == [
        "2", "9", "10", "100", "100A"
    ]


def test_flat_map_unknown_label_raises(tmp_path):
    """The flat layout must fail as loudly as the tree layout on labels that
    are neither standard nor in UNCOMMON_RESIDUE_DICT."""
    import h5py

    p = tmp_path / "bad.hdf5"
    with h5py.File(p, "w") as f:
        f.attrs["layout"] = "flat"
        f.create_dataset("frames", data=np.zeros((1, 2, 2, 2, 2), np.float32))
        f.create_dataset("labels", data=np.zeros((1, 20), np.int8))
        st = h5py.string_dtype()
        f.create_dataset("index_pdb", data=["1abc"], dtype=st)
        f.create_dataset("index_chain", data=["A"], dtype=st)
        f.create_dataset("index_residue", data=["1"], dtype=st)
        f.create_dataset("index_label", data=["ZZZ"], dtype=st)
    with pytest.raises(ValueError, match="natural amino acid"):
        create_flat_dataset_map(p)


def test_loader_shuffle_resume_incompatible(ubq_h5):
    dmap, _ = create_flat_dataset_map(ubq_h5)
    with pytest.raises(ValueError, match="incompatible with shuffle"):
        FrameBatchLoader(ubq_h5, dmap, batch_size=8, start_batch=2,
                         shuffle=True)


def test_loader_early_break_stops_producer(ubq_h5):
    """Abandoning the iterator mid-stream must terminate the prefetch
    thread (it previously blocked forever in q.put, leaking the thread and
    an open HDF5 read handle)."""
    import threading
    import time

    dmap, _ = create_flat_dataset_map(ubq_h5)
    before = set(threading.enumerate())
    loader = FrameBatchLoader(ubq_h5, dmap, batch_size=8, prefetch=1)
    it = iter(loader)
    next(it)
    it.close()  # GeneratorExit -> finally: cancel + join
    deadline = time.time() + 5.0
    while time.time() < deadline:
        extra = [t for t in set(threading.enumerate()) - before if t.is_alive()]
        if not extra:
            break
        time.sleep(0.05)
    assert not extra, f"leaked threads: {extra}"


def test_srb_counts_strip_all_state_suffixes():
    """to_counts strips ANY trailing _<digits> state (the reference's
    '"_0" in pdb' substring test left _1.._9 rows under chainless keys
    like '1abc_1', inconsistent with state 0's '1abcA' — PARITY.md)."""
    entries = [(f"1abc_{i}", "A", str(r), "ALA")
               for i in range(3) for r in range(4)]
    # a mid-string _0 is NOT a state suffix: the name stays whole
    entries += [("ts_02x", "B", "1", "GLY")]
    counts = dict(DatasetMap(entries=entries).to_counts())
    assert counts == {"1abcA": 12, "ts_02x": 1}


def test_consensus_groups_per_chain():
    """Multi-chain NMR: states consense PER CHAIN (the reference's
    split('_')[0] silently averaged chain A's and chain B's matrices
    together); single-chain structures keep the reference's bare-base
    output key."""
    from timed_design_tpu.io import extract_sequences

    # two states x two chains, 4 residues each; chain A peaked on class 0,
    # chain B on class 1 — a cross-chain merge would blur both
    counts = [("2dim_0A", 4), ("2dim_0B", 4), ("2dim_1A", 4), ("2dim_1B", 4),
              ("3soloA", 2)]
    n = sum(c for _, c in counts)
    P = np.zeros((n, 20), np.float32)
    P[0:4, 0] = 1.0    # _0A
    P[4:8, 1] = 1.0    # _0B
    P[8:12, 0] = 1.0   # _1A
    P[12:16, 1] = 1.0  # _1B
    P[16:18, 2] = 1.0  # 3soloA
    res = extract_sequences(DatasetMap(counts=counts), P, is_consensus=True)
    assert set(res.pdb_to_consensus) == {"2dimA", "2dimB", "3soloA"}
    assert res.pdb_to_consensus["2dimA"] == "AAAA"  # class 0 = A
    assert res.pdb_to_consensus["2dimB"] == "CCCC"  # class 1 = C
    np.testing.assert_array_equal(
        res.pdb_to_consensus_prob["2dimA"], P[0:4]
    )


def test_convert_to_flat_preserves_soft_labels(tmp_path, ubq_h5):
    """Float (soft) encoded_residue attrs survive tree->flat conversion —
    an int8 cast would truncate every fractional value to 0."""
    import shutil

    import h5py

    from timed_design_tpu.io.h5frames import convert_to_flat

    src = tmp_path / "soft.hdf5"
    shutil.copy(ubq_h5, src)
    soft = np.full(20, 0.05, np.float32)
    with h5py.File(src, "r+") as f:
        pdb = next(iter(f))
        chain = next(iter(f[pdb]))
        rid = next(iter(f[pdb][chain]))
        f[pdb][chain][rid].attrs["encoded_residue"] = soft
    dst = convert_to_flat(src, tmp_path / "soft_flat.hdf5")
    with h5py.File(dst, "r") as f:
        labels = f["labels"][()]
    assert labels.dtype == np.float32
    np.testing.assert_allclose(labels[0], soft, atol=1e-7)
    # the rest stay one-hot
    assert (labels[1:].sum(1) == 1).all()


def test_flat_blacklist_warns_like_tree(tmp_path, ubq_flat_h5):
    """Blacklist removals on a FLAT dataset emit the same per-pdb warning
    the tree branch does (observability must not depend on file layout)."""
    import pytest as _pytest

    with _pytest.warns(UserWarning, match="benchmark set; removed"):
        dmap, _ = create_flat_dataset_map(
            ubq_flat_h5, ["1ubq"], remove_blacklist_silently=True
        )
    assert dmap.entries == []


def test_loader_prefetch_zero_is_bounded(ubq_h5, monkeypatch):
    """prefetch=0 must still iterate correctly — and means 'minimal
    readahead', not the stdlib Queue(0)='unbounded' footgun that would
    buffer the whole dataset on host. The maxsize actually passed to the
    queue is recorded and asserted (iteration alone cannot distinguish
    bounded from unbounded on a small fixture)."""
    import queue as _queue

    import timed_design_tpu.io.h5frames as h5frames_mod

    seen_maxsize = []

    class RecordingQueue(_queue.Queue):
        def __init__(self, maxsize=0):
            seen_maxsize.append(maxsize)
            super().__init__(maxsize)

    monkeypatch.setattr(h5frames_mod.queue, "Queue", RecordingQueue)
    dmap, _ = create_flat_dataset_map(ubq_h5)
    loader = FrameBatchLoader(ubq_h5, dmap, batch_size=32, prefetch=0)
    batches = list(loader)
    assert sum(b[2] for b in batches) == 76
    assert seen_maxsize and all(m >= 1 for m in seen_maxsize), seen_maxsize


def test_consensus_key_collision_raises():
    """Ambiguous grouping (multi-chain states emitting 'baseA' while a
    literal key 'baseA' also exists) must error, not silently drop one
    group's consensus."""
    from timed_design_tpu.io import extract_sequences

    counts = [("1abc_0A", 2), ("1abc_0B", 2), ("1abc_1A", 2),
              ("1abc_1B", 2), ("1abcA", 2)]
    n = sum(c for _, c in counts)
    P = np.full((n, 20), 1 / 20.0, np.float32)
    with pytest.raises(ValueError, match="consensus key collision"):
        extract_sequences(DatasetMap(counts=counts), P, is_consensus=True)
