"""CoalescingDesigner: concurrent design requests share device batches."""
import gzip
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np
import pytest


@pytest.fixture(scope="module")
def session():
    import jax

    from timed_design_tpu.engine import DesignSession
    from timed_design_tpu.models import timed

    module = timed(filters=(8,))
    variables = module.init(
        jax.random.key(0), np.zeros((1, 21, 21, 21, 5), np.float32)
    )
    return DesignSession(
        (module, variables), codec="CNOCACB", batch_size=80,
        compute_dtype="float32",
    )


@pytest.fixture(scope="module")
def ubq_structure(ubq_pdb_gz):
    from timed_design_tpu.structure import parse_pdb_string

    text = gzip.decompress(ubq_pdb_gz.read_bytes()).decode()
    return parse_pdb_string(text, name="query")[0]


def test_concurrent_requests_coalesce_and_match_serial(session, ubq_structure):
    """6 simultaneous requests: the worker is busy compiling on the first,
    so the rest queue up and ride one shared batch — and every request's
    probabilities equal the serial single-request result."""
    from timed_design_tpu.engine.coalescer import CoalescingDesigner

    ref_probs, _ = session.design(ubq_structure)  # serial ground truth
    designer = CoalescingDesigner(session)
    try:
        barrier = threading.Barrier(6)

        def one_request(_):
            barrier.wait()
            return designer.design(ubq_structure)

        with ThreadPoolExecutor(max_workers=6) as pool:
            results = list(pool.map(one_request, range(6)))

        for probs, fa, timings in results:
            assert probs.shape == (76, 20)
            np.testing.assert_allclose(
                np.asarray(probs), np.asarray(ref_probs), atol=1e-5
            )
            assert len(fa.labels) == 76
            assert timings["group_requests"] >= 1
        # the first request occupies the worker; the other 7 queue behind it
        # and must coalesce into (a) shared group(s)
        assert designer.stats["requests"] == 6
        assert designer.stats["max_group_requests"] >= 2
        assert designer.stats["groups"] < 6
        assert any(t["group_requests"] >= 2 for _, _, t in results)
    finally:
        designer.close()


def test_bad_structure_fails_only_its_own_request(session, ubq_structure):
    """A request whose voxelization fails must not poison the batch it
    rode in — the other requests still succeed."""
    from timed_design_tpu.engine.coalescer import CoalescingDesigner

    class Broken:
        # deliberately WITHOUT n_residues: the worker's drain loop must
        # survive a malformed structure (count it as 0) so only this
        # request's future fails, not every later request
        name = "broken"

    designer = CoalescingDesigner(session)
    try:
        barrier = threading.Barrier(4)

        def one_request(structure):
            barrier.wait()
            return designer.design(structure)

        with ThreadPoolExecutor(max_workers=4) as pool:
            futs = [
                pool.submit(one_request, s)
                for s in (ubq_structure, Broken(), ubq_structure, ubq_structure)
            ]
            ok, failed = [], []
            for f in futs:
                try:
                    ok.append(f.result(timeout=300))
                except Exception as e:  # noqa: BLE001
                    failed.append(e)
        assert len(ok) == 3 and len(failed) == 1
        for probs, fa, _ in ok:
            assert probs.shape == (76, 20)
    finally:
        designer.close()


def test_close_is_idempotent_and_pending_window(session, ubq_structure):
    """A designer with a collection window still serves a lone request
    (after at most the window), and close() can be called twice."""
    from timed_design_tpu.engine.coalescer import CoalescingDesigner

    designer = CoalescingDesigner(session, window_ms=20.0)
    probs, fa, timings = designer.design(ubq_structure)
    assert probs.shape == (76, 20)
    assert timings["group_requests"] == 1
    designer.close()
    designer.close()
    # a design() after close must fail fast, not hang on a future the
    # (exited) worker will never resolve
    with pytest.raises(RuntimeError, match="closed"):
        designer.design(ubq_structure)


def test_design_close_race_cannot_strand_a_future(session, ubq_structure):
    """Hammer design() from one thread while close() fires: every design
    call must either return a result or raise the closed error — never
    hang on a future enqueued behind the close sentinel (the race the
    _close_lock exists for)."""
    from timed_design_tpu.engine.coalescer import CoalescingDesigner

    for _ in range(5):
        designer = CoalescingDesigner(session)
        outcomes = []

        def caller():
            try:
                outcomes.append(designer.design(ubq_structure)[0].shape)
            except RuntimeError as e:
                outcomes.append(str(e))

        t = threading.Thread(target=caller)
        t.start()
        designer.close()
        # the whole point: the caller thread must terminate either way
        t.join(timeout=30)
        assert not t.is_alive(), "design() hung across close()"
        assert len(outcomes) == 1


def test_all_empty_group_returns_empty_results(session):
    """Concurrent requests whose structures voxelize to ZERO frames (no
    standard residues) must succeed with empty matrices — a packed group
    of empties used to die in np.concatenate over zero chunks."""
    from timed_design_tpu.engine.coalescer import CoalescingDesigner
    from timed_design_tpu.structure import parse_pdb_string

    # HETATM-only "structure": parses, yields no standard residues
    text = (
        "HETATM    1  C1  LIG A   1       0.000   0.000   0.000  1.00  0.00           C\n"
        "END\n"
    )
    s = parse_pdb_string(text, name="empty")[0]
    # window_ms>0 so the two requests reliably land in ONE group — with the
    # default 0 the worker can drain them one at a time through the solo
    # path and never exercise the packed total==0 guard this test pins
    designer = CoalescingDesigner(session, window_ms=50.0)
    try:
        barrier = threading.Barrier(2)

        def one(structure):
            barrier.wait()
            return designer.design(structure)

        with ThreadPoolExecutor(max_workers=2) as pool:
            results = [f.result(timeout=300)
                       for f in [pool.submit(one, s), pool.submit(one, s)]]
        for probs, fa, _ in results:
            assert probs.shape[0] == 0
        # prove the PACKED path ran (the regression lives there, not in
        # the solo predict_probs path)
        assert any(t["group_requests"] >= 2 for _, _, t in results)
    finally:
        designer.close()


def test_ensemble_designer_means_members(session, ubq_structure):
    """EnsembleDesigner: one voxelization, frames fanned to every member,
    result is the float64 mean of the members' probability matrices."""
    import jax

    from timed_design_tpu.engine import DesignSession
    from timed_design_tpu.engine.coalescer import (
        CoalescingDesigner,
        EnsembleDesigner,
    )
    from timed_design_tpu.models import timed

    module = timed(filters=(8,))
    variables = module.init(
        jax.random.key(7), np.zeros((1, 21, 21, 21, 5), np.float32)
    )
    session_b = DesignSession(
        (module, variables), codec="CNOCACB", batch_size=80,
        compute_dtype="float32",
    )
    a, b = CoalescingDesigner(session), CoalescingDesigner(session_b)
    try:
        ens = EnsembleDesigner([a, b])
        probs, fa, timings = ens.design(ubq_structure)
        pa, _ = session.design(ubq_structure)
        pb, _ = session_b.design(ubq_structure)
        want = (
            np.asarray(pa, np.float64) + np.asarray(pb, np.float64)
        ) / 2.0
        np.testing.assert_allclose(np.asarray(probs), want, atol=2e-6)
        # the mean is a real third model, not either member passed through
        assert not np.allclose(np.asarray(probs), np.asarray(pa), atol=1e-4)
        assert probs.shape == (76, 20)
        assert len(fa.labels) == 76
        assert timings["ensemble_members"] == 2
        assert ens.stats == {"requests": 1, "members": 2}
        # members saw exactly one request each (ONE voxelization, shared)
        assert a.stats["requests"] == 1 and b.stats["requests"] == 1
        ens.close()  # no-op: members stay usable
        assert a.design(ubq_structure)[0].shape == (76, 20)
    finally:
        a.close()
        b.close()


def test_ensemble_designer_serial_members(session, ubq_structure):
    """The ensemble works identically over lock-serialized members
    (--no-coalesce): SerialDesigner.submit_frames resolves synchronously."""
    from timed_design_tpu.engine.coalescer import (
        EnsembleDesigner,
        SerialDesigner,
    )

    a, b = SerialDesigner(session), SerialDesigner(session)
    ens = EnsembleDesigner([a, b])
    probs, fa, timings = ens.design(ubq_structure)
    ref, _ = session.design(ubq_structure)
    # identical members: the mean IS the member output
    np.testing.assert_allclose(
        np.asarray(probs), np.asarray(ref, np.float64), atol=2e-6
    )
    assert timings["group_requests"] == 1
    assert a.stats["requests"] == 1 and b.stats["requests"] == 1


def test_ensemble_designer_validation(session):
    """<2 members, mixed heads, and mismatched voxel specs all fail at
    construction — never on the first live request."""
    import jax

    from timed_design_tpu.engine import DesignSession
    from timed_design_tpu.engine.coalescer import (
        EnsembleDesigner,
        SerialDesigner,
    )
    from timed_design_tpu.models import timed_rotamer

    sd = SerialDesigner(session)
    with pytest.raises(ValueError, match="at least two"):
        EnsembleDesigner([sd])

    rot = timed_rotamer(filters=(8,))
    rot_vars = rot.init(
        jax.random.key(1), np.zeros((1, 21, 21, 21, 5), np.float32)
    )
    rot_sd = SerialDesigner(DesignSession(
        (rot, rot_vars), codec="CNOCACB", batch_size=80,
        compute_dtype="float32",
    ))
    with pytest.raises(ValueError, match="matching heads"):
        EnsembleDesigner([sd, rot_sd])

    # same model/head but a different Gaussian mode: averaging predictions
    # computed from DIFFERENT voxel inputs would be silently meaningless
    from timed_design_tpu.models import timed

    module = timed(filters=(8,))
    variables = module.init(
        jax.random.key(0), np.zeros((1, 21, 21, 21, 5), np.float32)
    )
    other = SerialDesigner(DesignSession(
        (module, variables), codec="CNOCACB", batch_size=80,
        compute_dtype="float32", gaussian=not session.gaussian,
    ))
    with pytest.raises(ValueError, match="voxel spec"):
        EnsembleDesigner([sd, other])
