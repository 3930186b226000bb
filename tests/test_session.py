"""Interactive session + artifact-contract serving loop tests."""
import threading
import time

import numpy as np
import pytest

from vittf_tpu.pipeline.session import InteractiveSession, watch_directory


@pytest.fixture
def session(rng):
    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    return InteractiveSession(vol, feats, impl="xla")


def test_update_and_predict(session, rng):
    ann = {
        "liver": rng.integers(0, 16, (9, 3)),
        "bone": rng.integers(0, 16, (5, 3)),
    }
    sims = session.update_annotations(ann)
    assert set(sims) == {"liver", "bone"}
    assert np.asarray(sims["liver"]).shape == (8, 8, 8)
    pred = np.asarray(session.predict())
    assert pred.shape == (8, 8, 8) and pred.max() <= 2


def test_prewarm_runs_and_leaves_state_clean(session, rng):
    """prewarm compiles the serving graphs without polluting the session's
    similarity state; a real update afterwards works normally."""
    t = session.prewarm(n_classes=2, n_annotations=8)
    assert t > 0
    assert session.similarities == {}
    sims = session.update_annotations({"a": rng.integers(0, 16, (8, 3))})
    assert set(sims) == {"a"}


def test_largest_island_session_flag(rng):
    """largest_island=True post-filters every served similarity map to
    one connected island above the threshold (cc_torch filter parity,
    reference tests/test_connected_components.py:26-61)."""
    from scipy import ndimage

    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    s = InteractiveSession(vol, feats, impl="xla", largest_island=True)
    sims = s.update_annotations({"a": rng.integers(0, 16, (9, 3))})
    m = np.asarray(sims["a"]) > s.island_threshold
    if m.any():
        _, n = ndimage.label(m)
        assert n == 1


def test_dirty_tracking_exact_vs_full_recompute(rng):
    """A one-class edit under dirty tracking must produce maps identical
    to recomputing every class (no-BLS path is per-class independent)."""
    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    s_dirty = InteractiveSession(vol, feats, impl="xla")
    s_full = InteractiveSession(vol, feats, impl="xla", dirty_tracking=False)

    ann = {
        "a": rng.integers(0, 16, (9, 3)),
        "b": rng.integers(0, 16, (7, 3)),
        "c": rng.integers(0, 16, (5, 3)),
    }
    for s in (s_dirty, s_full):
        s.update_annotations({k: v.copy() for k, v in ann.items()})
    # edit only class "b"
    ann["b"] = rng.integers(0, 16, (11, 3))
    out_d = s_dirty.update_annotations({k: v.copy() for k, v in ann.items()})
    out_f = s_full.update_annotations({k: v.copy() for k, v in ann.items()})
    assert set(out_d) == set(out_f)
    for k in out_f:
        np.testing.assert_array_equal(np.asarray(out_d[k]), np.asarray(out_f[k]))


def test_dirty_tracking_reuses_clean_maps(rng):
    """Clean classes keep the SAME cached array object; removed classes
    are dropped; empty dirty classes serve zero maps."""
    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    s = InteractiveSession(vol, feats, impl="xla")
    ann = {
        "a": rng.integers(0, 16, (9, 3)),
        "b": rng.integers(0, 16, (7, 3)),
    }
    first = s.update_annotations({k: v.copy() for k, v in ann.items()})
    a_map = first["a"]
    out = s.update_annotations(
        {"a": ann["a"].copy(), "b": rng.integers(0, 16, (8, 3))}
    )
    assert out["a"] is a_map  # untouched class: cached object served
    out = s.update_annotations(
        {"a": ann["a"].copy(), "d": np.zeros((0, 3), np.int64)}
    )
    assert set(out) == {"a", "d"}  # "b" removed
    assert out["a"] is a_map
    assert np.asarray(out["d"]).max() == 0  # empty class → zero map


def test_adaptive_class_bucket(rng):
    """Dirty updates use the smallest pow2 class bucket that fits (the
    vmapped BLS solve scales with the padded class count); at or past the
    configured bucket the usual multiple-of-bucket padding applies."""
    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    s = InteractiveSession(vol, feats, impl="xla", class_bucket=4)
    assert s._adaptive_class_bucket(1) == 1
    assert s._adaptive_class_bucket(2) == 2
    assert s._adaptive_class_bucket(3) == 4
    assert s._adaptive_class_bucket(4) == 4
    assert s._adaptive_class_bucket(7) == 4  # cap: pads to multiple of 4
    s2 = InteractiveSession(vol, feats, impl="xla", class_bucket=None)
    assert s2._adaptive_class_bucket(1) is None


def test_dirty_bls_edit_close_to_full_recompute(rng):
    """A one-class BLS edit (1-class adaptive bucket → its own crop
    extent) must stay within the bucketed-BLS path's documented
    deviation envelope of a full recompute."""
    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    s_dirty = InteractiveSession(vol, feats, impl="xla", bilateral_solver=True)
    s_full = InteractiveSession(
        vol, feats, impl="xla", bilateral_solver=True, dirty_tracking=False
    )
    ann = {
        "a": rng.integers(0, 16, (9, 3)),
        "b": rng.integers(0, 16, (7, 3)),
    }
    for s in (s_dirty, s_full):
        s.update_annotations({k: v.copy() for k, v in ann.items()})
    ann["b"] = rng.integers(0, 16, (11, 3))
    out_d = s_dirty.update_annotations({k: v.copy() for k, v in ann.items()})
    out_f = s_full.update_annotations({k: v.copy() for k, v in ann.items()})
    np.testing.assert_array_equal(  # clean class: cached map is exact
        np.asarray(out_d["a"]), np.asarray(out_f["a"])
    )
    d = np.abs(
        np.asarray(out_d["b"]).astype(np.int32)
        - np.asarray(out_f["b"]).astype(np.int32)
    )
    d = np.minimum(d, 256 - d)  # uint8 wraparound parity distance
    assert d.mean() < 8.0, d.mean()


def test_prewarm_with_bilateral_solver(rng):
    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    s = InteractiveSession(
        vol, feats, impl="xla", bilateral_solver=True, bls_shape_bucket=4
    )
    assert s.prewarm(n_classes=2, n_annotations=8) > 0
    assert s.similarities == {}


def test_export_contract(session, rng, tmp_path):
    session.update_annotations({"a": rng.integers(0, 16, (6, 3))})
    session.export(tmp_path)
    sims = np.load(tmp_path / "similarities.npy", allow_pickle=True)[()]
    assert set(sims) == {"a"} and sims["a"].dtype == np.uint8
    preds = np.load(tmp_path / "predictions.npy")
    assert preds.dtype == np.uint8


def test_export_cache_matches_fresh_session(rng, tmp_path):
    """Dirty-update exports (host cache serves unchanged classes) must be
    byte-identical to a cache-cold session exporting the same state."""
    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    s = InteractiveSession(vol, feats, impl="xla")
    ann = {
        "a": rng.integers(0, 16, (6, 3)),
        "b": rng.integers(0, 16, (7, 3)),
        "c": rng.integers(0, 16, (5, 3)),
    }
    for d in ("f0", "f1", "f2", "fresh"):
        (tmp_path / d).mkdir()
    s.update_annotations(ann)
    s.export(tmp_path / "f0")
    # one-class edit: only 'b' changes; 'a'/'c' come from the host cache
    ann["b"] = rng.integers(0, 16, (9, 3))
    s.update_annotations(ann)
    s.export(tmp_path / "f1")
    assert {n for n, (dev, _) in s._export_cache.items()} == {"a", "b", "c"}

    fresh = InteractiveSession(vol, feats, impl="xla")
    fresh.update_annotations(ann)
    fresh.export(tmp_path / "fresh")
    got = np.load(tmp_path / "f1" / "similarities.npy", allow_pickle=True)[()]
    want = np.load(
        tmp_path / "fresh" / "similarities.npy", allow_pickle=True
    )[()]
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_array_equal(got[k], want[k])
    np.testing.assert_array_equal(
        np.load(tmp_path / "f1" / "predictions.npy"),
        np.load(tmp_path / "fresh" / "predictions.npy"),
    )
    # dropping a class evicts its cache entry (no stale HBM pins)
    del ann["c"]
    s.update_annotations(ann)
    s.export(tmp_path / "f2")
    assert set(s._export_cache) == {"a", "b"}


def test_export_empty_state(session, tmp_path):
    """Cleared annotations export an empty dict + zero predictions
    instead of crashing the serve loop."""
    session.update_annotations({})
    session.export(tmp_path)
    sims = np.load(tmp_path / "similarities.npy", allow_pickle=True)[()]
    assert sims == {}
    preds = np.load(tmp_path / "predictions.npy")
    assert preds.shape == (8, 8, 8) and preds.max() == 0


def test_watch_directory_serves_updates(session, rng, tmp_path):
    """Write annotations from a thread; the watcher must answer each."""

    def writer():
        for i in range(2):
            time.sleep(0.3)
            np.save(
                tmp_path / "annotations.npy",
                {"cls": rng.integers(0, 16, (4 + i, 3))},
            )

    t = threading.Thread(target=writer)
    t.start()
    served = watch_directory(
        tmp_path, session, poll_interval=0.05, max_updates=2
    )
    t.join()
    assert served == 2
    assert (tmp_path / "similarities.npy").exists()
    assert (tmp_path / "predictions.npy").exists()


def test_watch_directory_skips_identical_rewrites(session, rng, tmp_path):
    """An mtime-only rewrite of byte-identical annotations must NOT count
    as an update: the watcher hashes content before recomputing. The
    watcher here is asked for 2 updates; with mtime-based detection it
    would serve the duplicate and never see the final frame."""
    ann_a = {"first": rng.integers(0, 16, (5, 3))}
    ann_b = {"second": rng.integers(0, 16, (6, 3))}

    def writer():
        time.sleep(0.2)
        np.save(tmp_path / "annotations.npy", ann_a)
        time.sleep(0.3)
        np.save(tmp_path / "annotations.npy", ann_a)  # identical content
        time.sleep(0.3)
        np.save(tmp_path / "annotations.npy", ann_b)

    t = threading.Thread(target=writer)
    t.start()
    served = watch_directory(
        tmp_path, session, poll_interval=0.05, max_updates=2
    )
    t.join()
    assert served == 2
    sims = np.load(tmp_path / "similarities.npy", allow_pickle=True)[()]
    assert set(sims) == {"second"}


def test_watch_directory_poll_fallback(session, rng, tmp_path):
    """use_inotify=False must serve through the plain poll path."""

    def writer():
        time.sleep(0.2)
        np.save(tmp_path / "annotations.npy", {"c": rng.integers(0, 16, (4, 3))})

    t = threading.Thread(target=writer)
    t.start()
    served = watch_directory(
        tmp_path, session, poll_interval=0.05, max_updates=1,
        use_inotify=False,
    )
    t.join()
    assert served == 1


def test_watch_directory_bls_class_changes(rng, tmp_path):
    """Full interactive stack: BLS refinement on, class count changing
    between updates (add a class, drop to one) — the watcher must answer
    every frame and the batched refinement must tolerate the class churn."""
    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    session = InteractiveSession(
        vol, feats, impl="xla", bilateral_solver=True,
        bls_shape_bucket=4, class_bucket=4,
    )
    frames = [
        {"a": rng.integers(0, 16, (6, 3))},
        {"a": rng.integers(0, 16, (7, 3)), "b": rng.integers(0, 16, (5, 3))},
        {"b": rng.integers(0, 16, (4, 3))},
    ]

    def writer():
        for f in frames:
            time.sleep(0.4)
            np.save(tmp_path / "annotations.npy", f)

    t = threading.Thread(target=writer)
    t.start()
    served = watch_directory(
        tmp_path, session, poll_interval=0.05, max_updates=len(frames)
    )
    t.join()
    assert served == len(frames)
    sims = np.load(tmp_path / "similarities.npy", allow_pickle=True)[()]
    assert set(sims) == set(frames[-1])
    assert all(v.dtype == np.uint8 for v in sims.values())


def test_from_artifacts(tmp_path, rng):
    np.save(tmp_path / "volume.npy", rng.random((12, 12, 12)).astype(np.float32))
    np.save(
        tmp_path / "x_features8.npy",
        np.asarray({"k": rng.standard_normal((4, 6, 6, 6)).astype(np.float16)},
                   dtype=object),
    )
    s = InteractiveSession.from_artifacts(tmp_path, impl="xla")
    assert s.features.shape == (4, 6, 6, 6)


def test_bls_interactive_zero_recompiles_after_warmup(rng):
    """Repeated annotation edits with the bilateral solver on must reuse
    compiled graphs: the annotation axis is padded to a bucket (count and
    position changes are runtime values), so the similarity dispatch never
    recompiles per frame."""
    from vittf_tpu.ops.bilateral import bilateral_solve_gray
    from vittf_tpu.pipeline.ntf import _raw_similarities_device

    # a volume with one bright blob; features carry the blob signature so
    # the similarity crop box is stable under annotation jitter
    vol = (rng.random((24, 24, 24)) * 0.1).astype(np.float32)
    vol[6:18, 6:18, 6:18] += 0.8
    feats = (rng.standard_normal((8, 12, 12, 12)) * 0.05).astype(np.float32)
    feats[:4, 3:9, 3:9, 3:9] += 1.0

    session = InteractiveSession(vol, feats, bilateral_solver=True, impl="xla")

    def blob_annotations(n, m):
        return {
            "a": rng.integers(8, 16, (n, 3)),
            "b": rng.integers(0, 5, (m, 3)),
        }

    session.update_annotations(blob_annotations(9, 4))  # warmup
    solver_cache = bilateral_solve_gray._cache_size()
    sims_cache = _raw_similarities_device._cache_size()
    for i in range(4):
        # edits change counts and positions (annotation add/remove/move)
        session.update_annotations(blob_annotations(9 + 2 * i, 4 + i))
    assert bilateral_solve_gray._cache_size() == solver_cache
    assert _raw_similarities_device._cache_size() == sims_cache


def test_class_bucket_stops_recompiles_on_class_add(rng):
    """Adding/removing a class within a bucket must reuse compiled graphs
    (the class axis is padded with zero mean-matrix columns — exact)."""
    from vittf_tpu.pipeline.ntf import _similarities_device

    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    session = InteractiveSession(vol, feats, impl="xla", class_bucket=4)

    def ann(n_classes):
        return {
            f"c{i}": rng.integers(0, 16, (6, 3)) for i in range(n_classes)
        }

    ref = session.update_annotations(ann(1))
    c0 = _similarities_device._cache_size()
    for n in (2, 3, 4, 1):
        out = session.update_annotations(ann(n))
        assert len(out) == n
    assert _similarities_device._cache_size() == c0, "class add recompiled"

    # bucket padding is exact: same annotations, bucketed vs exact classes
    import jax.numpy as jnp

    from vittf_tpu.pipeline.ntf import compute_similarities

    a = {"x": rng.integers(0, 16, (7, 3))}
    want = compute_similarities(jnp.asarray(vol), jnp.asarray(feats), a, impl="xla")
    got = compute_similarities(
        jnp.asarray(vol), jnp.asarray(feats), a, impl="xla", class_bucket=4
    )
    np.testing.assert_array_equal(np.asarray(got["x"]), np.asarray(want["x"]))


def test_bls_shape_bucket_stops_solver_recompiles(rng):
    """Crop boxes that differ per frame (growing similarity support) hit
    ONE solver graph with the default bucket, but one graph per shape with
    the reference-parity tight crop."""
    import jax.numpy as jnp

    from vittf_tpu.ops.bilateral import bilateral_solve_gray
    from vittf_tpu.pipeline.refine import refine_similarity

    vol = rng.random((32, 32, 32)).astype(np.float32)
    sim_shape = (16, 16, 16)

    def sim_with_support(ext):
        s = np.zeros(sim_shape, np.float32)
        s[4 : 4 + ext, 4:11, 4:11] = 1.0
        return jnp.asarray(s)

    # warmup both paths on the first shape
    refine_similarity(sim_with_support(5), vol, sim_shape, shape_bucket=8)
    refine_similarity(sim_with_support(5), vol, sim_shape, shape_bucket=None)
    c0 = bilateral_solve_gray._cache_size()
    for ext in (6, 7):  # tight crops (10,11,11) and (11,11,11) — new shapes
        refine_similarity(sim_with_support(ext), vol, sim_shape, shape_bucket=8)
    assert bilateral_solve_gray._cache_size() == c0, "bucketed crop recompiled"
    for ext in (6, 7):
        refine_similarity(sim_with_support(ext), vol, sim_shape, shape_bucket=None)
    assert bilateral_solve_gray._cache_size() == c0 + 2, (
        "tight crop expected one new solver graph per shape"
    )


def test_export_prediction_matches_device_fuse(rng, tmp_path):
    """export() fuses predictions on host from the cached maps; the
    artifact must equal the device fuse of the same similarity state."""
    from vittf_tpu.pipeline.ntf import fuse_predictions

    vol = rng.random((16, 16, 16)).astype(np.float32)
    feats = (rng.standard_normal((8, 8, 8, 8)) * 0.4).astype(np.float32)
    s = InteractiveSession(vol, feats, impl="xla")
    s.update_annotations({
        "a": rng.integers(0, 16, (6, 3)),
        "b": rng.integers(0, 16, (7, 3)),
    })
    s.export(tmp_path)
    np.testing.assert_array_equal(
        np.load(tmp_path / "predictions.npy"),
        np.asarray(s.predict()).astype(np.uint8),
    )


def test_named_empty_classes_serve_zero_maps(session, rng):
    """A named class with ZERO points (mid-annotation GUI state) gets a
    zero map — consistent with what a full recompute produces — instead
    of the whole state being treated as cleared."""
    out = session.update_annotations({
        "a": rng.integers(0, 16, (5, 3)),
        "b": np.zeros((0, 3), np.int32),
    })
    assert set(out) == {"a", "b"}
    assert np.asarray(out["b"]).max() == 0
    # all-empty but named: every class serves a zero map, predict works
    out = session.update_annotations({"a": np.zeros((0, 3), np.int32)})
    assert set(out) == {"a"} and np.asarray(out["a"]).max() == 0


def test_cleared_annotations_unpin_export_cache(session, rng, tmp_path):
    """export() after a clear drops the device-map cache so cleared
    sessions don't pin stale HBM buffers."""
    session.update_annotations({"a": rng.integers(0, 16, (5, 3))})
    session.export(tmp_path)
    assert session._export_cache
    session.update_annotations({})
    session.export(tmp_path)
    assert not session._export_cache
