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


def test_export_contract(session, rng, tmp_path):
    session.update_annotations({"a": rng.integers(0, 16, (6, 3))})
    session.export(tmp_path)
    sims = np.load(tmp_path / "similarities.npy", allow_pickle=True)[()]
    assert set(sims) == {"a"} and sims["a"].dtype == np.uint8
    preds = np.load(tmp_path / "predictions.npy")
    assert preds.dtype == np.uint8


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


def test_from_artifacts(tmp_path, rng):
    np.save(tmp_path / "volume.npy", rng.random((12, 12, 12)).astype(np.float32))
    np.save(
        tmp_path / "x_features8.npy",
        np.asarray({"k": rng.standard_normal((4, 6, 6, 6)).astype(np.float16)},
                   dtype=object),
    )
    s = InteractiveSession.from_artifacts(tmp_path, impl="xla")
    assert s.features.shape == (4, 6, 6, 6)
