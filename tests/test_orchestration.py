"""Tests: config system, logging, batch fan-out, train CLI with resume,
IntraCLR, sweep runner."""
import json
from dataclasses import dataclass, field

import numpy as np
import pytest
import torch

from vittf_tpu.core.config import from_dict, load_config, save_config, to_dict
from vittf_tpu.utils.logging import MetricLogger, debug_mode


@dataclass(frozen=True)
class _Inner:
    a: int = 1
    dims: tuple = (1, 2)


@dataclass(frozen=True)
class _Outer:
    name: str = "x"
    inner: _Inner = field(default_factory=_Inner)


def test_config_roundtrip(tmp_path):
    cfg = _Outer(name="exp", inner=_Inner(a=5, dims=(3, 4, 5)))
    p = save_config(tmp_path / "c.yaml", cfg)
    loaded = load_config(p, _Outer)
    assert loaded.name == "exp"
    assert loaded.inner.a == 5 and tuple(loaded.inner.dims) == (3, 4, 5)
    # json too
    save_config(tmp_path / "c.json", cfg)
    assert load_config(tmp_path / "c.json", _Outer).inner.a == 5
    with pytest.raises(KeyError):
        from_dict(_Outer, {"nope": 1})
    assert to_dict(cfg)["inner"]["dims"] == [3, 4, 5]


def test_metric_logger_jsonl(tmp_path, capsys):
    log = MetricLogger(jsonl_path=tmp_path / "m.jsonl", stdout_every=2)
    log.log({"loss": 1.0})
    log.log({"loss": 0.5})
    log.close()
    lines = [json.loads(l) for l in (tmp_path / "m.jsonl").read_text().splitlines()]
    assert lines[0]["loss"] == 1.0 and lines[1]["step"] == 2
    assert "[2]" in capsys.readouterr().out


def test_debug_mode_restores():
    import jax

    before = jax.config.jax_disable_jit
    with debug_mode(nans=False, disable_jit=True):
        assert jax.config.jax_disable_jit
    assert jax.config.jax_disable_jit == before


@pytest.fixture
def train_data(tmp_path, rng):
    mask = np.zeros((12, 12, 12), np.uint8)
    mask[2:6, 2:6, 2:6] = 1
    mask[7:11, 7:11, 7:11] = 2
    vol = ((mask == 1) * 0.8 + (mask == 2) * 0.2
           + rng.random(mask.shape) * 0.05).astype(np.float32)
    data = {"vol": torch.from_numpy(vol), "mask": torch.from_numpy(mask),
            "labels": ["background", "a", "b"]}
    path = tmp_path / "data.pt"
    torch.save(data, path)
    return path


def test_train_cli_semisparse_with_checkpoint(tmp_path, train_data):
    from vittf_tpu.cli.train import main

    ckpt = tmp_path / "ckpt"
    rc = main([
        "--trainer", "semisparse", "--data", str(train_data),
        "--iterations", "6", "--batch-size", "4", "--ckpt-every", "3",
        "--ckpt-dir", str(ckpt), "--log-jsonl", str(tmp_path / "log.jsonl"),
    ])
    assert rc == 0
    assert ckpt.exists()
    lines = (tmp_path / "log.jsonl").read_text().splitlines()
    assert len(lines) == 6
    # resume continues from the checkpointed step
    rc = main([
        "--trainer", "semisparse", "--data", str(train_data),
        "--iterations", "8", "--batch-size", "4",
        "--ckpt-dir", str(ckpt), "--resume",
    ])
    assert rc == 0


def test_train_cli_intra_clr(train_data):
    from vittf_tpu.cli.train import main

    rc = main([
        "--trainer", "intra_clr", "--data", str(train_data),
        "--iterations", "4", "--batch-size", "8",
    ])
    assert rc == 0


def test_intra_clr_loss_decreases(rng):
    from vittf_tpu.models.cnn3d import FeatureExtractorConfig
    from vittf_tpu.train.intra_clr import IntraCLRConfig, IntraCLRTrainer

    vol = rng.random((14, 14, 14)).astype(np.float32)
    cfg = IntraCLRConfig(
        model=FeatureExtractorConfig(1, (8,), (8,)), rec_field=3,
        batch_size=16, learning_rate=3e-3, schedule="const", iterations=40,
    )
    tr = IntraCLRTrainer(vol, cfg, seed=0)
    losses = [tr.step() for _ in range(40)]
    assert losses[-1] < losses[0]


def test_batch_fanout(tmp_path, rng):
    from vittf_tpu.cli.batch import main

    for name in ("v1", "v2"):
        d = tmp_path / name
        d.mkdir()
        vol = rng.random((12, 12, 12)).astype(np.float32)
        np.save(d / "volume.npy", vol)
        lab = np.zeros((12, 12, 12), np.uint8)
        lab[3:9, 3:9, 3:9] = 1
        np.save(d / "labels.npy", lab)
        np.save(d / "x_features8.npy",
                np.asarray({"k": rng.standard_normal((6, 6, 6, 6)).astype(np.float16)},
                           dtype=object))
    rc = main(["predict-all", "--root", str(tmp_path), "--num-samples", "16"])
    assert rc == 0
    assert (tmp_path / "v1").glob("ntf_pred*.npy")
    assert len(list((tmp_path / "v2").glob("ntf_pred*.npy"))) == 1
    # shard selection picks half the dirs
    from vittf_tpu.cli.batch import _volume_dirs

    assert len(_volume_dirs(tmp_path, "0/2")) == 1


def test_batch_infer_all(tmp_path, rng):
    """infer-all fan-out: extracts features per volume dir, skips existing."""
    from vittf_tpu.cli.batch import main

    for name in ("v1", "v2"):
        d = tmp_path / name
        d.mkdir()
        np.save(d / "volume.npy", rng.random((12, 12, 12)).astype(np.float32))
    rc = main(
        ["infer-all", "--root", str(tmp_path), "--feature-output-size", "6"]
    )
    assert rc == 0
    for name in ("v1", "v2"):
        feats = list((tmp_path / name).glob("*features*"))
        assert len(feats) == 1, feats
    # idempotent second pass (cache guard exits per volume)
    rc = main(
        ["infer-all", "--root", str(tmp_path), "--feature-output-size", "6"]
    )
    assert rc == 0


def test_sweep_runner(tmp_path, train_data):
    from vittf_tpu.cli.sweep import expand_grid, main

    assert len(expand_grid({"a": [1, 2], "b": [3]})) == 2
    cfg = {
        "trainer": "semisparse",
        "metric": "infonce",
        "goal": "minimize",
        "grid": {"learning_rate": [0.001, 0.003]},
        "fixed": {"iterations": 3, "batch_size": 4},
    }
    import yaml

    cfg_path = tmp_path / "sweep.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))
    rc = main(["--config", str(cfg_path), "--data", str(train_data),
               "--out", str(tmp_path / "out")])
    assert rc == 0
    results = json.loads((tmp_path / "out" / "sweep.json").read_text())
    assert len(results["runs"]) == 2 and "best" in results
