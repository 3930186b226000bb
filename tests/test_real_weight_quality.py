"""Pretrained-weight readiness (VERDICT r2 item 6), offline-tested.

- ``scripts/real_weight_quality.py`` must run extract → similarity →
  fuse → IoU end-to-end from a LOCAL full-scale hub-layout checkpoint
  (random weights stand in for the unreachable pretrained ones, same
  fixture scheme as tests/test_fullscale_parity.py).
- ``cli.fetch_weights`` must fail gracefully offline, pick up a manually
  mirrored file, and enforce its recorded sha256.
"""
import json

import numpy as np
import pytest
import torch

from vittf_tpu.models.dino import DINO_ARCHS


@pytest.fixture(scope="module")
def hub_ckpt(tmp_path_factory):
    from tests.test_vit import TorchDinoViT

    cfg = DINO_ARCHS["vits8"]
    tmodel = TorchDinoViT(cfg)
    gen = torch.Generator().manual_seed(11)
    with torch.no_grad():
        for p in tmodel.parameters():
            p.copy_(torch.randn(p.shape, generator=gen) * 0.02)
    ckpt = {
        "teacher": {f"backbone.{k}": v for k, v in tmodel.state_dict().items()}
    }
    path = tmp_path_factory.mktemp("ckpt") / "dino_deitsmall8_pretrain.pth"
    torch.save(ckpt, path)
    return path


def test_real_weight_quality_script(hub_ckpt, tmp_path):
    import scripts.real_weight_quality as rwq

    out = tmp_path / "metrics.json"
    rc = rwq.main(
        [
            "--checkpoint", str(hub_ckpt), "--phantom", "24",
            "--annotations", "16", "--fos", "8", "--batch", "4",
            "--out", str(out),
        ]
    )
    assert rc == 0
    m = json.loads(out.read_text())
    assert m["weights"] == str(hub_ckpt)
    assert set(m["iou"]) == {"c1", "c2", "c3"}
    assert 0.0 <= m["mIoU_fg"] <= 1.0
    assert m["extract_s"] > 0 and m["similarity_s"] > 0


def test_real_weight_quality_npz_roundtrip(hub_ckpt, tmp_path):
    """Converted-npz checkpoints load through the same entry point."""
    import scripts.real_weight_quality as rwq
    from vittf_tpu.models.dino import load_dino_checkpoint
    from vittf_tpu.models.serialization import save_params_npz

    params = load_dino_checkpoint(hub_ckpt, DINO_ARCHS["vits8"])
    npz = tmp_path / "vits8.npz"
    save_params_npz(npz, params)
    out = tmp_path / "m.json"
    rc = rwq.main(
        [
            "--checkpoint", str(npz), "--phantom", "24", "--fast",
            "--annotations", "16", "--fos", "8", "--batch", "4",
            "--out", str(out),
        ]
    )
    assert rc == 0
    assert json.loads(out.read_text())["mode"] == "fast"


def test_fetch_weights_offline_graceful(tmp_path, monkeypatch):
    from vittf_tpu.cli import fetch_weights as fw

    def boom(url, dest, timeout):
        raise OSError("no route to host")

    monkeypatch.setattr(fw, "_download", boom)
    with pytest.raises(RuntimeError, match="copy the file"):
        fw.fetch_checkpoint("vits8", tmp_path)
    assert fw.main(["vits8", "--out-dir", str(tmp_path)]) == 1


def test_fetch_weights_local_file_and_hash(hub_ckpt, tmp_path, monkeypatch):
    from vittf_tpu.cli import fetch_weights as fw

    # a manually mirrored file is used without any download attempt
    dest_dir = tmp_path / "w"
    dest_dir.mkdir()
    dest = dest_dir / "dino_deitsmall8_pretrain.pth"
    dest.write_bytes(hub_ckpt.read_bytes())

    def no_net(url, dst, timeout):  # pragma: no cover
        raise AssertionError("should not download when the file exists")

    monkeypatch.setattr(fw, "_download", no_net)
    got = fw.fetch_checkpoint("vits8", dest_dir)
    assert got == dest
    record = dest.with_suffix(".pth.sha256")
    assert record.exists()
    digest = record.read_text().split()[0]
    assert digest == fw.sha256_of(dest)

    # recorded-hash verification: corruption is caught
    dest.write_bytes(b"corrupted")
    with pytest.raises(ValueError, match="previously recorded"):
        fw.fetch_checkpoint("vits8", dest_dir)

    # explicit pin mismatch is caught AND the file is quarantined so a
    # later unpinned run cannot bless it
    dest.write_bytes(hub_ckpt.read_bytes())
    record.unlink()
    with pytest.raises(ValueError, match="expected"):
        fw.fetch_checkpoint("vits8", dest_dir, expect_sha256="0" * 64)
    assert not dest.exists()
    rejected = dest.with_suffix(".pth.rejected")
    assert rejected.exists()
    # pinned CLI failure exits 1 with the friendly message, no traceback
    rejected.rename(dest)
    assert (
        fw.main(
            ["vits8", "--out-dir", str(dest_dir), "--expect-sha256", "0" * 64]
        )
        == 1
    )

    # full CLI path incl. npz conversion
    dest.with_suffix(".pth.rejected").rename(dest)
    record.unlink(missing_ok=True)
    assert fw.main(["vits8", "--out-dir", str(dest_dir)]) == 0
    assert (dest_dir / "dino_deitsmall8_pretrain.npz").exists()
