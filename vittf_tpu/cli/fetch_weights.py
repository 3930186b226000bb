"""Fetch official DINO/DINOv2 checkpoints and convert them to npz.

The reference downloads weights from torch.hub at run time
(infer.py:42-46); this environment has no network, so fetching is an
explicit, resumable step with integrity checking:

    python -m vittf_tpu.cli.fetch_weights vits8 --out-dir weights/

downloads the official release checkpoint, records/verifies its sha256,
and converts it to this framework's npz parameter format. Offline it
fails gracefully with the exact URL to mirror in by hand; a manually
copied ``.pth`` in ``--out-dir`` is picked up without any download.

Integrity: the official release URLs carry no published content hashes,
so the first successful download records the checkpoint's sha256 next to
it (``<file>.sha256``) and every later run verifies against that record;
``--expect-sha256`` pins it up front (e.g. from your own mirror's
manifest).
"""
from __future__ import annotations

import hashlib
import sys
from argparse import ArgumentParser
from pathlib import Path

# Official release URLs (facebookresearch/dino and /dinov2 READMEs; the
# same files torch.hub resolves for the reference's loaders).
CHECKPOINT_URLS = {
    "vits16": "https://dl.fbaipublicfiles.com/dino/dino_deitsmall16_pretrain/dino_deitsmall16_pretrain.pth",
    "vits8": "https://dl.fbaipublicfiles.com/dino/dino_deitsmall8_pretrain/dino_deitsmall8_pretrain.pth",
    "vitb16": "https://dl.fbaipublicfiles.com/dino/dino_vitbase16_pretrain/dino_vitbase16_pretrain.pth",
    "vitb8": "https://dl.fbaipublicfiles.com/dino/dino_vitbase8_pretrain/dino_vitbase8_pretrain.pth",
    "vits14": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vits14/dinov2_vits14_pretrain.pth",
    "vitb14": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitb14/dinov2_vitb14_pretrain.pth",
    "vitl14": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitl14/dinov2_vitl14_pretrain.pth",
    "vitg14": "https://dl.fbaipublicfiles.com/dinov2/dinov2_vitg14/dinov2_vitg14_pretrain.pth",
}


def sha256_of(path: Path, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        while True:
            b = f.read(chunk)
            if not b:
                break
            h.update(b)
    return h.hexdigest()


def _download(url: str, dest: Path, timeout: float) -> None:
    """urllib download to a temp file, atomic rename. Raises OSError-family
    exceptions offline — callers turn them into a friendly message."""
    import urllib.request

    tmp = dest.with_suffix(dest.suffix + ".part")
    with urllib.request.urlopen(url, timeout=timeout) as r, open(tmp, "wb") as f:
        while True:
            b = r.read(1 << 20)
            if not b:
                break
            f.write(b)
    tmp.rename(dest)


def fetch_checkpoint(
    arch: str,
    out_dir: Path,
    expect_sha256: str | None = None,
    timeout: float = 120.0,
) -> Path:
    """Return a verified local ``.pth`` for ``arch``, downloading if needed.

    Raises ``RuntimeError`` with a mirror-by-hand message when offline and
    no local copy exists; ``ValueError`` on a hash mismatch.
    """
    if arch not in CHECKPOINT_URLS:
        raise ValueError(
            f"Unknown arch {arch!r}; known: {sorted(CHECKPOINT_URLS)}"
        )
    url = CHECKPOINT_URLS[arch]
    out_dir.mkdir(parents=True, exist_ok=True)
    dest = out_dir / url.rsplit("/", 1)[1]
    record = dest.with_suffix(dest.suffix + ".sha256")

    if not dest.exists():
        try:
            print(f"downloading {url}", file=sys.stderr)
            _download(url, dest, timeout)
        except Exception as e:  # offline / blocked egress
            raise RuntimeError(
                f"Could not download {url} ({type(e).__name__}: {e}).\n"
                f"If this machine is offline, copy the file to {dest} by "
                f"hand and re-run; it will be verified and converted."
            ) from e

    digest = sha256_of(dest)
    if expect_sha256 and digest != expect_sha256:
        # quarantine the failed file: leaving it in place would let a later
        # UNPINNED run record its (bad) digest as the trusted .sha256
        quarantine = dest.with_suffix(dest.suffix + ".rejected")
        dest.rename(quarantine)
        raise ValueError(
            f"{dest} sha256 {digest} != expected {expect_sha256}; file "
            f"moved to {quarantine} — a re-run will fetch fresh"
        )
    if record.exists():
        recorded = record.read_text().split()[0]
        if digest != recorded:
            raise ValueError(
                f"{dest} sha256 {digest} != previously recorded {recorded} "
                f"({record}) — delete the stale file to re-fetch"
            )
    else:
        record.write_text(f"{digest}  {dest.name}\n")
        print(f"recorded sha256 {digest} → {record}", file=sys.stderr)
    return dest


def main(argv=None) -> int:
    p = ArgumentParser("Fetch + convert an official DINO/DINOv2 checkpoint")
    p.add_argument("arch", choices=sorted(CHECKPOINT_URLS))
    p.add_argument("--out-dir", type=Path, default=Path("weights"))
    p.add_argument("--expect-sha256", default=None)
    p.add_argument("--timeout", type=float, default=120.0)
    p.add_argument(
        "--no-convert", action="store_true",
        help="only fetch/verify the .pth, skip npz conversion",
    )
    args = p.parse_args(argv)

    try:
        ckpt = fetch_checkpoint(
            args.arch, args.out_dir, args.expect_sha256, args.timeout
        )
    except (RuntimeError, ValueError) as e:
        print(f"FETCH FAILED: {e}", file=sys.stderr)
        return 1
    print(f"checkpoint OK: {ckpt}")

    if not args.no_convert:
        from vittf_tpu.models.dino import ALL_ARCHS, load_dino_checkpoint
        from vittf_tpu.models.serialization import save_params_npz

        cfg = ALL_ARCHS[args.arch]
        params = load_dino_checkpoint(ckpt, cfg)
        out = save_params_npz(str(ckpt.with_suffix(".npz")), params)
        print(f"converted → {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
