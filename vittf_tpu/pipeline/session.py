"""Interactive session: cached features + recompile-free similarity serving.

The reference's interactive loop lives in an external Inviwo C++ module
that communicates through the artifact contract (SURVEY.md §3.5): the GUI
writes ``annotations.npy`` and reads back ``similarities.npy`` /
``predictions.npy``; the paper's "seconds instead of minutes" claim is the
latency of that loop. ``InteractiveSession`` is the serving-side object:
features are extracted (or loaded) once and pinned in HBM, and each
annotation update is a single bucketed dispatch (2–5 ms device-side).
``watch_directory`` runs the loop against a directory, making any
frontend that speaks the artifact contract interactive.
"""
from __future__ import annotations

import os
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vittf_tpu.core.io import (
    load_features,
    save_similarities,
)
from vittf_tpu.pipeline.ntf import (
    CT_ORG_THRESHOLDS,
    compute_similarities,
    fuse_predictions,
)


class InteractiveSession:
    """Volume + cached feature volume serving similarity queries."""

    def __init__(
        self,
        volume: np.ndarray,
        features: np.ndarray,
        bilateral_solver: bool = False,
        impl: str = "auto",
        bls_shape_bucket: int | None = 8,
        class_bucket: int | None = 4,
        largest_island: bool = False,
        island_threshold: int = 69,
        dirty_tracking: bool = True,
    ):
        # the volume stays a HOST array: serving only needs its shape
        # (annotation rel-coords) and the one-time half-res BLS reference
        # below — pinning a 1024³ fp32 volume would cost 4.3 GB of HBM
        # for nothing (and a 4× larger session-open upload for uint8 CTs)
        self.volume = np.asarray(volume)
        self.features = jnp.asarray(np.asarray(features, np.float32))
        self.bilateral_solver = bilateral_solver
        self.impl = impl
        # interactive frames bucket the BLS crop shape AND the class count
        # so graphs are reused across annotation edits and class
        # add/remove (zero-padded mean-matrix columns — exact)
        self.bls_shape_bucket = bls_shape_bucket
        self.class_bucket = class_bucket
        # optional largest-island post-filter (reference cc_torch filter,
        # tests/test_connected_components.py:26-61)
        self.largest_island = largest_island
        self.island_threshold = island_threshold
        # GUI edits touch one class per frame; with dirty tracking an
        # update recomputes (and BLS-refines) only classes whose
        # annotation arrays actually changed — the others serve cached
        # maps. ~C× less work per frame in the common case.
        self.dirty_tracking = dirty_tracking
        self._last_annotations: dict[str, np.ndarray] = {}
        self.similarities: dict[str, jnp.ndarray] = {}
        # export host cache: name -> (device array it was fetched from,
        # its host copy). Unchanged classes keep the SAME immutable device
        # array across dirty updates, so their cached host bytes are exact
        # and the per-frame D2H shrinks to dirty maps + the fused
        # prediction — the serve loop's dominant cost on a slow link.
        self._export_cache: dict[str, tuple] = {}
        # the half-res BLS reference is frame-invariant: build it once
        self._bls_ref_u8 = None
        if bilateral_solver:
            from vittf_tpu.pipeline.refine import make_bls_reference

            sim_shape = tuple(d // 2 for d in self.volume.shape[-3:])
            self._bls_ref_u8 = make_bls_reference(self.volume, sim_shape)

    @classmethod
    def from_artifacts(cls, data_dir: str | Path, **kwargs) -> "InteractiveSession":
        from vittf_tpu.core.io import ArtifactDir

        ad = ArtifactDir(data_dir)
        return cls(ad.volume(), load_features(ad.features_path()), **kwargs)

    @classmethod
    def extract(
        cls, volume: np.ndarray, params, model_cfg, extract_cfg=None, **kwargs
    ) -> "InteractiveSession":
        from vittf_tpu.pipeline.features import ExtractConfig, extract_features

        feats = extract_features(
            jnp.asarray(np.asarray(volume, np.float32)), params, model_cfg,
            extract_cfg or ExtractConfig(),
        )["k"]
        return cls(volume, np.asarray(feats), **kwargs)

    def prewarm(
        self,
        n_classes: int | None = None,
        n_annotations: int = 64,
        seed: int = 0,
    ) -> float:
        """Compile the serving graphs before the first real interaction.

        Runs one synthetic annotation update through the configured path
        (incl. the batched BLS refinement when enabled) so the first user
        edit pays steady-state latency (tens to hundreds of ms) instead of
        the first-compile stall (tens of seconds on a cold backend).
        Annotation-count, class-count and BLS crop-shape buckets mean the
        compiled graphs are reused for real updates; ``n_classes``
        defaults to one class bucket so any real count within the first
        bucket hits warm graphs. Returns the warmup seconds."""
        if n_classes is None:
            n_classes = self.class_bucket or 5
        rng = np.random.default_rng(seed)
        shape = np.asarray(self.volume.shape[-3:])
        ann = {
            f"_warm{i}": rng.integers(0, shape, (n_annotations, 3)).astype(
                np.int64
            )
            for i in range(n_classes)
        }
        t0 = time.perf_counter()
        # when the opt-in speculative BLS dispatch is on, run the update
        # twice: the first (classic) pass seeds the speculative sticky
        # extent, the second compiles the single-dispatch graph the
        # steady-state frames use (off by default — measured neutral on
        # this tunnel; see pipeline/refine.py)
        spec = self.bilateral_solver and os.environ.get(
            "VITTF_BLS_SPECULATIVE", "0"
        ) != "0"
        for _ in range(2 if spec else 1):
            sims = compute_similarities(
                self.volume, self.features, ann,
                bilateral_solver=self.bilateral_solver, impl=self.impl,
                bls_shape_bucket=self.bls_shape_bucket,
                class_bucket=self.class_bucket,
                bls_ref_u8=self._bls_ref_u8,
            )
            # fence without touching self.similarities (warmup invisible)
            int(np.asarray(next(iter(sims.values()))[0, 0, 0]))
        if self.dirty_tracking and self.class_bucket not in (None, 1):
            # steady-state GUI frames are SMALL dirty updates on their
            # adaptive pow2 buckets — compile each sub-bucket graph too
            # so the first one-/two-class edit doesn't stall (measured:
            # an unwarmed bucket costs a ~20 s first-edit compile)
            b = 1
            while b < self.class_bucket:
                for _ in range(2 if spec else 1):
                    sims = compute_similarities(
                        self.volume, self.features,
                        {
                            f"_warm{i}": ann[f"_warm{i % n_classes}"]
                            for i in range(b)
                        },
                        bilateral_solver=self.bilateral_solver,
                        impl=self.impl,
                        bls_shape_bucket=self.bls_shape_bucket,
                        class_bucket=b,
                        bls_ref_u8=self._bls_ref_u8,
                        mean_first=False,
                    )
                    int(np.asarray(next(iter(sims.values()))[0, 0, 0]))
                b *= 2
        return time.perf_counter() - t0

    def _adaptive_class_bucket(self, n_classes: int) -> int | None:
        """Smallest pow2 bucket ≥ n_classes, capped at ``class_bucket``
        (beyond the cap the multiple-of-bucket padding applies as usual).
        Dirty updates typically carry ONE class; padding it to the full
        bucket would make the vmapped BLS solve do bucket× the work."""
        if not self.class_bucket:
            return None
        if n_classes >= self.class_bucket:
            return self.class_bucket
        b = 1
        while b < n_classes:
            b *= 2
        return b

    def update_annotations(
        self, annotations: dict[str, np.ndarray]
    ) -> dict[str, jnp.ndarray]:
        """Recompute per-class similarity maps for new annotations.

        With ``dirty_tracking`` (default) only classes whose annotation
        arrays changed since the last update are recomputed; untouched
        classes keep their cached maps. Exact for the no-BLS path
        (per-class similarity + quantization are independent; the
        mean-first decision is pinned to the full class set). For the
        bucketed BLS path the common crop extent is derived from the
        dirty subset only, which stays within that path's documented
        not-bit-parity envelope (refine_similarities_batched).
        """
        ann_np = {k: np.asarray(v) for k, v in annotations.items()}
        total = sum(int(v.shape[0]) for v in ann_np.values())
        if not ann_np:
            self._last_annotations = {}
            self.similarities = {}
            return self.similarities

        if self.dirty_tracking and self.similarities:
            dirty = [
                k for k, v in ann_np.items()
                if k not in self.similarities
                or k not in self._last_annotations
                or not np.array_equal(v, self._last_annotations[k])
            ]
        else:
            dirty = list(ann_np)

        sims = {
            k: self.similarities[k] for k in ann_np if k not in dirty
        }
        dirty_nonzero = {
            k: ann_np[k] for k in dirty if ann_np[k].shape[0] > 0
        }
        if dirty_nonzero:
            new = compute_similarities(
                self.volume, self.features, dirty_nonzero,
                bilateral_solver=self.bilateral_solver, impl=self.impl,
                bls_shape_bucket=self.bls_shape_bucket,
                # adaptive bucket: a one-class edit pays a 1-class batch
                # (the vmapped BLS solve scales with the padded class
                # count), not the full bucket; pow2 sub-buckets keep the
                # compile-cache footprint at log2(class_bucket) graphs
                class_bucket=self._adaptive_class_bucket(len(dirty_nonzero)),
                bls_ref_u8=self._bls_ref_u8,
                # pin the fast-path decision to the FULL class set so a
                # dirty-subset recompute is numerically identical
                mean_first=(len(ann_np) == 1 and total > 1024),
            )
            if self.largest_island:
                from vittf_tpu.ops.connected import (
                    filter_similarity_largest_island,
                )

                new = {
                    k: filter_similarity_largest_island(
                        v, self.island_threshold
                    )
                    for k, v in new.items()
                }
            sims.update(new)
        # empty dirty classes (mid-annotation GUI state) serve zero maps,
        # matching what the full recompute produces for zero-count classes
        sim_shape = tuple(d // 2 for d in self.volume.shape[-3:])
        for k in dirty:
            if k not in sims:
                sims[k] = jnp.zeros(sim_shape, jnp.uint8)

        self._last_annotations = {k: v.copy() for k, v in ann_np.items()}
        self.similarities = {k: sims[k] for k in ann_np}
        return self.similarities

    def predict(self, thresholds=None) -> jnp.ndarray:
        if not self.similarities:
            raise RuntimeError("No similarities yet — call update_annotations first")
        ths = thresholds or (
            CT_ORG_THRESHOLDS[: len(self.similarities)]
            if len(self.similarities) <= len(CT_ORG_THRESHOLDS)
            else [0.25] * len(self.similarities)
        )
        return fuse_predictions(self.similarities, ths)

    def export(self, data_dir: str | Path) -> None:
        """Write similarities + predictions per the artifact contract
        (atomic writes — frontends poll these files).

        Maps leave the device as ONE stacked fetch, and only maps that
        changed since the last export cross the link: per-class
        ``np.asarray`` calls would serialize C+1 round trips, and with
        dirty tracking an unchanged class keeps the same immutable device
        array, so its previously fetched host bytes are exact. The fused
        prediction is computed ON HOST from those cached bytes
        (``fuse_predictions_host``, bit-identical to the device fuse) —
        a one-class edit therefore ships exactly one map over the link,
        not one map plus a full label volume."""
        from vittf_tpu.core.io import save_array
        from vittf_tpu.pipeline.ntf import fuse_predictions_host

        data_dir = Path(data_dir)
        names = list(self.similarities)
        if not names:  # cleared annotations: serve empty + background
            self._export_cache.clear()  # no names left: unpin device maps
            sim_shape = tuple(d // 2 for d in self.volume.shape[-3:])
            save_similarities(data_dir / "similarities.npy", {})
            save_array(
                data_dir / "predictions.npy",
                np.zeros(sim_shape, np.uint8),
            )
            return
        fetch = [
            n for n in names
            if self._export_cache.get(n, (None,))[0]
            is not self.similarities[n]
        ]
        if fetch:
            stacked = np.asarray(
                jnp.stack([self.similarities[n] for n in fetch])
            )
            for i, n in enumerate(fetch):
                self._export_cache[n] = (self.similarities[n], stacked[i])
        # drop classes that no longer exist (their device arrays would
        # otherwise stay pinned in HBM via the cache reference)
        for stale in set(self._export_cache) - set(names):
            del self._export_cache[stale]
        host_maps = {n: self._export_cache[n][1] for n in names}
        save_similarities(data_dir / "similarities.npy", host_maps)
        ths = (
            CT_ORG_THRESHOLDS[: len(names)]
            if len(names) <= len(CT_ORG_THRESHOLDS)
            else [0.25] * len(names)
        )
        save_array(
            data_dir / "predictions.npy",
            fuse_predictions_host(host_maps, ths),
        )


class _INotify:
    """Minimal ctypes inotify watch on one directory (Linux only).

    The serve loop used to sleep-poll ``annotations.npy`` — a 0.25 s poll
    adds ~125 ms median latency to every frame for free. inotify wakes the
    loop the moment the writer closes (or renames in) the file; callers
    fall back to polling where inotify is unavailable."""

    # linux/inotify.h: writes complete on CLOSE_WRITE; atomic writers
    # rename a temp file in (MOVED_TO); CREATE covers fresh directories
    _MASK = 0x0008 | 0x0080 | 0x0100  # IN_CLOSE_WRITE | IN_MOVED_TO | IN_CREATE

    def __init__(self, directory: Path):
        import ctypes
        import ctypes.util

        libc_name = ctypes.util.find_library("c") or "libc.so.6"
        self._libc = ctypes.CDLL(libc_name, use_errno=True)
        self.fd = self._libc.inotify_init1(os.O_NONBLOCK)
        if self.fd < 0:
            raise OSError(ctypes.get_errno(), "inotify_init1 failed")
        wd = self._libc.inotify_add_watch(
            self.fd, os.fsencode(str(directory)), self._MASK
        )
        if wd < 0:
            err = ctypes.get_errno()
            os.close(self.fd)
            raise OSError(err, "inotify_add_watch failed")

    def wait(self, timeout: float) -> bool:
        """Block until a directory event or ``timeout`` seconds; drains the
        event queue (the caller re-checks file content either way)."""
        import select

        r, _, _ = select.select([self.fd], [], [], timeout)
        if not r:
            return False
        try:
            while os.read(self.fd, 65536):
                pass
        except BlockingIOError:
            pass
        return True

    def close(self) -> None:
        os.close(self.fd)


def watch_directory(
    data_dir: str | Path,
    session: InteractiveSession,
    poll_interval: float = 0.25,
    max_updates: int | None = None,
    on_update=None,
    verbose: bool = True,
    use_inotify: bool = True,
) -> int:
    """Serve the artifact contract: on every ``annotations.npy`` change,
    recompute similarities and write ``similarities.npy``/``predictions.npy``.

    Change detection is event-driven (inotify) where available, with
    ``poll_interval`` as the fallback poll cadence (and the event-wait
    timeout). A change means the file's CONTENT changed: the bytes are
    hashed before parsing, so mtime-only rewrites of identical annotations
    are skipped without recomputing anything (VERDICT r4 next #4).

    Returns the number of updates served (runs until interrupted when
    ``max_updates`` is None).
    """
    import hashlib
    import io

    data_dir = Path(data_dir)
    ann_path = data_dir / "annotations.npy"
    notifier = None
    if use_inotify:
        try:
            notifier = _INotify(data_dir)
        except Exception:
            notifier = None  # non-Linux / exotic fs: poll fallback
    last_digest: bytes | None = None
    served = 0
    try:
        while max_updates is None or served < max_updates:
            try:
                raw = ann_path.read_bytes()
            except (FileNotFoundError, OSError):
                raw = None
            digest = (
                hashlib.blake2b(raw, digest_size=16).digest()
                if raw is not None
                else None
            )
            if raw is None or digest == last_digest:
                if notifier is not None:
                    notifier.wait(poll_interval)
                else:
                    time.sleep(poll_interval)
                continue
            t0 = time.perf_counter()
            try:
                data = np.load(io.BytesIO(raw), allow_pickle=True)[()]
                annotations = {k: np.asarray(v) for k, v in data.items()}
            except Exception as e:  # partially-written file: retry
                if verbose:
                    print(f"annotations read failed ({e}); retrying")
                if notifier is not None:
                    notifier.wait(poll_interval)
                else:
                    time.sleep(poll_interval)
                continue
            last_digest = digest
            sims = session.update_annotations(annotations)
            jax.block_until_ready(sims)
            session.export(data_dir)
            served += 1
            dt = time.perf_counter() - t0
            if verbose:
                print(
                    f"update {served}: {len(annotations)} classes in "
                    f"{dt*1e3:.0f}ms"
                )
            if on_update:
                on_update(served, dt)
    finally:
        if notifier is not None:
            notifier.close()
    return served
