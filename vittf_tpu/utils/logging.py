"""Observability: metric logging backends + profiler traces.

The reference logs with prints/icecream and wandb in the legacy trainers
(SURVEY.md §5). Here a small ``MetricLogger`` fans metrics out to pluggable
backends — stdout, JSONL file, and wandb when installed — and
``profile_trace`` wraps ``jax.profiler`` for TPU timeline captures.
"""
from __future__ import annotations

import json
import time
from contextlib import contextmanager
from pathlib import Path


class MetricLogger:
    """Step-indexed metric logging with stdout / JSONL / wandb backends."""

    def __init__(
        self,
        jsonl_path: str | Path | None = None,
        use_wandb: bool = False,
        wandb_kwargs: dict | None = None,
        stdout_every: int = 0,
    ):
        self.step = 0
        self.stdout_every = stdout_every
        self._jsonl = open(jsonl_path, "a") if jsonl_path else None
        self._wandb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except ImportError:
                print("wandb requested but not installed; skipping")

    def log(self, metrics: dict, step: int | None = None):
        self.step = self.step + 1 if step is None else step
        rec = {"step": self.step, "time": time.time(), **metrics}
        if self._jsonl:
            self._jsonl.write(json.dumps(rec) + "\n")
            self._jsonl.flush()
        if self._wandb:
            self._wandb.log(metrics, step=self.step)
        if self.stdout_every and self.step % self.stdout_every == 0:
            printable = {
                k: (round(v, 5) if isinstance(v, float) else v)
                for k, v in metrics.items()
            }
            print(f"[{self.step}] {printable}")

    def close(self):
        if self._jsonl:
            self._jsonl.close()
        if self._wandb:
            self._wandb.finish()


@contextmanager
def profile_trace(logdir: str | Path = "/tmp/vittf_trace"):
    """Capture a jax.profiler trace (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(str(logdir))
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@contextmanager
def debug_mode(nans: bool = True, disable_jit: bool = False):
    """The reference's debug switches (CUDA_LAUNCH_BLOCKING +
    detect_anomaly, old/utils.py:23-26) in JAX form."""
    import jax

    prev_nans = jax.config.jax_debug_nans
    prev_jit = jax.config.jax_disable_jit
    jax.config.update("jax_debug_nans", nans)
    jax.config.update("jax_disable_jit", disable_jit)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev_nans)
        jax.config.update("jax_disable_jit", prev_jit)
