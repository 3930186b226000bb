"""Microbench: int8 vs bf16 MXU rate under Pallas/Mosaic on this chip.

Decides whether an int8 variant of the fused ViT block is worth building:
v5e datasheet rate is 394 TOPS int8 vs 197 TFLOP/s bf16 (2x). Each
kernel runs a CHAIN of square matmuls (x <- f(x @ W)) so the MXU work
cannot be hoisted/CSE'd, and each step includes the dtype's realistic
epilogue: bf16 casts the fp32 accumulator back to bf16; int8 re-quantizes
per-row (max-abs -> scale -> round) — the same epilogue a quantized block
kernel would pay between layers.

Usage: python scripts/bench_int8_gemm.py [--rows 2048] [--dim 1536]
       [--chain 32] [--iters 20]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bf16_kernel(x_ref, w_ref, out_ref, *, chain):
    def body(_, x):
        y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.float32)
        return y.astype(jnp.bfloat16)

    out_ref[:] = jax.lax.fori_loop(0, chain, body, x_ref[:])


def _int8_kernel(x_ref, w_ref, out_ref, *, chain):
    def body(_, x):
        y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.int32)
        yf = y.astype(jnp.float32)
        # per-row dynamic requant: the epilogue an int8 block kernel pays
        m = jnp.max(jnp.abs(yf), axis=-1, keepdims=True)
        scale = 127.0 / jnp.maximum(m, 1e-6)
        return jnp.round(yf * scale).astype(jnp.int8)

    out_ref[:] = jax.lax.fori_loop(0, chain, body, x_ref[:])


def _int8_noquant_kernel(x_ref, w_ref, out_ref, *, chain):
    # lower bound on the epilogue: keep int8 by shifting (no fp round trip)
    def body(_, x):
        y = jnp.dot(x, w_ref[:], preferred_element_type=jnp.int32)
        return (y >> 8).astype(jnp.int8)

    out_ref[:] = jax.lax.fori_loop(0, chain, body, x_ref[:])


def run(name, kernel, x, w, chain, iters):
    f = pl.pallas_call(
        functools.partial(kernel, chain=chain),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
    )
    fj = jax.jit(f)
    out = fj(x, w)
    np.asarray(jax.device_get(out[0, 0]))  # compile + real fence
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fj(x, w)
    np.asarray(jax.device_get(out[0, 0]))  # axon: block_until_ready lies
    dt = (time.perf_counter() - t0) / iters
    flops = 2 * x.shape[0] * w.shape[0] * w.shape[1] * chain
    print(f"{name:>14}: {dt * 1e3:8.3f} ms  {flops / dt / 1e12:6.1f} Tops/s")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2048)
    ap.add_argument("--dim", type=int, default=1536)
    ap.add_argument("--chain", type=int, default=32)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    xb = jnp.asarray(rng.standard_normal((args.rows, args.dim)), jnp.bfloat16)
    wb = jnp.asarray(
        rng.standard_normal((args.dim, args.dim)) / np.sqrt(args.dim),
        jnp.bfloat16,
    )
    xi = jnp.asarray(rng.integers(-127, 128, (args.rows, args.dim)), jnp.int8)
    wi = jnp.asarray(rng.integers(-8, 9, (args.dim, args.dim)), jnp.int8)

    t_bf = run("bf16", _bf16_kernel, xb, wb, args.chain, args.iters)
    t_i8 = run("int8+requant", _int8_kernel, xi, wi, args.chain, args.iters)
    t_i8n = run("int8+shift", _int8_noquant_kernel, xi, wi, args.chain,
                args.iters)
    print(f"speedup int8+requant vs bf16: {t_bf / t_i8:.2f}x")
    print(f"speedup int8+shift   vs bf16: {t_bf / t_i8n:.2f}x")


if __name__ == "__main__":
    main()
