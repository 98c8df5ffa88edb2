#!/usr/bin/env python
"""Micro-bench the Pallas flash-attention kernel at the Wan A14B shape.

Self-attn shape (merged CFG): (2, 32760, 40, 128); cross-attn: kv=512.
Prints ms/call and achieved MFU vs the chip's peak bf16 FLOPs.
"""

import argparse
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goal_force_tpu.ops.attention import attention  # noqa: E402


def bench(fn, q, k, v, iters=5, warmup=2):
    """Each rep materializes a host scalar (the only reliable completion barrier on
    the axon runtime) and varies q so identical dispatches aren't served from cache."""
    for i in range(warmup):
        float(fn(q + i, k, v))
    t0 = time.perf_counter()
    for i in range(iters):
        float(fn(q + 0.001 * i, k, v))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--s", type=int, default=32760)
    ap.add_argument("--n", type=int, default=40)
    ap.add_argument("--h", type=int, default=128)
    ap.add_argument("--kv", type=int, default=None, help="kv len (cross-attn)")
    ap.add_argument("--impl", default="pallas")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak bf16 TFLOP/s (v5e=197, v5p=459)")
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    skv = args.kv or args.s
    q = jax.random.normal(kq, (args.b, args.s, args.n, args.h), jnp.bfloat16)
    k = jax.random.normal(kk, (args.b, skv, args.n, args.h), jnp.bfloat16)
    v = jax.random.normal(kv_, (args.b, skv, args.n, args.h), jnp.bfloat16)

    fn = jax.jit(lambda q, k, v: attention(q, k, v, impl=args.impl)
                 .astype(jnp.float32).mean())
    dt = bench(fn, q, k, v)
    flops = 4.0 * args.b * args.n * args.s * skv * args.h  # QK^T + PV
    mfu = flops / dt / (args.peak_tflops * 1e12)
    print(f"impl={args.impl} shape=({args.b},{args.s},{args.n},{args.h}) kv={skv}: "
          f"{dt * 1e3:.1f} ms  {flops / dt / 1e12:.1f} TFLOP/s  MFU {mfu * 100:.1f}%")


if __name__ == "__main__":
    main()
