#!/usr/bin/env python
"""Sweep flash-attention kernel tilings at the Wan A14B shape on the real chip."""

import itertools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from goal_force_tpu.ops import flash_attention as fa  # noqa: E402

B, S, N, H = 2, 32760, 40, 128
PEAK = 197e12


def run(bq, bk, bki, pipe, q, k, v):
    fn = jax.jit(lambda q, k, v: fa._fa_forward(
        q, k, v, H ** -0.5, bq, bk, with_lse=False,
        bk_inner_opt=bki, pipelined=pipe)[0].astype(jnp.float32).mean())
    try:
        for i in range(2):
            float(fn(q + i, k, v))
        t0 = time.perf_counter()
        iters = 4
        for i in range(iters):
            float(fn(q + 0.001 * i, k, v))
        dt = (time.perf_counter() - t0) / iters
    except Exception as e:
        print(f"bq={bq} bk={bk} bki={bki} pipe={pipe}: FAIL {str(e)[:120]}")
        return
    flops = 4.0 * B * N * S * S * H
    print(f"bq={bq} bk={bk} bki={bki} pipe={int(pipe)}: {dt*1e3:7.1f} ms  "
          f"MFU {flops/dt/PEAK*100:5.1f}%", flush=True)


def main():
    key = jax.random.PRNGKey(0)
    kq, kk, kv_ = jax.random.split(key, 3)
    q = jax.random.normal(kq, (B, S, N, H), jnp.bfloat16)
    k = jax.random.normal(kk, (B, S, N, H), jnp.bfloat16)
    v = jax.random.normal(kv_, (B, S, N, H), jnp.bfloat16)

    configs = [
        (1024, 2048, 1024, False),   # round-1 shipped config
        (1024, 2048, 512, True),     # current
        (1024, 2048, 512, False),
        (512, 2048, 512, True),
        (2048, 2048, 512, True),
        (1024, 4096, 512, True),
        (1024, 1024, 512, True),
        (1024, 1024, 1024, False),
        (512, 4096, 1024, True),
        (1024, 2048, 256, True),
        (2048, 4096, 512, True),
    ]
    for bq, bk, bki, pipe in configs:
        run(bq, bk, bki, pipe, q, k, v)


if __name__ == "__main__":
    main()
