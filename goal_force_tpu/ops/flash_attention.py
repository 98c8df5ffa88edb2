"""Pallas TPU flash attention (forward).

Replaces the reference's FlashAttention-2/3 CUDA dependency
(/root/reference/diffsynth/models/wan_video_dit.py:35-48). Online-softmax tiling per the
standard TPU recipe: grid (batch*heads, Q tiles, KV tiles), f32 running max/sum/accumulator
in VMEM scratch, output written on the last KV tile. Non-causal (video DiT self/cross
attention), arbitrary kv length via scalar-prefetched true length + key masking (the Wan
sequence 32,760 pads to 32,768).

Head dim must be 128 (lane width) — true for Wan A14B (5120/40) and umt5 (4096/64? no:
the T5 path uses its own einsum attention; this kernel serves the DiT).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK_VALUE = -0.7 * float(jnp.finfo(jnp.float32).max)
LANES = 128
# Saturation point for the statically-dispatched max-free kernel (log2 domain).
NOMAX_CLAMP = 90.0


def _fa_kernel_fwd(kv_len_ref, q_ref, k_ref, v_ref, o_ref, lse_ref, m_scr, l_scr, acc_scr,
                   *, scale, bk):
    """Forward with logsumexp residual output (for the custom-vjp backward)."""
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    kv_len = kv_len_ref[0]

    @pl.when(kv_idx * bk < kv_len)
    def _compute():
        q = q_ref[0]
        k = k_ref[0]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale
        col = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, MASK_VALUE)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - jnp.max(m_next, axis=-1, keepdims=True))
        l_next = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next
        l_scr[...] = l_next
        v = v_ref[0]
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        lse_ref[0] = m_scr[...] + jnp.log(jnp.maximum(l, 1e-30))  # lanes replicated


def _fa_kernel_dkv(kv_len_ref, q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                   dk_ref, dv_ref, dk_scr, dv_scr, *, scale, bk):
    """dK/dV: outer grid over kv tiles, inner (arbitrary) over q tiles."""
    q_idx = pl.program_id(2)
    n_q = pl.num_programs(2)

    @pl.when(q_idx == 0)
    def _init():
        dk_scr[...] = jnp.zeros_like(dk_scr)
        dv_scr[...] = jnp.zeros_like(dv_scr)

    kv_len = kv_len_ref[0]
    kv_idx = pl.program_id(1)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    lse_col = lse_ref[0][:, :1]           # (bq, 1), lanes replicated
    # di = sum(o * do) per row, recomputed in-kernel (cheap vs a (BN,S,128) f32 temp)
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale  # (bq, bk)
    col = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    p = jnp.where(col < kv_len, jnp.exp(s - lse_col), 0.0)               # (bq, bk)
    dv_scr[...] += jax.lax.dot_general(p.astype(do.dtype), do,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)          # (bq, bk)
    ds = (p * (dp - di) * scale).astype(q.dtype)
    dk_scr[...] += jax.lax.dot_general(ds, q,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

    @pl.when(q_idx == n_q - 1)
    def _store():
        dk_ref[0] = dk_scr[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[...].astype(dv_ref.dtype)


def _fa_kernel_dq(kv_len_ref, q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                  dq_ref, dq_scr, *, scale, bk):
    """dQ: outer grid over q tiles, inner (arbitrary) over kv tiles."""
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        dq_scr[...] = jnp.zeros_like(dq_scr)

    kv_len = kv_len_ref[0]
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    o = o_ref[0]
    lse_col = lse_ref[0][:, :1]
    di = jnp.sum(o.astype(jnp.float32) * do.astype(jnp.float32), axis=-1, keepdims=True)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    col = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    p = jnp.where(col < kv_len, jnp.exp(s - lse_col), 0.0)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - di) * scale).astype(k.dtype)
    dq_scr[...] += jax.lax.dot(ds, k,
                               preferred_element_type=jnp.float32)

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        dq_ref[0] = dq_scr[...].astype(dq_ref.dtype)


LOG2E = 1.4426950408889634


def _fa_kernel(kv_len_ref, q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
               *, bk, bk_inner, pipelined=True, heads=1):
    """Two-level KV tiling: the grid walks bk-sized major tiles (DMA granularity); an
    unrolled inner loop processes bk_inner sub-tiles, letting the next sub-tile's MXU
    matmul overlap the previous one's VPU softmax — measured ~1.9x over single-level
    (656 -> 347 ms at the Wan shape).

    VPU diet (the softmax is the bottleneck, not the MXU): (a) log2-domain online
    softmax — the caller pre-folds scale*log2(e) into q, so exp2 replaces exp AND the
    per-logit scale multiply vanishes (one VPU pass over S^2 saved; the fold itself
    is one pass over S*128, 256x cheaper); (b) the padded-column mask
    (iota+compare+select, 3 VPU ops/logit) only runs on inner sub-tiles that actually
    straddle kv_len — a tile-level pl.when with a mask-free duplicate body covers the
    other 31/32 tiles of the 32,768-padded Wan sequence."""
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # per-BATCH valid-key length (varlen: prefix-valid keys); the packed
    # grid walks (b*n, ...) so the batch row is program_id(0)//heads
    kv_len = kv_len_ref[pl.program_id(0) // heads]

    @pl.when(kv_idx * bk < kv_len)
    def _compute():
        q = q_ref[0]                       # (bq, H), pre-scaled to log2 domain
        n_inner = bk // bk_inner

        def qk(j):
            k = k_ref[0, pl.ds(j * bk_inner, bk_inner), :]
            return jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )                               # (bq, bk_inner), log2-domain logits

        # Software pipelining: issue sub-tile j+1's QK^T BEFORE sub-tile j's softmax,
        # so the MXU chews the next logits while the VPU exps the current ones. The
        # in-order schedule otherwise serializes MXU and VPU and the kernel runs at
        # their SUM (measured 464 ms ~= 223 MXU + 240 VPU at the Wan shape).
        s = qk(0)
        for j in range(n_inner):
            s_next = qk(j + 1) if (pipelined and j + 1 < n_inner) else None
            start = j * bk_inner
            if not pipelined and j > 0:
                s = qk(j)

            def tile(masked, s=s, start=start):
                if masked:
                    col = (kv_idx * bk + start
                           + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
                    s = jnp.where(col < kv_len, s, MASK_VALUE)

                m_prev = m_scr[...]        # (bq, LANES), lanes all equal
                l_prev = l_scr[...]
                m_curr = jnp.max(s, axis=-1, keepdims=True)      # (bq, 1)
                m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
                alpha = jnp.exp2(m_prev - m_next)                # (bq, LANES)
                p = jnp.exp2(s - jnp.max(m_next, axis=-1, keepdims=True))
                l_next = alpha * l_prev + jnp.broadcast_to(
                    jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
                )
                m_scr[...] = m_next
                l_scr[...] = l_next

                v = v_ref[0, pl.ds(start, bk_inner), :]
                acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32
                )

            begin = kv_idx * bk + start
            fully_valid = begin + bk_inner <= kv_len
            straddles = (begin < kv_len) & ~fully_valid
            pl.when(fully_valid)(lambda: tile(False))
            pl.when(straddles)(lambda: tile(True))
            # begin >= kv_len: sub-tile is entirely padding — skipped.
            s = s_next

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _fa_kernel_nomax(kv_len_ref, q_ref, k_ref, v_ref, o_ref, l_scr, acc_scr,
                     *, bk, bk_inner, pipelined=False, clamp=None, heads=1):
    """Max-free softmax: p = exp2(s) raw, no running max, no rescale.

    Any constant offset M cancels between acc and l in o = acc/l, so max
    subtraction only exists to keep exp2 inside f32 range. The wrapper computes a
    per-call Cauchy-Schwarz bound on the log2-domain logits
    (max_row|q'| * max_row|k|, q' pre-scaled by scale*log2e) and takes this kernel
    only when every intermediate provably fits f32 — true in practice for the
    qk-RMS-normed Wan/DiT attention (bound ~16; overflow needs ~100). Skipping the
    online max removes a full VPU reduce pass over every logit plus the running
    m/alpha updates and the acc rescale multiply — the kernel is VPU-bound
    (softmax), not MXU-bound, so this lands directly on the critical path."""
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # per-BATCH valid-key length (varlen: prefix-valid keys); the packed
    # grid walks (b*n, ...) so the batch row is program_id(0)//heads
    kv_len = kv_len_ref[pl.program_id(0) // heads]

    @pl.when(kv_idx * bk < kv_len)
    def _compute():
        q = q_ref[0]                       # (bq, H), pre-scaled to log2 domain
        n_inner = bk // bk_inner

        def qk(j):
            k = k_ref[0, pl.ds(j * bk_inner, bk_inner), :]
            return jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
            )

        s = qk(0)
        for j in range(n_inner):
            start = j * bk_inner
            # software pipelining (opt-in): issue sub-tile j+1's QK^T before
            # sub-tile j's exp2/sum so the MXU overlaps the VPU softmax
            s_next = qk(j + 1) if (pipelined and j + 1 < n_inner) else None
            if not pipelined and j > 0:
                s = qk(j)

            def tile(masked, s=s, start=start):
                if masked:
                    col = (kv_idx * bk + start
                           + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1))
                    s = jnp.where(col < kv_len, s, MASK_VALUE)
                if clamp is not None:
                    # static-dispatch safety: saturate instead of overflowing.
                    # A no-op (exact) whenever every log2-domain logit <= clamp —
                    # true for any realistic input (qk-normed DiT bounds ~16);
                    # beyond it, p <= 2^clamp keeps l and acc finite in f32.
                    s = jnp.minimum(s, clamp)
                p = jnp.exp2(s)            # exp2(MASK_VALUE) == 0 exactly
                l_scr[...] += jnp.broadcast_to(
                    jnp.sum(p, axis=-1, keepdims=True), l_scr.shape
                )
                v = v_ref[0, pl.ds(start, bk_inner), :]
                acc_scr[...] += jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32
                )

            begin = kv_idx * bk + start
            fully_valid = begin + bk_inner <= kv_len
            straddles = (begin < kv_len) & ~fully_valid
            pl.when(fully_valid)(lambda: tile(False))
            pl.when(straddles)(lambda: tile(True))
            # begin >= kv_len: sub-tile is entirely padding — skipped.
            s = s_next

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _pad_to(x, axis, multiple):
    size = x.shape[axis]
    pad = (-size) % multiple
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _to_bn(x):
    b, s, n, h = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b * n, s, h)


def _from_bn(x, b, n, s):
    return x[:, :s].reshape(b, n, s, x.shape[-1]).transpose(0, 2, 1, 3)


def _fa_forward(q, k, v, scale, block_q, block_k, with_lse,
                bk_inner_opt=None, pipelined=False, dispatch="auto",
                kv_len=None):
    b, sq, n, h = q.shape
    skv = k.shape[1]
    if not with_lse:
        # Inference path blocks over the PACKED (B, S, N*H) layout: heads are contiguous
        # 128-column blocks of the projection output, so no (B,S,N,H)->(B*N,S,H)
        # relayout is needed (those 4 transposes cost ~240 ms at the Wan shape).
        # scale*log2(e) is folded into q here (S*128 elements) instead of into every
        # logit tile inside the kernel (S^2 elements).
        qs = (q.reshape(b, sq, n * h) * (scale * LOG2E)).astype(q.dtype)
        qb = _pad_to(qs, 1, block_q)
        kb = _pad_to(k.reshape(b, skv, n * h), 1, block_k)
        vb = _pad_to(v.reshape(b, skv, n * h), 1, block_k)
        sq_p, skv_p = qb.shape[1], kb.shape[1]
        grid = (b * n, sq_p // block_q, skv_p // block_k)
        idx_qp = lambda bn, iq, ik, _len, _n=n: (bn // _n, iq, bn % _n)
        idx_kp = lambda bn, iq, ik, _len, _n=n: (bn // _n, ik, bn % _n)
        # Swept on a v5e at (2, 32760, 40, 128) with in-program loop timing
        # (scripts/sweep_attn.py, scripts/bench_attn_ceiling.py): bk=2048/inner=1024
        # unpipelined is fastest at 350 ms / 63.8% MFU; manual software pipelining
        # doesn't beat Mosaic's own scheduling and 1024-wide double-buffering
        # overflows the 16 MB scoped VMEM. (The official jax.experimental pallas
        # flash/splash kernels run 2.5-3.1 s at this shape.)
        bk_inner = min(block_k, bk_inner_opt or 1024)
        kernel_kw = dict(bk=block_k, bk_inner=bk_inner, pipelined=pipelined,
                         heads=n)
        common = dict(
            out_shape=jax.ShapeDtypeStruct((b, sq_p, n * h), q.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )
        grid_common = dict(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, h), idx_qp),
                pl.BlockSpec((1, block_k, h), idx_kp),
                pl.BlockSpec((1, block_k, h), idx_kp),
            ],
            out_specs=pl.BlockSpec((1, block_q, h), idx_qp),
        )
        # per-batch valid-key length (varlen attention over prefix-valid keys,
        # e.g. HunyuanVideo's [img ++ valid-text] joint groups)
        if kv_len is None:
            kv_len = jnp.full((b,), skv, jnp.int32)
        else:
            kv_len = jnp.broadcast_to(jnp.asarray(kv_len, jnp.int32), (b,))

        def run_max(ops):
            kernel = functools.partial(_fa_kernel, **kernel_kw)
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    scratch_shapes=[
                        pltpu.VMEM((block_q, LANES), jnp.float32),
                        pltpu.VMEM((block_q, LANES), jnp.float32),
                        pltpu.VMEM((block_q, h), jnp.float32),
                    ],
                    **grid_common,
                ),
                **common,
            )(kv_len, *ops)

        def run_nomax(ops, clamp=None):
            kernel = functools.partial(_fa_kernel_nomax, clamp=clamp,
                                       **kernel_kw)
            return pl.pallas_call(
                kernel,
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    scratch_shapes=[
                        pltpu.VMEM((block_q, LANES), jnp.float32),
                        pltpu.VMEM((block_q, h), jnp.float32),
                    ],
                    **grid_common,
                ),
                **common,
            )(kv_len, *ops)

        # Static dispatch for qk-normed callers (wan_dit): skip the runtime
        # bound + lax.cond entirely — the cond's operand materialization + the
        # three reduce passes cost ~20 ms/block at the Wan A14B shape
        # (measured: 566 -> 546 ms per ControlNet block). Overflow safety comes
        # from an in-kernel saturating clamp instead (exact whenever every
        # log2-domain logit <= NOMAX_CLAMP; qk-normed attention bounds ~16).
        # l <= Skv*2^90 = 2^105 and acc <= 2^105*max|v| stay inside f32 for any
        # max|v| < 2^22 — far beyond norm-stabilized bf16 activations.
        if dispatch == "nomax":
            out = run_nomax((qb, kb, vb), clamp=NOMAX_CLAMP)
            return out[:, :sq].reshape(b, sq, n, h), None

        # Cauchy-Schwarz bound on any log2-domain logit: max_row|q'|*max_row|k| over
        # per-head rows (q' carries scale*log2e). Row p=exp2(s) values stay <=
        # 2^bound, l <= Skv*2^bound, acc <= l*max|v| — all inside f32 iff
        # bound + log2(Skv) + log2(max|v|) < 127; threshold 100 leaves the margin.
        # Three O(S*128) reduce passes buy removal of an O(S^2) reduce inside the
        # VPU-bound kernel. qk-normed DiT attention bounds at ~16, so the nomax
        # branch is the one that runs in practice; unnormed outliers fall back.
        f32 = jnp.float32
        qmax = jnp.sqrt(jnp.max(jnp.sum(
            jnp.square(qs.reshape(b, sq, n, h).astype(f32)), axis=-1)))
        kmax = jnp.sqrt(jnp.max(jnp.sum(
            jnp.square(k.astype(f32)), axis=-1)))
        vmax = jnp.max(jnp.abs(v.astype(f32)))
        bound = qmax * kmax + jnp.log2(jnp.maximum(vmax, 1.0))
        out = jax.lax.cond(bound < 100.0, run_nomax, run_max, (qb, kb, vb))
        return out[:, :sq].reshape(b, sq, n, h), None
    # Training path (lse residual) keeps the (B*N, S, H) relayout for now.
    qb = _pad_to(_to_bn(q), 1, block_q)
    kb = _pad_to(_to_bn(k), 1, block_k)
    vb = _pad_to(_to_bn(v), 1, block_k)
    sq_p, skv_p = qb.shape[1], kb.shape[1]
    grid = (b * n, sq_p // block_q, skv_p // block_k)
    idx_q = lambda bn, iq, ik, _len: (bn, iq, 0)
    idx_k = lambda bn, iq, ik, _len: (bn, ik, 0)
    common = dict(
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, h), idx_q),
            pl.BlockSpec((1, block_k, h), idx_k),
            pl.BlockSpec((1, block_k, h), idx_k),
        ],
    )
    kernel = functools.partial(_fa_kernel_fwd, scale=scale, bk=block_k)
    out, lse = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((b * n, sq_p, h), q.dtype),
            jax.ShapeDtypeStruct((b * n, sq_p, LANES), jnp.float32),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            out_specs=(
                pl.BlockSpec((1, block_q, h), idx_q),
                pl.BlockSpec((1, block_q, LANES), idx_q),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, h), jnp.float32),
            ],
            **common,
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(jnp.asarray([skv], jnp.int32), qb, kb, vb)
    return _from_bn(out, b, n, sq), lse  # lse stays padded (BN, Sq_p)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, scale, block_q, block_k, dispatch):
    return _fa_forward(q, k, v, scale, block_q, block_k, with_lse=False,
                       dispatch=dispatch)[0]


def _flash_fwd(q, k, v, scale, block_q, block_k, dispatch):
    # Training path always uses the online-max kernel (lse residual needed).
    out, lse = _fa_forward(q, k, v, scale, block_q, block_k, with_lse=True)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, block_k, dispatch, res, do):
    q, k, v, out, lse = res
    # the dKV/dQ kernels hold s/p/ds tiles plus f32 scratch: the forward's tuned
    # blocks overflow the 16 MB scoped VMEM (measured +3.2 MB at 1024/2048 bf16)
    block_q = min(block_q, 512)
    block_k = min(block_k, 1024)
    b, sq, n, h = q.shape
    skv = k.shape[1]
    qb = _pad_to(_to_bn(q), 1, block_q)
    kb = _pad_to(_to_bn(k), 1, block_k)
    vb = _pad_to(_to_bn(v), 1, block_k)
    dob = _pad_to(_to_bn(do), 1, block_q)
    ob = _pad_to(_to_bn(out), 1, block_q)
    sq_p, skv_p = qb.shape[1], kb.shape[1]
    bn = b * n
    n_q, n_kv = sq_p // block_q, skv_p // block_k
    kv_len = jnp.asarray([skv], jnp.int32)

    dk, dv = pl.pallas_call(
        functools.partial(_fa_kernel_dkv, scale=scale, bk=block_k),
        out_shape=(
            jax.ShapeDtypeStruct((bn, skv_p, h), k.dtype),
            jax.ShapeDtypeStruct((bn, skv_p, h), v.dtype),
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bn, n_kv, n_q),
            in_specs=[
                pl.BlockSpec((1, block_q, h), lambda b_, ik, iq, _l: (b_, iq, 0)),
                pl.BlockSpec((1, block_k, h), lambda b_, ik, iq, _l: (b_, ik, 0)),
                pl.BlockSpec((1, block_k, h), lambda b_, ik, iq, _l: (b_, ik, 0)),
                pl.BlockSpec((1, block_q, h), lambda b_, ik, iq, _l: (b_, iq, 0)),
                pl.BlockSpec((1, block_q, h), lambda b_, ik, iq, _l: (b_, iq, 0)),
                pl.BlockSpec((1, block_q, LANES), lambda b_, ik, iq, _l: (b_, iq, 0)),
            ],
            out_specs=(
                pl.BlockSpec((1, block_k, h), lambda b_, ik, iq, _l: (b_, ik, 0)),
                pl.BlockSpec((1, block_k, h), lambda b_, ik, iq, _l: (b_, ik, 0)),
            ),
            scratch_shapes=[
                pltpu.VMEM((block_k, h), jnp.float32),
                pltpu.VMEM((block_k, h), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kv_len, qb, kb, vb, ob, dob, lse)

    dq = pl.pallas_call(
        functools.partial(_fa_kernel_dq, scale=scale, bk=block_k),
        out_shape=jax.ShapeDtypeStruct((bn, sq_p, h), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(bn, n_q, n_kv),
            in_specs=[
                pl.BlockSpec((1, block_q, h), lambda b_, iq, ik, _l: (b_, iq, 0)),
                pl.BlockSpec((1, block_k, h), lambda b_, iq, ik, _l: (b_, ik, 0)),
                pl.BlockSpec((1, block_k, h), lambda b_, iq, ik, _l: (b_, ik, 0)),
                pl.BlockSpec((1, block_q, h), lambda b_, iq, ik, _l: (b_, iq, 0)),
                pl.BlockSpec((1, block_q, h), lambda b_, iq, ik, _l: (b_, iq, 0)),
                pl.BlockSpec((1, block_q, LANES), lambda b_, iq, ik, _l: (b_, iq, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, h), lambda b_, iq, ik, _l: (b_, iq, 0)),
            scratch_shapes=[pltpu.VMEM((block_q, h), jnp.float32)],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(kv_len, qb, kb, vb, ob, dob, lse)

    return (_from_bn(dq, b, n, sq), _from_bn(dk, b, n, skv), _from_bn(dv, b, n, skv))


_flash.defvjp(_flash_fwd, _flash_bwd)


def _fa_kernel_int8(kv_len_ref, sq_all_ref, sk_all_ref, q_ref, k_ref, v_ref, o_ref,
                    m_scr, l_scr, acc_scr, *, scale, bk):
    """Int8 q/k variant (SageAttention analog — the reference's optional backend at
    wan_video_dit.py:49-54): per-tile symmetric quantization outside the kernel, int8
    MXU for QK^T (2x bf16 peak on v5e), f32 softmax, bf16 PV."""
    bn_idx = pl.program_id(0)
    q_idx = pl.program_id(1)
    kv_idx = pl.program_id(2)
    n_kv = pl.num_programs(2)

    @pl.when(kv_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    kv_len = kv_len_ref[0]

    @pl.when(kv_idx * bk < kv_len)
    def _compute():
        q = q_ref[0]                       # (bq, H) int8
        k = k_ref[0]                       # (bk, H) int8
        s32 = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
        )
        tile_scale = scale * sq_all_ref[bn_idx, q_idx] * sk_all_ref[bn_idx, kv_idx]
        s = s32.astype(jnp.float32) * tile_scale
        col = kv_idx * bk + jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < kv_len, s, MASK_VALUE)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_curr = jnp.max(s, axis=-1, keepdims=True)
        m_next = jnp.maximum(m_prev, jnp.broadcast_to(m_curr, m_prev.shape))
        alpha = jnp.exp(m_prev - m_next)
        p = jnp.exp(s - jnp.max(m_next, axis=-1, keepdims=True))
        l_next = alpha * l_prev + jnp.broadcast_to(
            jnp.sum(p, axis=-1, keepdims=True), l_prev.shape
        )
        m_scr[...] = m_next
        l_scr[...] = l_next
        v = v_ref[0]
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32
        )

    @pl.when(kv_idx == n_kv - 1)
    def _store():
        l = l_scr[...]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)


def _quantize_tiles(x, block):
    """(BN, S, H) -> int8 values + per-(row-tile) f32 scales (BN, S//block)."""
    bn, s, h = x.shape
    xt = x.reshape(bn, s // block, block, h).astype(jnp.float32)
    amax = jnp.max(jnp.abs(xt), axis=(2, 3))
    sc = jnp.maximum(amax, 1e-6) / 127.0
    xi = jnp.round(xt / sc[..., None, None]).astype(jnp.int8).reshape(bn, s, h)
    return xi, sc


def flash_attention_int8(q, k, v, scale: float, block_q: int = 1024, block_k: int = 1024):
    """Int8-QK flash attention (inference-only, near-lossless; not differentiable)."""
    b, sq, n, h = q.shape
    skv = k.shape[1]
    if h != LANES:
        raise ValueError(f"flash_attention requires head_dim=128, got {h}")
    block_q = min(block_q, max(LANES, sq))
    block_k = min(block_k, max(LANES, skv))
    qb = _pad_to(_to_bn(q), 1, block_q)
    kb = _pad_to(_to_bn(k), 1, block_k)
    vb = _pad_to(_to_bn(v), 1, block_k)
    qi, sqs = _quantize_tiles(qb, block_q)
    ki, sks = _quantize_tiles(kb, block_k)
    sq_p, skv_p = qb.shape[1], kb.shape[1]
    grid = (b * n, sq_p // block_q, skv_p // block_k)
    out = pl.pallas_call(
        functools.partial(_fa_kernel_int8, scale=scale, bk=block_k),
        out_shape=jax.ShapeDtypeStruct((b * n, sq_p, h), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,  # kv_len + per-tile q/k scales live in SMEM
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, block_q, h), lambda bn_, iq, ik, *_: (bn_, iq, 0)),
                pl.BlockSpec((1, block_k, h), lambda bn_, iq, ik, *_: (bn_, ik, 0)),
                pl.BlockSpec((1, block_k, h), lambda bn_, iq, ik, *_: (bn_, ik, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, h), lambda bn_, iq, ik, *_: (bn_, iq, 0)),
            scratch_shapes=[
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, LANES), jnp.float32),
                pltpu.VMEM((block_q, h), jnp.float32),
            ],
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(jnp.asarray([skv], jnp.int32), sqs, sks, qi, ki, vb)
    return _from_bn(out, b, n, sq)


def flash_attention(q, k, v, scale: float, block_q: int = 1024, block_k: int = 2048,
                    dispatch: str = "auto", kv_len=None):
    """q: (B, Sq, N, H); k/v: (B, Skv, N, H) -> (B, Sq, N, H). H must be 128.

    Differentiable: a custom VJP recomputes attention tile-by-tile in separate dK/dV and
    dQ kernels from the forward's logsumexp residual — O(S) memory for training at the
    full 32,760-token Wan sequence (the role of FlashAttention-2's backward in the
    reference stack).

    dispatch: "auto" chooses max-free vs online-max softmax at runtime from a
    Cauchy-Schwarz logit bound; "nomax" statically takes the max-free kernel
    with a saturating in-kernel clamp (exact while every log2-domain logit <=
    NOMAX_CLAMP) — for callers whose architecture keeps logits small
    (qk-RMS-norm).

    kv_len: optional per-batch valid-key count (scalar or (B,) int array) for
    varlen attention over PREFIX-valid keys — queries never attend to keys at
    index >= kv_len (e.g. HunyuanVideo's [img ++ valid-text] joint groups).
    Inference-only (not differentiable)."""
    if q.shape[-1] != LANES:
        raise ValueError(f"flash_attention requires head_dim=128, got {q.shape[-1]}")
    if dispatch not in ("auto", "nomax"):
        raise ValueError(f"dispatch must be 'auto' or 'nomax', got {dispatch!r}")
    if q.dtype == jnp.float32:
        # f32 tiles are 2x the VMEM of bf16; the default blocks overflow the 16 MB
        # scoped budget in the backward kernels (training runs f32 master activations)
        block_q = min(block_q, 512)
        block_k = min(block_k, 1024)
    block_q = min(block_q, max(LANES, q.shape[1]))
    block_k = min(block_k, max(LANES, k.shape[1]))
    if kv_len is not None:
        return _fa_forward(q, k, v, scale, block_q, block_k, with_lse=False,
                           dispatch=dispatch, kv_len=kv_len)[0]
    return _flash(q, k, v, scale, block_q, block_k, dispatch)
