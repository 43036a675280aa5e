#!/usr/bin/env python3
"""Microbench: thick-channel standard-conv formulation vs patch-banded.

The thick formulation folds the z-blocks into the channel dim (bs*Ci =
128 lanes at the model widths) and computes stride-1 SAME narrow convs
as ONE standard XLA conv with a banded (bs*Ci, bs*Co) weight expansion,
plus a tiny edge conv for the cross-block z-taps — no patch volume is
ever materialized, and XLA's native conv emitter handles the MXU tiling.

Usage: python tools/bench_thick.py [--dtype fp32|bf16] [--batch N]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax


def _band_sel(kz: int, bs: int) -> np.ndarray:
    """sel[dz, j_in, j_out] = 1 iff j_in == j_out + dz - kz//2 in range."""
    sel = np.zeros((kz, bs, bs), np.float32)
    for dz in range(kz):
        off = dz - kz // 2
        for j in range(bs):
            if 0 <= j + off < bs:
                sel[dz, j + off, j] = 1.0
    return sel


def thick_conv_blocked(x6, w, preferred_element_type=jnp.float32):
    """Stride-1 SAME conv on blocked activations via one standard conv.

    x6: (B, S1..Sm, nb, bs, Ci); w: (k1..km, kz, Ci, Co), taps in {1,3}.
    Returns (B, S1..Sm, nb, bs, Co).
    """
    n_lead = w.ndim - 3
    k_lead = w.shape[:n_lead]
    kz, ci, co = w.shape[-3], w.shape[-2], w.shape[-1]
    nb, bs = x6.shape[-3], x6.shape[-2]
    lead = x6.shape[1:1 + n_lead]

    xt = x6.reshape(x6.shape[:-2] + (bs * ci,))  # (B, lead.., nb, bs*Ci)
    sel = jnp.asarray(_band_sel(kz, bs), w.dtype)
    # wb[..., j_in, i, j_out, o] = sum_dz w[..., dz, i, o] sel[dz, j_in, j_out]
    wb = jnp.einsum("...dio,djk->...jiko", w, sel)
    wb = wb.reshape(k_lead + (bs * ci, bs * co))

    nsp = n_lead + 1  # lead dims + nb
    lhs_spec = "N" + "DHW"[3 - nsp:] + "C"
    rhs_spec = "DHW"[3 - nsp:] + "IO"
    dn = (lhs_spec, rhs_spec, lhs_spec)
    pads = [(k // 2, k // 2) for k in k_lead] + [(0, 0)]
    wb_full = wb.reshape(k_lead + (1, bs * ci, bs * co))
    out = lax.conv_general_dilated(
        xt, wb_full, (1,) * nsp, pads, dimension_numbers=dn,
        preferred_element_type=preferred_element_type)
    out = out.reshape(out.shape[:-1] + (bs, co))

    if kz == 3:
        # cross-block taps: head row (j=0) and tail row (j=bs-1) only.
        xe = jnp.concatenate([x6[..., 0, :], x6[..., bs - 1, :]], axis=-1)
        we = jnp.zeros(k_lead + (2 * ci, 2 * co), w.dtype)
        # e[m, 0:co]   = tail(m) . w[0] -> contributes to head of m+1
        # e[m, co:2co] = head(m) . w[2] -> contributes to tail of m-1
        we = we.at[..., ci:, :co].set(w[..., 0, :, :])
        we = we.at[..., :ci, co:].set(w[..., 2, :, :])
        e = lax.conv_general_dilated(
            xe, we.reshape(k_lead + (1, 2 * ci, 2 * co)),
            (1,) * nsp, pads, dimension_numbers=dn,
            preferred_element_type=preferred_element_type)
        zeros = jnp.zeros(e.shape[:-2] + (1, co), e.dtype)
        head_add = jnp.concatenate([zeros, e[..., :-1, :co]], axis=-2)
        tail_add = jnp.concatenate([e[..., 1:, co:], zeros], axis=-2)
        out = jnp.concatenate(
            [out[..., 0:1, :] + head_add[..., None, :],
             out[..., 1:bs - 1, :],
             out[..., bs - 1:bs, :] + tail_add[..., None, :]], axis=-2)
    return out.astype(preferred_element_type)


def band_dots_blocked(x6, w, preferred_element_type=jnp.float32):
    """Stride-1 SAME conv on blocked activations as per-lead-tap dense
    band-matrix dots on the thick layout (bs*Ci lanes) — no conv
    lowering, no patch materialization; cross-block z-taps via small
    edge dots.  Plain autodiff (dx = transposed dots, dw = full-M
    contraction per tap)."""
    n_lead = w.ndim - 3
    k_lead = w.shape[:n_lead]
    kz, ci, co = w.shape[-3], w.shape[-2], w.shape[-1]
    nb, bs = x6.shape[-3], x6.shape[-2]
    lead = x6.shape[1:1 + n_lead]

    xt = x6.reshape(x6.shape[:-2] + (bs * ci,))
    sel = jnp.asarray(_band_sel(kz, bs), w.dtype)
    wb = jnp.einsum("...dio,djk->...jiko", w, sel)
    wb = wb.reshape(k_lead + (bs * ci, bs * co))

    pad_cfg = [(0, 0)] + [(k // 2, k // 2) for k in k_lead] + [(0, 0),
                                                               (0, 0)]
    pp = jnp.pad(xt, pad_cfg)
    out = None
    for tap in (np.ndindex(*k_lead) if n_lead else [()]):
        sl = pp
        for d, t in enumerate(tap):
            sl = lax.slice_in_dim(sl, t, t + lead[d], axis=1 + d)
        t_out = lax.dot_general(
            sl, wb[tap],
            dimension_numbers=(((sl.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=preferred_element_type)
        out = t_out if out is None else out + t_out
    out = out.reshape(out.shape[:-1] + (bs, co))

    if kz == 3:
        xe = jnp.concatenate([x6[..., 0, :], x6[..., bs - 1, :]], axis=-1)
        we = jnp.zeros(k_lead + (2 * ci, 2 * co), w.dtype)
        we = we.at[..., ci:, :co].set(w[..., 0, :, :])
        we = we.at[..., :ci, co:].set(w[..., 2, :, :])
        ppe = jnp.pad(xe, pad_cfg)  # xe has xt's ndim (nb, 2ci minor)
        e = None
        for tap in (np.ndindex(*k_lead) if n_lead else [()]):
            sl = ppe
            for d, t in enumerate(tap):
                sl = lax.slice_in_dim(sl, t, t + lead[d], axis=1 + d)
            t_e = lax.dot_general(
                sl, we[tap],
                dimension_numbers=(((sl.ndim - 1,), (0,)), ((), ())),
                preferred_element_type=preferred_element_type)
            e = t_e if e is None else e + t_e
        zeros = jnp.zeros(e.shape[:-2] + (1, co), e.dtype)
        head_add = jnp.concatenate([zeros, e[..., :-1, :co]], axis=-2)
        tail_add = jnp.concatenate([e[..., 1:, co:], zeros], axis=-2)
        pad_j = [(0, 0)] * (out.ndim - 2)
        out = out + jnp.pad(head_add[..., None, :],
                            pad_j + [(0, bs - 1), (0, 0)])
        out = out + jnp.pad(tail_add[..., None, :],
                            pad_j + [(bs - 1, 0), (0, 0)])
    return out.astype(preferred_element_type)


def timeit(fn, args, n=10, windows=3):
    out = fn(*args)
    leaf = jax.tree.leaves(out)[0]
    float(leaf.ravel()[0])
    best = float("inf")
    for _ in range(windows):
        t0 = time.time()
        for _ in range(n):
            out = fn(*args)
        float(jax.tree.leaves(out)[0].ravel()[0])
        best = min(best, (time.time() - t0) / n)
    return best * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="fp32", choices=["fp32", "bf16"])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (the env var alone is ignored: the "
                         "axon plugin preloads jax)")
    ap.add_argument("--fused", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    if args.fused:
        bench_fused(args)
        return
    from multimodal_fusion_fpn_tpu.ops.banded import _banded_conv_blocked_impl

    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B = args.batch
    rng = np.random.default_rng(0)

    # (name, lead_shape, z, ci, co, kernel)
    cases = [
        ("s1 (1,3,3) c16", (32, 128), 496, 16, 16, (1, 3, 3)),
        ("s1 (3,1,1) c16", (32, 128), 496, 16, 16, (3, 1, 1)),
        ("s2 (1,3,3) c32", (32, 64), 248, 32, 32, (1, 3, 3)),
        ("s2 (3,1,1) c32", (32, 64), 248, 32, 32, (3, 1, 1)),
        ("s3 (1,3,3) c64", (32, 32), 124, 64, 64, (1, 3, 3)),
    ]
    if args.check:
        cases = [
            ("(1,3,3) c16", (4, 6), 40, 16, 16, (1, 3, 3)),
            ("(3,1,1) c16", (4, 6), 40, 16, 16, (3, 1, 1)),
            ("(1,3,3) c3->5", (4, 6), 24, 3, 5, (1, 3, 3)),
            ("(1,1,1) c32", (4, 6), 24, 32, 32, (1, 1, 1)),
            ("(1,3) 2d c16", (10,), 40, 16, 16, (1, 3)),
            ("(3,1) 2d c16", (10,), 40, 16, 16, (3, 1)),
            ("(3,3,3) c8", (4, 6), 24, 8, 8, (3, 3, 3)),
        ]
    for name, lead, z, ci, co, kernel in cases:
        bs = 8
        nb = z // bs
        x6 = jnp.asarray(rng.normal(size=(B,) + lead + (nb, bs, ci)),
                         dtype)
        w = jnp.asarray(rng.normal(size=kernel + (ci, co)) * 0.1, dtype)

        b_ref = np.asarray(_banded_conv_blocked_impl(x6, w, jnp.float32),
                           np.float32)
        if args.check:
            for label, fn in (("thick", thick_conv_blocked),
                              ("dots", band_dots_blocked)):
                a = np.asarray(fn(x6, w, jnp.float32), np.float32)
                err = np.abs(a - b_ref).max() / (np.abs(b_ref).max() + 1e-9)
                print(f"{name} {label}: rel err {err:.2e}", flush=True)
            continue

        line = name + ":"
        impls = [("thick", thick_conv_blocked),
                 ("dots", band_dots_blocked),
                 ("patch", lambda x, w, d: _banded_conv_blocked_impl(
                     x, w, d))]
        for label, fn in impls:
            f = jax.jit(lambda x, w, fn=fn: fn(x, w, dtype))
            t = timeit(f, (x6, w))

            def loss(x, w, fn=fn):
                return jnp.sum(fn(x, w, dtype) ** 2)
            g = timeit(jax.jit(jax.grad(loss, argnums=(0, 1))), (x6, w))
            line += f"  {label} {t:6.1f}/{g:6.1f}"
        print(line, flush=True)




def bench_fused(args):
    """--fused: fused pallas/ref op vs banded_conv_blocked at stage shapes."""
    from multimodal_fusion_fpn_tpu.ops.banded import banded_conv_blocked
    from multimodal_fusion_fpn_tpu.ops.pallas.fused_conv import (
        fused_conv, pack)
    dtype = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32
    B = args.batch
    rng = np.random.default_rng(0)
    cases = [
        ("s2 c32 bs8", (32, 64), 248, 32, 32, (1, 3, 3), 8),
        ("s2 c32 bs4", (32, 64), 248, 32, 32, (1, 3, 3), 4),
        ("s3 c64 bs4", (32, 32), 124, 64, 64, (1, 3, 3), 4),
        ("s3 c64 bs2", (32, 32), 124, 64, 64, (1, 3, 3), 2),
        ("s1 c16 bs8", (32, 128), 496, 16, 16, (1, 3, 3), 8),
    ]
    for name, (Y, X), Z, ci, co, kernel, bs in cases:
        nb = Z // bs
        x = jnp.asarray(rng.normal(size=(B, Y, X, Z, ci)), dtype)
        w = jnp.asarray(rng.normal(size=kernel + (ci, co)) * 0.1, dtype)
        s = jnp.asarray(rng.normal(size=(bs * ci,)), dtype)
        b = jnp.asarray(rng.normal(size=(bs * ci,)), dtype)
        xp = pack(x, bs)
        x6 = x.reshape(B, Y, X, nb, bs, ci)

        impl = "pallas" if not args.cpu else "ref"
        f_fused = jax.jit(lambda xp, s, b, w: fused_conv(
            [xp], [s], [b], w, X, nb, bs, relu=True,
            preferred_element_type=dtype, impl=impl))

        def base(x6, s, b, w):
            t = jnp.maximum(x6 * s.reshape(bs, ci) + b.reshape(bs, ci), 0)
            return banded_conv_blocked(t, w, preferred_element_type=dtype)
        f_base = jax.jit(base)

        t1 = timeit(f_fused, (xp, s, b, w))
        t2 = timeit(f_base, (x6, s, b, w))

        def loss_f(xp, s, b, w):
            return jnp.sum(fused_conv([xp], [s], [b], w, X, nb, bs,
                                      relu=True,
                                      preferred_element_type=dtype,
                                      impl=impl) ** 2)

        def loss_b(x6, s, b, w):
            return jnp.sum(base(x6, s, b, w) ** 2)
        g1 = timeit(jax.jit(jax.grad(loss_f, argnums=(0, 1, 2, 3))),
                    (xp, s, b, w))
        g2 = timeit(jax.jit(jax.grad(loss_b, argnums=(0, 1, 2, 3))),
                    (x6, s, b, w))
        print(f"{name}: fused {t1:6.1f}/{g1:6.1f}  "
              f"base {t2:6.1f}/{g2:6.1f}", flush=True)

if __name__ == "__main__":
    main()
