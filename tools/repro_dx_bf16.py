#!/usr/bin/env python3
"""Minimal on-chip repro/bisect of the bf16 backward parity failure.

Round-5 triage (results/stage_triage.log) found: Mosaic-compiled bf16
kernels COMPILE and their fwd/dw outputs match the XLA reference, but
dx (max_rel exactly 1.0 — one side all zeros) and ds/db (garbage) FAIL
in every section, while interpret mode and on-chip fp32 (round 3) pass.

This script localizes it at the smallest kernel (k=(1,1,1)) by
comparing THREE implementations against an fp32 oracle (upcast inputs,
XLA ref):
    ref_bf16     — XLA conv path at bf16 (is the *reference* wrong?)
    pallas_merged— fused kernels, MMF_MERGED_BWD=1 (default)
    pallas_split — fused kernels, MMF_MERGED_BWD=0 (round-3 backward)
for each of out_stats={off,on}, printing per-cotangent norms + max-rel
vs the oracle.  One JSON line per case to --log for the watcher.

Usage: python tools/repro_dx_bf16.py [--interpret] [--log FILE]
"""

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = np.maximum(np.abs(b), 1e-3)
    return float(np.max(np.abs(a - b) / denom)) if a.size else 0.0


def cos(a, b):
    """Cosine similarity of the flattened cotangents — the robust
    broken-vs-noisy discriminator: bf16 rounding keeps cos ~0.9999
    (element-wise max-rel can exceed 1 at tiny magnitudes and misleads);
    an all-zeros or garbage tensor drops cos to ~0."""
    a = np.asarray(a, np.float64).ravel()
    b = np.asarray(b, np.float64).ravel()
    na, nb_ = np.linalg.norm(a), np.linalg.norm(b)
    if na == 0.0 or nb_ == 0.0:
        return 0.0
    return float(np.dot(a, b) / (na * nb_))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--interpret", action="store_true")
    ap.add_argument("--log",
                    default=os.path.join(REPO, "results",
                                         "repro_dx_bf16.jsonl"))
    ap.add_argument("--kshape", default="1,1,1")
    ap.add_argument("--geo", default="tiny", choices=("tiny", "s1full"),
                    help="s1full = the failing full stage-1 geometry "
                         "(round-5: the bitcast fix holds at tiny "
                         "shapes but the backward breaks again at "
                         "RX=7936 — results/stage_s1full.log)")
    args = ap.parse_args()

    import jax
    if args.interpret:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from multimodal_fusion_fpn_tpu.ops.pallas import fused_conv as fc
    if args.interpret:
        fc.set_interpret_mode(True)

    kshape = tuple(int(v) for v in args.kshape.split(","))
    if args.geo == "s1full":
        B, Y, X, Z, C, bs = 4, 32, 128, 496, 16, 8
    else:
        B, Y, X, Z, C, bs = 2, 4, 8, 64, 8, 8
    nb = Z // bs
    rng = np.random.default_rng(7)
    x32 = rng.normal(size=(B, Y, X, Z, C))
    s32 = rng.normal(size=(bs * C,))
    b32 = rng.normal(size=(bs * C,))
    w32 = rng.normal(size=kshape + (C, C)) * 0.3
    g32 = rng.normal(size=(B, Y, X * nb, bs * C))

    def build(dt):
        xp = fc.pack(jnp.asarray(x32, dt), bs)
        return (xp, jnp.asarray(s32, dt), jnp.asarray(b32, dt),
                jnp.asarray(w32, dt), jnp.asarray(g32, dt))

    def grads_of(impl, dt, out_stats, merged, relu=True, env=None):
        saved = {}
        env = dict(env or {})
        env["MMF_MERGED_BWD"] = "1" if merged else "0"
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            xp, s, b, w, g = build(dt)

            # g is an ARGUMENT, not a closure: a closed-over device
            # array bakes into the uploaded program as a constant and
            # the remote compile rejects the body at full geometry
            # (HTTP 413 length limit — g is 520 MB fp32 at s1full)
            def loss_fn(xp, s, b, w, g):
                out = fc.fused_conv([xp], [s], [b], w, X, nb, bs,
                                    relu=relu,
                                    preferred_element_type=dt,
                                    impl=impl, out_stats=out_stats)
                if out_stats:
                    y, s1, s2 = out
                    return (jnp.sum(y * g) + jnp.sum(s1 * 3.0)
                            + jnp.sum(s2 * 0.5))
                return jnp.sum(out * g)

            gr = jax.jit(jax.grad(loss_fn, argnums=(0, 1, 2, 3)))(
                xp, s, b, w, g)
            return jax.tree.map(np.asarray, gr)
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    os.makedirs(os.path.dirname(args.log), exist_ok=True)
    f32, bf16 = jnp.float32, jnp.bfloat16
    bad = False
    for out_stats in (False, True):
        oracle = grads_of("ref", f32, out_stats, merged=False)
        # discriminators (round-5 on-chip triage signature: everything
        # that depends on the transposed-conv dt — dx/ds/db — is wrong
        # on chip; pre-derived outputs (dband) and all fwd outputs are
        # fine, in EVERY kernel variant):
        #   relu=False     -> is the fp32-compare relu mask the breaker?
        #   MMF_G1=0       -> per-row grid (vs the default G-blocked)
        #   split          -> round-3 dx kernel (no dband fold)
        #   pallas_fp32    -> dtype-dependence of the miscompile
        cases = [
            ("ref_bf16", lambda: grads_of("ref", bf16, out_stats, False)),
            ("pallas_merged",
             lambda: grads_of("pallas", bf16, out_stats, True)),
            ("pallas_split",
             lambda: grads_of("pallas", bf16, out_stats, False)),
            ("pallas_merged_norelu",
             lambda: grads_of("pallas", bf16, out_stats, True,
                              relu=False)),
            ("pallas_merged_g1off",
             lambda: grads_of("pallas", bf16, out_stats, True,
                              env={"MMF_G1": "0"})),
            ("pallas_split_g1off_nostats",
             lambda: grads_of("pallas", bf16, out_stats, False,
                              env={"MMF_G1": "0",
                                   "MMF_FUSED_STATS": "0"})),
            ("pallas_merged_f32cmp",
             lambda: grads_of("pallas", bf16, out_stats, True,
                              env={"MMF_MASK_IDIOM": "f32"})),
            ("pallas_fp32",
             lambda: grads_of("pallas", f32, out_stats, True)),
        ]
        oracle_norelu = grads_of("ref", f32, out_stats, merged=False,
                                 relu=False)
        for name, fn in cases:
            rec = {"case": name, "out_stats": out_stats,
                   "kshape": list(kshape), "geo": args.geo}
            orc = oracle_norelu if name.endswith("norelu") else oracle
            try:
                gr = fn()
                for nm, a, o in zip(("dx", "ds", "db", "dw"), gr, orc):
                    rec[nm + "_cos"] = round(cos(a, o), 5)
                    rec[nm + "_norm"] = round(
                        float(np.linalg.norm(
                            np.asarray(a, np.float64))), 4)
                    rec[nm + "_oracle_norm"] = round(
                        float(np.linalg.norm(
                            np.asarray(o, np.float64))), 4)
                # bf16 rounding keeps cos ~0.9999 and norms within a few
                # %; zeros/garbage collapse cos and/or the norm ratio
                def _ratio_ok(nm):
                    on = rec[nm + "_oracle_norm"]
                    return on == 0 or 0.5 < rec[nm + "_norm"] / on < 2.0
                rec["ok"] = all(rec[nm + "_cos"] > 0.98 and _ratio_ok(nm)
                                for nm in ("dx", "ds", "db", "dw"))
                rec["dx_head"] = [round(float(v), 4) for v in
                                  np.asarray(gr[0], np.float64)
                                  .ravel()[:4]]
                rec["dx_oracle_head"] = [round(float(v), 4) for v in
                                         np.asarray(orc[0], np.float64)
                                         .ravel()[:4]]
            except Exception as exc:  # noqa: BLE001 — triage tool
                rec.update(ok=False, error=str(exc)[:400])
            bad |= not rec["ok"]
            line = json.dumps(rec)
            print(line, flush=True)
            with open(args.log, "a") as fh:
                fh.write(line + "\n")
    print("REPRO: " + ("FAILURES PRESENT" if bad else "ALL CLEAN"),
          flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
