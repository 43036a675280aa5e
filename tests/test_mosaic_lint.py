"""Mosaic bf16 regression guard (VERDICT r3 item 7).

The two known compile-breakers — sub-32-bit vector compares and 16-bit
`pltpu.roll` operands inside Pallas kernels — only fail ON CHIP (the
Mosaic compiler runs remotely; interpret mode never invokes it), and
they broke the flagship bf16 compile in rounds 2 AND 3.  This test (a)
keeps the live kernel sources clean under tools/mosaic_lint.py and (b)
self-tests the lint against synthetic reproductions of both historical
bugs so the guard itself cannot silently rot.
"""

import sys
import textwrap
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1] / "tools"))

import mosaic_lint


def test_live_kernels_clean(capsys):
    assert mosaic_lint.main() == 0, capsys.readouterr().out


def _lint_src(tmp_path, src):
    p = tmp_path / "fake_kernels.py"
    p.write_text(textwrap.dedent(src))
    return mosaic_lint.lint_file(str(p))


def test_catches_round2_relu_mask_bug(tmp_path):
    """Round-2 bug: the dx kernel's ReLU mask compared a bf16 value
    (`pre > 0`) — Mosaic rejected the whole flagship bf16 compile."""
    findings = _lint_src(tmp_path, """
        def _dx_kernel(x_ref, g_ref, out_ref):
            pre = x_ref[0, 0] * 2.0
            mask = pre > 0
            out_ref[0, 0] = g_ref[0, 0] * mask
    """)
    assert len(findings) == 1 and "comparison on data-tainted" in findings[0]


def test_catches_round3_pool_tie_bug(tmp_path):
    """Round-3 bug: the pool backward's tie compare (`x == o`) ran in
    the input dtype (bf16)."""
    findings = _lint_src(tmp_path, """
        def _bwd_kernel(x_ref, o_ref, g_ref, dx_ref):
            x = x_ref[0, 0, 0]
            o = o_ref[0, 0, 0]
            tie = x == o
            dx_ref[0, 0, 0] = tie * g_ref[0, 0, 0]
    """)
    assert len(findings) == 1 and "comparison on data-tainted" in findings[0]


def test_f32_cast_no_longer_exempts(tmp_path):
    """Round-5 on-chip finding: fp32 casts do NOT make data compares
    safe — Mosaic silently miscompiles fp32 vector compares whose
    operands are upcast from bf16 (garbage predicates; the dx kernels
    returned ~zeros).  The lint must flag them now."""
    findings = _lint_src(tmp_path, """
        import jax.numpy as jnp
        def _bwd_kernel(x_ref, o_ref, dx_ref):
            x = x_ref[0, 0, 0]
            o = o_ref[0, 0, 0]
            tie = x.astype(jnp.float32) == o.astype(jnp.float32)
            dx_ref[0, 0, 0] = tie
    """)
    assert len(findings) == 1 and "miscompiles" in findings[0]


def test_bitcast_compare_passes(tmp_path):
    """The int32 bit-pattern compare (relu_grad_mask/_tie_mask idiom)
    is the sanctioned predicate construct."""
    findings = _lint_src(tmp_path, """
        import jax.numpy as jnp
        from jax import lax
        def _bwd_kernel(x_ref, o_ref, dx_ref):
            x = x_ref[0, 0, 0]
            o = o_ref[0, 0, 0]
            dx_ref[0, 0, 0] = (
                lax.bitcast_convert_type(x.astype(jnp.float32), jnp.int32)
                == lax.bitcast_convert_type(o.astype(jnp.float32),
                                            jnp.int32))
    """)
    assert findings == []


def test_annotation_passes(tmp_path):
    findings = _lint_src(tmp_path, """
        def _kernel(x_ref, out_ref):
            v = x_ref[0]
            m = v > 0  # mosaic-f32-ok
            out_ref[0] = m
    """)
    assert findings == []


def test_static_compares_not_flagged(tmp_path):
    """Grid indices, iota vectors, python ints, `is None`, and .shape
    reads are all legitimate — zero false positives on them."""
    findings = _lint_src(tmp_path, """
        import jax
        import jax.numpy as jnp
        def _kernel(x_ref, out_ref, *, nb, bs):
            step = jax.lax.broadcasted_iota(jnp.int32, (8, 1), 0)
            CCo = out_ref.shape[-1]
            co = CCo // bs
            col = jax.lax.broadcasted_iota(jnp.int32, (8, CCo), 1)
            m1 = col < co
            m2 = step != nb - 1
            acc = None
            t = x_ref[0, 0]
            acc = t if acc is None else acc + t
            out_ref[0, 0] = jnp.where(m1 & m2, acc, 0.0)
    """)
    assert findings == []


def test_kernel2_suffix_scanned(tmp_path):
    """Suffix-only name matching skipped `_kernel2` (the MMF_FUSED_PAIR
    mega-kernel) — any name containing 'kernel' must be scanned."""
    findings = _lint_src(tmp_path, """
        def _kernel2(x_ref, out_ref):
            v = x_ref[0, 0]
            m = v > 0
            out_ref[0, 0] = m
    """)
    assert len(findings) == 1 and "comparison on data-tainted" in findings[0]


def test_helper_called_from_kernel_scanned(tmp_path):
    """Taint must propagate through call arguments into module-level
    helpers that run inside the kernel body (e.g. `_conv_taps`)."""
    findings = _lint_src(tmp_path, """
        def _taps(t, kX):
            if kX == 3:
                m = t > 0
                return m
            return t

        def _kernel(x_ref, out_ref):
            v = x_ref[0, 0]
            out_ref[0, 0] = _taps(v, 3)
    """)
    assert len(findings) == 1 and "'_taps'" in findings[0]


def test_helper_static_args_not_flagged(tmp_path):
    """Untainted (python config) arguments must NOT taint helper
    params — `kX == 3` style config compares stay legal."""
    findings = _lint_src(tmp_path, """
        def _taps(t, kX):
            if kX == 3:
                return t * 2
            return t

        def _kernel(x_ref, out_ref, *, kX):
            v = x_ref[0, 0]
            out_ref[0, 0] = _taps(v.shape[0], kX)
    """)
    assert findings == []


def test_catches_16bit_roll(tmp_path):
    findings = _lint_src(tmp_path, """
        from jax.experimental.pallas import tpu as pltpu
        def _kernel(x_ref, out_ref):
            v = x_ref[0, 0]
            out_ref[0, 0] = pltpu.roll(v, 1, 0)
    """)
    assert len(findings) == 1 and "pltpu.roll" in findings[0]


def test_fp32_roll_roundtrip_passes(tmp_path):
    findings = _lint_src(tmp_path, """
        import jax.numpy as jnp
        from jax.experimental.pallas import tpu as pltpu
        def _kernel(x_ref, out_ref):
            v = x_ref[0, 0]
            r = pltpu.roll(v.astype(jnp.float32), 1, 0).astype(v.dtype)
            out_ref[0, 0] = r
    """)
    assert findings == []
