#!/usr/bin/env python3
"""Static guard against the two known Mosaic bf16 compile-breakers.

Mosaic (current libtpu) REJECTS, inside Pallas TPU kernels:
  1. sub-32-bit VECTOR COMPARISONS — bf16/fp16 operands to <, <=, >,
     >=, ==, != (broke the flagship bf16 compile twice: the dx-kernel
     ReLU mask in round 2 and the pool-backward tie compare in round 3;
     the failure mode is an opaque `tpu_compile_helper subprocess exit
     code 1` HTTP 500, visible only on chip);
  2. sub-32-bit `pltpu.roll` operands (16-bit values must round-trip
     through fp32).

Neither is catchable on CPU (interpret mode never invokes Mosaic), so
this lint enforces the rules statically over
`multimodal_fusion_fpn_tpu/ops/pallas/*.py`:

* Kernel bodies are functions whose name ends in `_kernel` or `kernel`
  (the repo convention), including functions nested in them.
* Within a kernel body, a comparison is flagged when either operand is
  DATA-TAINTED — derived (via simple intra-function taint propagation)
  from a `*_ref[...]` load or `pl.load` — unless the tainted operand's
  own source segment casts to fp32/int32 (`.astype(jnp.float32)` etc.)
  or the line carries a `# mosaic-f32-ok` annotation (author asserts
  the operands are >=32-bit).
  Comparisons of grid indices / iota-derived int32 vectors / python
  ints are untainted and always allowed.
* `pltpu.roll(v, ...)` is flagged when `v`'s segment has no fp32 cast,
  unless annotated `# mosaic-roll-ok` (e.g. the `_roll_rows` helper,
  which guards on `itemsize == 4`).

Exit 0 = clean; exit 1 = findings (printed one per line).  Run by CI
via tests/test_mosaic_lint.py.
"""

import ast
import os
import sys

PALLAS_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "multimodal_fusion_fpn_tpu", "ops",
    "pallas")

# Round-5 on-chip finding (results/stage_triage.log + the repro):
# an fp32 CAST does NOT make a data compare safe — Mosaic silently
# MISCOMPILES float vector compares whose operand chain starts at bf16
# (garbage predicate; dx came back ~zeros).  The only safe idioms for
# data-derived predicates are integer compares: bitcast the fp32 bit
# pattern to int32 (fused_conv.relu_grad_mask / pool._tie_mask) or a
# genuine int32 cast.  fp32 casts are therefore no longer exempting.
INT_SAFE_MARKERS = ("astype(jnp.int32)", "astype(np.int32)",
                    "bitcast_convert_type")
# rolls are a different rule: 32-bit OPERAND WIDTH is what Mosaic
# needs, so an fp32 round-trip is the canonical safe idiom there.
ROLL_SAFE_MARKERS = INT_SAFE_MARKERS + (
    "astype(jnp.float32)", "astype(np.float32)")
CMP_OK = "mosaic-f32-ok"
ROLL_OK = "mosaic-roll-ok"


def _is_kernel_fn(node):
    # "kernel" anywhere in the name (covers `_kernel`, `_kernel2`,
    # `_yck_dx_kernel`, ...) — suffix-only matching silently skipped
    # the pair mega-kernel `_kernel2`.
    return isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) \
        and "kernel" in node.name




# Attribute reads that yield static (python-level) values, and calls
# that yield int32 index vectors — taint does not flow through them.
_STATIC_ATTRS = ("shape", "ndim", "dtype", "size", "itemsize")
_INT32_PRODUCERS = ("broadcasted_iota", "iota", "program_id",
                    "num_programs")


class _Taint(ast.NodeVisitor):
    """Intra-function forward taint: names assigned from expressions
    that (transitively) touch a `*_ref` subscript load or `pl.load`.
    `.shape`/`.dtype` reads and iota/program_id calls are barriers —
    their results are static or int32, never sub-32-bit data."""

    def __init__(self, src_lines):
        self.tainted = set()
        self.src_lines = src_lines

    def _expr_tainted(self, node):
        if isinstance(node, ast.Attribute) and node.attr in _STATIC_ATTRS:
            return False
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Attribute) and f.attr in _INT32_PRODUCERS:
                return False
            if isinstance(f, ast.Attribute) and f.attr == "load":
                return True
        if isinstance(node, ast.Subscript):
            base = node.value
            if isinstance(base, ast.Name) and base.id.endswith("_ref"):
                return True
        if isinstance(node, ast.Name):
            return node.id in self.tainted
        return any(self._expr_tainted(c) for c in ast.iter_child_nodes(node))

    def visit_Assign(self, node):
        if self._expr_tainted(node.value):
            for tgt in node.targets:
                # only plain-Name targets: a Subscript store into a ref
                # (out_ref[...] = x) must not taint the ref name itself
                # (its .shape reads are static).
                if isinstance(tgt, ast.Name):
                    self.tainted.add(tgt.id)
                elif isinstance(tgt, ast.Tuple):
                    for n in tgt.elts:
                        if isinstance(n, ast.Name):
                            self.tainted.add(n.id)
        self.generic_visit(node)

    def visit_AugAssign(self, node):
        if self._expr_tainted(node.value) or self._expr_tainted(node.target):
            if isinstance(node.target, ast.Name):
                self.tainted.add(node.target.id)
        self.generic_visit(node)


def _segment(src, node):
    try:
        return ast.get_source_segment(src, node) or ""
    except Exception:
        return ""


def _line(src_lines, node):
    try:
        return src_lines[node.lineno - 1]
    except Exception:
        return ""


def _has_cast(text):
    return any(m in text for m in INT_SAFE_MARKERS)


def _param_names(fn):
    a = fn.args
    return [p.arg for p in (a.posonlyargs + a.args + a.kwonlyargs)]


def _check_fn(fn, seed_taint, src, src_lines, path, findings, defs,
              param_taint, worklist):
    """Lint one function body with `seed_taint` names pre-tainted
    (tainted caller arguments).  Calls to other module-level functions
    propagate per-argument taint interprocedurally: helpers like
    `_conv_taps` run inside the Mosaic-lowered body and are subject to
    the same rules, with taint entering through their parameters."""
    taint = _Taint(src_lines)
    taint.tainted |= seed_taint
    # two passes so taint through later-defined names settles
    taint.visit(fn)
    taint.visit(fn)
    for node in ast.walk(fn):
        if isinstance(node, ast.Call) and \
                isinstance(node.func, ast.Name) and node.func.id in defs:
            callee = defs[node.func.id]
            params = _param_names(callee)
            new = set()
            for i, arg in enumerate(node.args):
                if i < len(params) and taint._expr_tainted(arg):
                    new.add(params[i])
            for kw in node.keywords:
                if kw.arg in params and taint._expr_tainted(kw.value):
                    new.add(kw.arg)
            first_visit = callee.name not in param_taint
            have = param_taint.setdefault(callee.name, set())
            if first_visit or not new <= have:
                have |= new
                worklist.append((callee, frozenset(have)))
    for node in ast.walk(fn):
        if isinstance(node, ast.Compare):
            # `is` / `is not` are trace-time Python identity checks
            # (e.g. `acc is None`), never lowered vector compares.
            if all(isinstance(o, (ast.Is, ast.IsNot))
                   for o in node.ops):
                continue
            line = _line(src_lines, node)
            if CMP_OK in line:
                continue
            operands = [node.left] + list(node.comparators)
            bad = []
            for op in operands:
                if taint._expr_tainted(op) and not _has_cast(
                        _segment(src, op)):
                    bad.append(op)
            if bad:
                findings.append(
                    f"{path}:{node.lineno}: comparison on "
                    f"data-tainted operand inside kernel "
                    f"'{fn.name}' — Mosaic rejects sub-32-bit vector "
                    f"compares AND silently miscompiles fp32 compares "
                    f"on bf16-upcast data (round-5 on-chip finding). "
                    f"Use an int32 bit-pattern compare "
                    f"(relu_grad_mask / _tie_mask idiom) or annotate "
                    f"'# {CMP_OK}' for int32 operands. | {line.strip()}")


def lint_file(path):
    with open(path) as f:
        src = f.read()
    src_lines = src.splitlines()
    tree = ast.parse(src, path)
    findings = []

    defs = {n.name: n for n in ast.walk(tree)
            if isinstance(n, (ast.FunctionDef, ast.AsyncFunctionDef))}
    param_taint = {}
    worklist = [(fn, frozenset()) for fn in defs.values()
                if _is_kernel_fn(fn)]
    for fn in [f for f, _ in worklist]:
        param_taint[fn.name] = set()
    while worklist:
        fn, seed = worklist.pop()
        _check_fn(fn, set(seed), src, src_lines, path, findings, defs,
                  param_taint, worklist)
    findings = sorted(set(findings))

    # roll check: everywhere in the file (rolls only lower inside
    # kernels, but helpers like _roll_rows are defined at module level)
    for node in ast.walk(tree):
        if isinstance(node, ast.Call):
            f = node.func
            if isinstance(f, ast.Attribute) and f.attr == "roll" and \
                    isinstance(f.value, ast.Name) and f.value.id == "pltpu":
                line = _line(src_lines, node)
                if ROLL_OK in line:
                    continue
                arg0 = _segment(src, node.args[0]) if node.args else ""
                if not any(m in arg0 for m in ROLL_SAFE_MARKERS):
                    findings.append(
                        f"{path}:{node.lineno}: pltpu.roll on an "
                        f"operand without a visible fp32 cast — Mosaic "
                        f"roll is 32-bit only. Round-trip through fp32 "
                        f"or annotate '# {ROLL_OK}' if the operand is "
                        f"provably 32-bit. | {line.strip()}")
    return findings


def main(paths=None):
    if not paths:
        paths = sorted(
            os.path.join(PALLAS_DIR, f) for f in os.listdir(PALLAS_DIR)
            if f.endswith(".py"))
    findings = []
    for p in paths:
        findings.extend(lint_file(p))
    for f in findings:
        print(f)
    return 1 if findings else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
