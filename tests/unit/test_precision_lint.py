"""Static lint: every matmul on the compute path must carry an explicit
``precision=``.

Why a source lint and not a numeric test: on real TPUs an unqualified
f32 matmul (``Precision.DEFAULT``) lowers to a single bf16 MXU pass
(~2^-8 relative roundoff), but the CPU backend ignores precision and
always computes full f32 — so no CPU test, including interpret-mode
Pallas parity, can observe the degradation. This bit round 5:
``egnn_pallas_lane_vjp``'s XLA pre-projections used the bare ``@``
operator, silently breaking f32 grad parity at scaled dims ON CHIP
(0.035–0.073 abs err vs atol 5e-4; caught by
tools/probe_scaled_parity.py, invisible to the CPU suite).

Scope: the jnp/lax matmul-family calls and the ``@`` operator in every
compute-path module. Pallas kernel bodies route matmuls through the
``_matmuls`` precision family (egnn_pallas_lane.py), whose inner calls
are themselves qualified, so they pass naturally.
"""

import ast
import pathlib

import pytest

ROOT = pathlib.Path(__file__).resolve().parents[2] / "pmhc_tpu"

# Compute-path packages (jit-traced numerics). cli/, io/, data/, utils/,
# serve.py etc. are host-side or integer-indexed — out of scope.
PACKAGES = ["ops", "models", "diffusion", "geometry", "train", "parallel"]

MATMUL_FUNCS = {"matmul", "einsum", "dot", "dot_general", "tensordot"}


def _matmul_violations(path: pathlib.Path):
    tree = ast.parse(path.read_text(), filename=str(path))
    bad = []
    for node in ast.walk(tree):
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.MatMult):
            bad.append((node.lineno, "bare @ operator"))
        elif isinstance(node, ast.Call):
            func = node.func
            name = func.attr if isinstance(func, ast.Attribute) else (
                func.id if isinstance(func, ast.Name) else None)
            if name in MATMUL_FUNCS:
                kw = {k.arg for k in node.keywords}
                if "precision" not in kw:
                    bad.append((node.lineno, f"{name}() without precision="))
    return bad


@pytest.mark.parametrize(
    "path",
    sorted(p for pkg in PACKAGES for p in (ROOT / pkg).rglob("*.py")),
    ids=lambda p: str(p.relative_to(ROOT)),
)
def test_no_unqualified_matmul(path):
    bad = _matmul_violations(path)
    assert not bad, (
        f"{path}: unqualified matmul(s) — on TPU these run as a single "
        f"bf16 MXU pass in f32 mode; pass precision= explicitly: "
        + "; ".join(f"line {ln}: {what}" for ln, what in bad)
    )
