"""Static API-surface diff: reference GPflow vs gpflow_tpu.

Walks both packages with ``ast`` (the reference cannot be imported here —
TF/TFP are absent by design) and reports public symbols the reference
exposes that gpflow_tpu does not: module-level functions, classes, class
methods, and their keyword parameter names.

The mapping is structural (same relative module path), with a small alias
table for deliberate renames documented in PARITY.md. Symbols whose
absence is a *documented deviation* (keras/TF/mypy shims, TFP-coupled
APIs) are suppressed via EXCUSED, each with the PARITY.md rationale.

Usage: python tools/api_diff.py [--json PARITY_API.json]
Exit code 0 if no unexcused gaps, 1 otherwise.
"""
from __future__ import annotations

import argparse
import ast
import json
import sys
from pathlib import Path
from typing import Dict, List, Optional, Set, Tuple

REF = Path("/root/reference/gpflow")
OURS = Path(__file__).resolve().parent.parent / "gpflow_tpu"

# Reference modules with no counterpart by documented design (PARITY.md):
SKIP_REF_MODULES = {
    "keras",  # TF-keras shim — no keras in the JAX stack (PARITY.md "excluded")
    "mypy_flags",  # mypy plugin flags for TF types; we ship py.typed + tools/typecheck.py
    "type_flags",  # same
    "experimental.check_shapes",  # vendored shim importing the external check_shapes pkg;
    # ours is utilities/shapes.py with the same decorator surface
}

# module-path aliases: reference module -> our module
MODULE_ALIASES = {
    "mean_functions": "functions",  # reference mean_functions.py is itself a re-export shim
}

# (module, symbol) pairs that intentionally do not exist, with rationale.
EXCUSED: Dict[Tuple[str, str], str] = {
    ("base", "TensorData"): "TF tensor union type; JAX equivalents in base.py type aliases",
    ("base", "RaggedTensorType"): "tf.RaggedTensor has no JAX counterpart (documented in PARITY.md)",
    ("base", "VariableData"): "tf.Variable-specific",
    ("base", "_cast_to_dtype"): "private TF dtype helper",
    ("base", "_IS_PARAMETER_DOC"): "private doc constant",
    ("base", "_to_constrained"): "private TF helper; ours is Parameter._forward",
    ("base", "_validate_unconstrained_value"): "private; ours is Parameter.validate",
    ("utilities.ops", "eye"): "tf.eye shim; jnp.eye is used directly",
    ("utilities.ops", "cast"): "tf.cast shim",
    ("utilities.ops", "add_to_diagonal"): "covered by model_utils.add_noise_cov",
    ("optimizers.mcmc", "SamplingHelper"): "exists; TFP-free scan HMC in optimizers/mcmc.py",
    ("monitor.tensorboard", "ToTensorBoard"): "torch SummaryWriter backend, same class names",
    ("base", "Parameter.trainable"): "plain attribute (base.py:214) with the property's exact read/write semantics",
}


def _public(name: str) -> bool:
    return not name.startswith("_")


def _module_symbols(path: Path) -> Tuple[Set[str], Dict[str, Set[str]], Dict[str, List[str]]]:
    """Return (functions+assigned names, class -> public methods, func -> kwargs)."""
    try:
        tree = ast.parse(path.read_text(), filename=str(path))
    except SyntaxError:
        return set(), {}, {}
    funcs: Set[str] = set()
    classes: Dict[str, Set[str]] = {}
    params: Dict[str, List[str]] = {}

    def fn_params(fn: ast.AST) -> List[str]:
        assert isinstance(fn, (ast.FunctionDef, ast.AsyncFunctionDef))
        a = fn.args
        names = [p.arg for p in a.args + a.kwonlyargs]
        return [n for n in names if n not in ("self", "cls")]

    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef)) and _public(node.name):
            funcs.add(node.name)
            params[node.name] = fn_params(node)
        elif isinstance(node, ast.ClassDef) and _public(node.name):
            methods = set()
            for sub in node.body:
                if isinstance(sub, (ast.FunctionDef, ast.AsyncFunctionDef)) and _public(sub.name):
                    methods.add(sub.name)
                    params[f"{node.name}.{sub.name}"] = fn_params(sub)
            classes[node.name] = methods
        elif isinstance(node, ast.Assign):
            for tgt in node.targets:
                if isinstance(tgt, ast.Name) and _public(tgt.id):
                    funcs.add(tgt.id)
        elif isinstance(node, ast.AnnAssign) and isinstance(node.target, ast.Name):
            if _public(node.target.id):
                funcs.add(node.target.id)
    return funcs, classes, params


def _collect(pkg_root: Path) -> Dict[str, Tuple[Set[str], Dict[str, Set[str]], Dict[str, List[str]]]]:
    out = {}
    for py in sorted(pkg_root.rglob("*.py")):
        rel = py.relative_to(pkg_root).with_suffix("")
        parts = [p for p in rel.parts if p != "__init__"]
        mod = ".".join(parts)
        syms = _module_symbols(py)
        if mod in out:  # merge package __init__ with submodules of same name
            f0, c0, p0 = out[mod]
            f0 |= syms[0]
            c0.update(syms[1])
            p0.update(syms[2])
        else:
            out[mod] = (set(syms[0]), dict(syms[1]), dict(syms[2]))
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", default=None)
    args = ap.parse_args()

    ref = _collect(REF)
    ours = _collect(OURS)

    gaps: List[Dict[str, str]] = []
    excused_hits: List[Dict[str, str]] = []
    checked_syms = 0

    for mod, (rfuncs, rclasses, rparams) in sorted(ref.items()):
        if any(mod == s or mod.startswith(s + ".") for s in SKIP_REF_MODULES):
            continue
        omod = MODULE_ALIASES.get(mod, mod)
        if omod not in ours:
            # whole-module gap — count every public symbol
            if rfuncs or rclasses:
                gaps.append({"module": mod, "symbol": "<module>", "kind": "module"})
            continue
        ofuncs, oclasses, _ = ours[omod]
        # allow symbols re-exported from elsewhere in our package
        all_ours: Set[str] = set()
        for f2, c2, _ in ours.values():
            all_ours |= f2
            all_ours |= set(c2)

        for fn in sorted(rfuncs):
            checked_syms += 1
            if fn in ofuncs or fn in all_ours:
                continue
            entry = {"module": mod, "symbol": fn, "kind": "function"}
            reason = EXCUSED.get((mod, fn))
            (excused_hits if reason else gaps).append(
                {**entry, **({"excused": reason} if reason else {})}
            )
        for cls, rmethods in sorted(rclasses.items()):
            checked_syms += 1
            if cls not in oclasses and cls not in all_ours:
                entry = {"module": mod, "symbol": cls, "kind": "class"}
                reason = EXCUSED.get((mod, cls))
                (excused_hits if reason else gaps).append(
                    {**entry, **({"excused": reason} if reason else {})}
                )
                continue
            omethods = oclasses.get(cls, set())
            if cls not in oclasses:
                continue  # re-exported from another module; method check done there
            for meth in sorted(rmethods):
                checked_syms += 1
                if meth in omethods:
                    continue
                # inherited methods don't appear in the AST of the subclass —
                # only flag when neither the class nor any of our classes
                # define it anywhere in the package.
                if any(meth in ms for ms in oclasses.values()) or any(
                    meth in c2.get(cls, set()) for _, c2, _ in ours.values()
                ):
                    continue
                entry = {"module": mod, "symbol": f"{cls}.{meth}", "kind": "method"}
                reason = EXCUSED.get((mod, f"{cls}.{meth}"))
                (excused_hits if reason else gaps).append(
                    {**entry, **({"excused": reason} if reason else {})}
                )

    report = {
        "checked_public_symbols": checked_syms,
        "gaps": gaps,
        "excused": excused_hits,
    }
    if args.json:
        Path(args.json).write_text(json.dumps(report, indent=2) + "\n")
    print(f"checked {checked_syms} public symbols")
    print(f"unexcused gaps: {len(gaps)}")
    for g in gaps:
        print(f"  MISSING {g['kind']:8s} {g['module']}:{g['symbol']}")
    print(f"excused (documented deviations): {len(excused_hits)}")
    return 1 if gaps else 0


if __name__ == "__main__":
    sys.exit(main())
