"""Reference API-surface parity sweep, made durable.

AST-parses every module under ``/root/reference/isochrones`` (no import — the
reference's numba/astropy deps need not be installed) and asserts every
top-level public class/function name resolves somewhere in the mapped
``isochrones_tpu`` module(s). This is the repeatable version of the manual
sweep behind commit b0adb2a; it catches any future drift between the
reference surface and our compat layer.

Skips cleanly when the reference checkout is absent (e.g. CI without the
upstream tree).
"""

import ast
import importlib
import os

import pytest

REFERENCE_ROOT = "/root/reference/isochrones"

# reference module (relative to the package root) -> our module(s) that must
# collectively provide its public names
MODULE_MAP = {
    "eep": ["isochrones_tpu.eep"],
    "isochrone": ["isochrones_tpu.isochrone"],
    "cluster_utils": ["isochrones_tpu.cluster_utils"],
    "populations": ["isochrones_tpu.populations"],
    "cluster": ["isochrones_tpu.cluster"],
    "fit": ["isochrones_tpu.fit"],
    "version": ["isochrones_tpu.version"],
    "priors": ["isochrones_tpu.priors"],
    "extinction": ["isochrones_tpu.extinction"],
    "grid": ["isochrones_tpu.grid"],
    "likelihood": ["isochrones_tpu.likelihood"],
    "starfit": ["isochrones_tpu.starfit"],
    "starmodel": ["isochrones_tpu.starmodel", "isochrones_tpu.treemodel"],
    "interp": ["isochrones_tpu.interp"],
    "mags": ["isochrones_tpu.mags"],
    "observation": ["isochrones_tpu.observation"],
    "summary": ["isochrones_tpu.summary"],
    "catalog": ["isochrones_tpu.catalog"],
    "models": ["isochrones_tpu.models"],
    "logger": ["isochrones_tpu.logger"],
    "bc": ["isochrones_tpu.bc"],
    "utils": ["isochrones_tpu.utils"],
    "config": ["isochrones_tpu.config"],
    "query.query": ["isochrones_tpu.query.query"],
    "query.vizier": ["isochrones_tpu.query.vizier"],
    "query.catalog": ["isochrones_tpu.query.catalog"],
    "mist": ["isochrones_tpu.mist"],
    # exact-path compat submodules: a reference user's import line works
    # with s/isochrones/isochrones_tpu/ verbatim
    "mist.eep": ["isochrones_tpu.mist.eep"],
    "mist.isochrone": ["isochrones_tpu.mist.isochrone"],
    "mist.models": ["isochrones_tpu.mist.models"],
    "mist.bc": ["isochrones_tpu.mist.bc"],
    "mist.utils": ["isochrones_tpu.mist.utils"],
}

# intentional deviations: reference names we deliberately do not provide,
# each with the reason on record
ALLOWED_MISSING = {
    # dead code in the reference itself (never imported; dartmouth-era)
    "dartmouth": "*",
    "yapsi": "*",
    "schools": "*",
    "priors_old": "*",
}


def _public_names(path):
    import warnings

    with warnings.catch_warnings():
        # the reference has a few pre-3.12 invalid escape sequences
        warnings.simplefilter("ignore", SyntaxWarning)
        with open(path) as fh:
            tree = ast.parse(fh.read())
    out = []
    for node in tree.body:
        if isinstance(node, (ast.FunctionDef, ast.AsyncFunctionDef, ast.ClassDef)):
            if not node.name.startswith("_"):
                out.append(node.name)
    return out


def _reference_surface():
    surface = {}
    for root, dirs, files in os.walk(REFERENCE_ROOT):
        dirs[:] = [d for d in dirs if d not in ("tests", "__pycache__", "data")]
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(root, f), REFERENCE_ROOT)
            mod = rel[:-3].replace(os.sep, ".")
            if mod.endswith(".__init__"):
                mod = mod[: -len(".__init__")] or "__init__"
            names = _public_names(os.path.join(root, f))
            if names:
                surface[mod] = names
    return surface


pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference checkout not present"
)


def test_every_reference_public_name_resolves():
    surface = _reference_surface()
    assert surface, "reference surface scan came back empty"

    missing = []
    unmapped = []
    for refmod, names in surface.items():
        top = refmod.split(".")[0]
        if ALLOWED_MISSING.get(refmod) == "*" or ALLOWED_MISSING.get(top) == "*":
            continue
        targets = MODULE_MAP.get(refmod)
        if targets is None:
            if refmod == "__init__":
                targets = ["isochrones_tpu"]
            else:
                unmapped.append(f"{refmod} ({names})")
                continue
        mods = [importlib.import_module(t) for t in targets]
        for n in names:
            if ALLOWED_MISSING.get(f"{refmod}.{n}"):
                continue
            if not any(hasattr(m, n) for m in mods):
                missing.append(f"{refmod}.{n} (looked in {targets})")

    assert not unmapped, "reference modules with no MODULE_MAP entry:\n" + "\n".join(unmapped)
    assert not missing, "reference public names with no counterpart:\n" + "\n".join(missing)


def test_package_level_exports_match():
    """Everything importable as ``from isochrones import X`` at the package
    top level works as ``from isochrones_tpu import X`` too."""
    init = os.path.join(REFERENCE_ROOT, "__init__.py")
    with open(init) as fh:
        tree = ast.parse(fh.read())
    wanted = set()
    for node in ast.walk(tree):
        if isinstance(node, ast.ImportFrom) and node.module and node.level:
            for a in node.names:
                name = a.asname or a.name
                if not name.startswith("_"):
                    wanted.add(name)
    assert wanted, "reference __init__ scan came back empty"

    pkg = importlib.import_module("isochrones_tpu")
    missing = sorted(n for n in wanted if not hasattr(pkg, n))
    assert not missing, f"missing package-level exports: {missing}"


# reference class members we deliberately do not provide
ALLOWED_MISSING_MEMBERS = {
    # `def foo(self): return self._foo` — debug leftover in the reference,
    # never called anywhere in its codebase
    "mist.models.MISTModelGrid.foo",
}


def test_every_reference_class_member_resolves():
    """Method/class-attr-level sweep: every public method and class attribute
    of every reference class exists on our counterpart class (or factory)."""
    import warnings

    missing = []
    for root, dirs, files in os.walk(REFERENCE_ROOT):
        dirs[:] = [d for d in dirs if d not in ("tests", "__pycache__", "data")]
        for f in sorted(files):
            if not f.endswith(".py"):
                continue
            rel = os.path.relpath(os.path.join(root, f), REFERENCE_ROOT)[:-3].replace(os.sep, ".")
            if rel.endswith(".__init__"):
                rel = rel[: -len(".__init__")] or "__init__"
            targets = MODULE_MAP.get(rel)
            if targets is None:
                continue
            mods = [importlib.import_module(t) for t in targets]
            with warnings.catch_warnings():
                warnings.simplefilter("ignore", SyntaxWarning)
                with open(os.path.join(root, f)) as fh:
                    tree = ast.parse(fh.read())
            for node in tree.body:
                if not isinstance(node, ast.ClassDef) or node.name.startswith("_"):
                    continue
                ours = next((getattr(m, node.name) for m in mods if hasattr(m, node.name)), None)
                if ours is None:
                    continue  # covered (or flagged) by the name-level sweep
                for member in node.body:
                    names = []
                    if isinstance(member, (ast.FunctionDef, ast.AsyncFunctionDef)):
                        names = [member.name]
                    elif isinstance(member, ast.Assign):
                        names = [t.id for t in member.targets if isinstance(t, ast.Name)]
                    for n in names:
                        key = f"{rel}.{node.name}.{n}"
                        if n.startswith("_") or key in ALLOWED_MISSING_MEMBERS:
                            continue
                        if not hasattr(ours, n):
                            missing.append(key)

    assert not missing, "reference class members with no counterpart:\n" + "\n".join(missing)


# reference script -> our CLI module (console entry points in pyproject)
SCRIPT_MAP = {
    "starfit": "isochrones_tpu/cli/starfit.py",
    "batch_starfit": "isochrones_tpu/cli/batch.py",
    "starfit-summarize": "isochrones_tpu/cli/summarize.py",
    "starmodel-select": "isochrones_tpu/cli/select.py",
    "clusterfit.py": "isochrones_tpu/cli/clusterfit.py",
    "mist-initialize.py": "isochrones_tpu/cli/initialize.py",
    "generate_cmd.py": "isochrones_tpu/cli/generate_cmd.py",
}

# reference flags with no counterpart, with the reason on record
ALLOWED_MISSING_FLAGS = {
    # schwimmbad-style --ncores exists under the same name; MPI pools are
    # replaced by --mpi (multiprocessing) + starfit --multihost (DCN)
}


def _argparse_flags(path):
    import re

    with open(path) as fh:
        txt = fh.read()
    out = set()
    for m in re.finditer(r"add_argument\(([^)]*)\)", txt, re.S):
        for s in re.findall(r"""["']([^"']+)["']""", m.group(1)):
            if s.startswith("-"):
                out.add(s)
    return out


def test_cli_flag_parity():
    """Every reference console-script flag is accepted by our CLI."""
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    scripts_root = os.path.join(os.path.dirname(REFERENCE_ROOT), "scripts")
    if not os.path.isdir(scripts_root):
        pytest.skip("reference scripts not present")
    missing = []
    for ref_name, ours_rel in SCRIPT_MAP.items():
        ref_flags = _argparse_flags(os.path.join(scripts_root, ref_name))
        our_flags = _argparse_flags(os.path.join(repo_root, ours_rel))
        for f in sorted(ref_flags - our_flags):
            key = f"{ref_name}:{f}"
            if key not in ALLOWED_MISSING_FLAGS:
                missing.append(key)
    assert not missing, "reference CLI flags with no counterpart:\n" + "\n".join(missing)
