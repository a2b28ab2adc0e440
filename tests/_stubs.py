"""Guarded ``sys.modules`` stubbing for reference-side optional imports.

Parity tests import reference modules whose own imports name packages not
installed here (``clip``, ``smplx``, ``bpy``, ``config``).  Stubbing those
is process-global — pytest imports every test module into ONE interpreter —
so an errant stub of a *real* package silently poisons every test collected
afterwards (round 3 shipped an empty ``joblib`` stub that broke HF
transformers' lazy ``generation`` module for 5 unrelated tests).  The
helpers here therefore refuse to stub anything that is actually importable:

- :func:`stub_missing` — top-level packages.  Raises if the package is
  installed; a stub for a genuinely-missing package cannot poison later
  imports because nothing else in the process can import that name anyway.
- :func:`stub_ref_submodule` — ``ladiff.*`` reference-internal modules the
  reference tree itself does not ship (e.g. ``maed_utils``).  Confined to
  the reference's private namespace, so only reference imports — which the
  parity tests control — can see them; raises if the file actually exists.
"""
import importlib.util
import os
import sys
import types

_REF_SRC = "/root/reference/src"


def stub_missing(name, module=None):
    """Install ``module`` (default: empty ``ModuleType``) under ``name``,
    verifying first that no real package of that name is importable."""
    if name in sys.modules:
        return  # setdefault semantics: an earlier (guarded) install wins
    top = name.split(".")[0]
    if top not in sys.modules:
        # find_spec would short-circuit through sys.modules (e.g. a vendored
        # alias another test installed deliberately), so only consult the
        # import machinery when the top-level name is genuinely unclaimed.
        try:
            spec = importlib.util.find_spec(top)
        except (ImportError, ValueError):
            spec = None
        if spec is not None:
            raise RuntimeError(
                f"refusing to stub {name!r}: a real {top!r} package is "
                f"installed; stubbing it would poison later imports in this "
                f"process (see the round-3 joblib regression)")
    sys.modules[name] = module if module is not None else types.ModuleType(name)


def stub_ref_submodule(name, module):
    """Install a stub for a reference-internal ``ladiff.*`` module that the
    reference tree imports but does not ship."""
    if not name.startswith("ladiff."):
        raise ValueError(f"{name!r} is not reference-internal")
    path = os.path.join(_REF_SRC, *name.split(".")) + ".py"
    pkg = os.path.join(_REF_SRC, *name.split("."), "__init__.py")
    if os.path.exists(path) or os.path.exists(pkg):
        raise RuntimeError(
            f"refusing to stub {name!r}: the reference ships it at {path}")
    sys.modules.setdefault(name, module)
