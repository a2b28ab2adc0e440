"""The guarded sys.modules stub helper itself (tests/_stubs.py): it must
refuse to stub installed packages — the round-3 regression was an empty
``joblib`` stub silently breaking HF transformers' lazy imports for every
test collected after it."""
import sys
import types

import pytest

from _stubs import stub_missing, stub_ref_submodule


def test_refuses_to_stub_installed_package(monkeypatch):
    # Order-independent: earlier tests may have imported sklearn/HF, which
    # pulls the real joblib into sys.modules and makes stub_missing take the
    # (safe) setdefault early-return instead of raising.  Drop the top-level
    # entry for the duration of this test so the guard consults the import
    # machinery (find_spec) and exercises the refusal branch deterministically.
    monkeypatch.delitem(sys.modules, "joblib", raising=False)
    with pytest.raises(RuntimeError, match="refusing to stub"):
        stub_missing("joblib")  # joblib IS installed in this image
    assert "joblib" not in sys.modules  # no empty stub left behind


def test_preimported_real_package_is_never_replaced():
    """The other order: when the real package is already imported,
    stub_missing must early-return without raising AND without replacing
    the real module (the production-safety branch)."""
    import joblib  # noqa: F401 — ensure the real module is in sys.modules

    real = sys.modules["joblib"]
    stub_missing("joblib")
    assert sys.modules["joblib"] is real


def test_stubs_genuinely_missing_package():
    name = "definitely_not_a_real_package_xyz"
    assert name not in sys.modules
    try:
        stub_missing(name)
        assert isinstance(sys.modules[name], types.ModuleType)
        # idempotent: a second call keeps the first stub
        first = sys.modules[name]
        stub_missing(name)
        assert sys.modules[name] is first
    finally:
        sys.modules.pop(name, None)


def test_keeps_existing_entry_even_for_real_names():
    """setdefault semantics: if an earlier test installed something under
    the name (e.g. the vendored smplx alias), stub_missing must not raise
    and must not replace it."""
    name = "fake_alias_target_abc"
    marker = types.ModuleType(name)
    sys.modules[name] = marker
    try:
        stub_missing(name)
        assert sys.modules[name] is marker
    finally:
        sys.modules.pop(name, None)


def test_ref_submodule_guard():
    with pytest.raises(ValueError):
        stub_ref_submodule("numpy.fake", types.ModuleType("numpy.fake"))
    # a module the reference actually ships must be refused
    with pytest.raises(RuntimeError, match="reference ships it"):
        stub_ref_submodule("ladiff.models.architectures.vision_transformer",
                           types.ModuleType("x"))
    # a reference-internal module that does NOT exist is accepted
    name = "ladiff.models.architectures.not_a_real_backbone"
    try:
        stub_ref_submodule(name, types.ModuleType(name))
        assert name in sys.modules
    finally:
        sys.modules.pop(name, None)
