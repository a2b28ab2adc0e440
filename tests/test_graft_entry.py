"""Driver-contract tests for __graft_entry__.py.

The driver (a) compile-checks ``entry()`` single-chip and (b) runs
``dryrun_multichip(8)`` under whatever platform the host session exposes
(round 1 shipped with that gate red because the function assumed the mesh
already existed).  Here we pin both contracts: the multichip body must run
end-to-end on the pytest 8-device CPU mesh, and the self-provision helper
must be a no-op when an adequate mesh is already live.
"""
import sys
import pytest

pytestmark = pytest.mark.slow  # heavy harness: excluded from the fast lane
from pathlib import Path

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __graft_entry__ as graft  # noqa: E402


def test_dryrun_multichip_runs_on_existing_mesh():
    graft.dryrun_multichip(8)


def test_ensure_virtual_mesh_noop_when_provisioned():
    before = jax.devices()
    graft._ensure_virtual_mesh(8)
    assert jax.devices() == before


def test_entry_contract_shapes():
    fn, args = graft.entry()
    assert callable(fn)
    params, text_cond, text_uncond, lengths, rng = args
    assert text_cond.shape == text_uncond.shape
    assert lengths.shape[0] == text_cond.shape[0]
