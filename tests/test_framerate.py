"""Framerate subsample/upsample parity vs the reference implementation."""
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")
# clip is genuinely uninstalled (guard-checked; see tests/_stubs.py) — the
# stub cannot poison later imports because nothing else can import "clip".
from _stubs import stub_missing  # noqa: E402

stub_missing("clip")
if "/root/reference/src" not in sys.path:
    sys.path.insert(0, "/root/reference/src")

from ladiff_tpu.data.framerate import subsample, upsample  # noqa: E402


def test_subsample_matches_reference():
    from ladiff.data.sampling.framerate import subsample as ref_sub

    for n, last, new in ((250, 100, 12.5), (40, 12.5, 12.5), (7, 24, 8)):
        np.testing.assert_array_equal(subsample(n, last, new),
                                      ref_sub(n, last, new))


def test_upsample_matches_reference():
    from ladiff.data.sampling.framerate import upsample as ref_up

    rng = np.random.RandomState(0)
    motion = rng.randn(9, 21, 3).astype(np.float32)
    for last, new in ((12.5, 100), (8, 24), (12.5, 12.5)):
        ours = upsample(motion, last, new)
        ref = np.asarray(ref_up(torch.tensor(motion), last, new))
        np.testing.assert_allclose(ours, ref, atol=1e-6)
