"""Device physicality filter vs the numpy oracle.

The sampling pipeline's host tail runs the clash check jitted on the
accelerator (`filter_unphysical_masks_device`); the numpy implementation
(`filter_unphysical_masks`, mirroring convert_chemgraph.py:296-395) is the
oracle.
"""

import numpy as np

from se3diff_tpu.struct.physics import (
    filter_unphysical_masks,
    filter_unphysical_masks_device,
    get_physical_frame_indices,
)
from se3diff_tpu.struct.residues import ATOM37_C, ATOM37_CA, ATOM37_N


def _frames(M=24, N=12, seed=0):
    """Mostly-physical extended chains plus injected chain breaks and
    clashes, with a realistic sparse atom37 mask."""
    rng = np.random.default_rng(seed)
    atom37 = np.zeros((M, N, 37, 3))
    backbone = np.cumsum(np.full((N, 3), [3.6, 0.4, 0.0]), axis=0)
    for a, off in [(ATOM37_N, -1.2), (ATOM37_CA, 0.0), (ATOM37_C, 1.2)]:
        atom37[:, :, a] = backbone + np.array([off, 0.0, 0.0])
    atom37[:, :, 4] = backbone + np.array([0.0, 1.4, 0.2])  # CB-ish
    atom37 += rng.standard_normal(atom37.shape) * 0.05
    mask = np.zeros((N, 37), bool)
    mask[:, [ATOM37_N, ATOM37_CA, ATOM37_C, 4]] = True

    atom37[3, N // 2 :, :, 0] += 30.0  # chain break (CA and C-N)
    atom37[7, 0] = atom37[7, N - 1]  # clash: residue 0 on top of N-1
    atom37[11, N - 1, :, 0] -= backbone[N - 1, 0] - backbone[2, 0]  # clash
    return atom37, mask


def test_device_filter_matches_numpy_oracle():
    atom37, mask = _frames()
    ok_ca, ok_cn, ok_clash = filter_unphysical_masks(atom37, mask)
    want = ok_ca & ok_cn & ok_clash
    got = np.asarray(filter_unphysical_masks_device(atom37, mask))
    np.testing.assert_array_equal(got, want)
    # The injected defects are actually detected.
    assert not want[3] and not want[7]
    assert want.sum() < len(want)


def test_get_physical_frame_indices_device_flag():
    atom37, mask = _frames(seed=1)
    np.testing.assert_array_equal(
        get_physical_frame_indices(atom37, mask, device=True),
        get_physical_frame_indices(atom37, mask),
    )


def test_device_filter_odd_chunking():
    """Frame counts that don't divide the lax.map chunk size."""
    atom37, mask = _frames(M=37, seed=2)
    got = np.asarray(filter_unphysical_masks_device(atom37, mask, frame_chunk=8))
    ok = filter_unphysical_masks(atom37, mask)
    np.testing.assert_array_equal(got, ok[0] & ok[1] & ok[2])
