"""Quantify the documented edge-patch deviation (PARITY.md): the joint-SR
trainer's border-CLAMPED fixed-size patches vs the reference's ragged
partition (patch_gen, /root/reference/lib/dvgo.py:822-848).

The reference splits each image into BS x BS patches plus smaller ragged
remainders at the right/bottom edges -- every pixel appears EXACTLY once per
epoch.  Our sampler (train/sr_trainer.make_patch_sampler) keeps every patch
full-size (static shapes for XLA) by clamping edge-patch origins to the
border, so a strip of width ``BS - H % BS`` (resp. W) is covered twice per
epoch.  This test measures that deviation exactly so PARITY.md can state it
as numbers rather than prose.
"""

import numpy as np

from fourk_nerf_tpu.train.sr_trainer import make_patch_sampler


def _coverage_ours(H, W, patch):
    rows = sorted({min(r, H - patch) for r in range(0, H, patch)})
    cols = sorted({min(c, W - patch) for c in range(0, W, patch)})
    cov = np.zeros((H, W), np.int64)
    for r in rows:
        for c in cols:
            cov[r:r + patch, c:c + patch] += 1
    return cov


def test_edge_patch_double_coverage_fern_scale():
    """Fern-scale LLFF frame (756x1008), 64px patches."""
    H, W, patch = 756, 1008, 64
    cov = _coverage_ours(H, W, patch)
    # reference coverage is identically 1 (exact ragged partition)
    # interior pixels: exactly once per epoch, same as the reference
    assert cov.max() <= 4 and cov.min() == 1
    over = cov - 1
    # the double-covered strips: last grid origin vs clamped origin overlap
    strip_h = (H // patch) * patch - (H - patch)   # 704-692 = 12 rows
    strip_w = (W // patch) * patch - (W - patch)
    assert strip_h == 12 and strip_w == 16
    # fraction of per-epoch loss weight added vs the reference's uniform 1x
    excess = over.sum() / (H * W)
    # 12/756 + 16/1008 + small corner term ~= 3.2% extra weight, all of it
    # within `patch` px of the right/bottom borders
    assert 0.030 < excess < 0.034, excess
    inner = over[:H - patch, :W - patch]
    assert inner.sum() == 0


def test_patch_sampler_epoch_matches_coverage():
    """The actual sampler visits each (row, col) origin exactly once per
    epoch, so per-pixel loss weight per epoch == the coverage map."""
    H = W = 100
    patch = 64
    sample = make_patch_sampler(1, H, W, patch, seed=0)
    # epoch = n_views * n_rows * n_cols combos
    rows = sorted({min(r, H - patch) for r in range(0, H, patch)})
    cols = sorted({min(c, W - patch) for c in range(0, W, patch)})
    n = len(rows) * len(cols)
    seen = np.zeros((H, W), np.int64)
    for step in range(n):
        _v, r0, c0 = sample(step)
        seen[r0:r0 + patch, c0:c0 + patch] += 1
    np.testing.assert_array_equal(seen, _coverage_ours(H, W, patch))
    # H=W=100: origins {0, 36}; pixels [36, 64) double-covered per axis
    assert seen.max() == 4 and seen.min() == 1
    assert (seen[:36, :36] == 1).all()
    assert (seen[36:64, :36] == 2).all()
    assert (seen[36:64, 36:64] == 4).all()
