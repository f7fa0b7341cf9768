"""Encoder-side patch samplers (patch_simg / patch_mimg / patch_inmask) in
train/trainer.make_batch_sampler.

Reference: /root/reference/lib/dvgo.py:786-878 (generators) and
run_sr.py:822-843 (the only WORKING consumers -- run.py:485-496 unpacks 3
values from generators that yield 2/6 and would crash).  We mirror the
working semantics with the repo's static-square clamped-tile scheme
(tests/test_patch_coverage.py quantifies the edge deviation).
"""

import numpy as np
import pytest

from fourk_nerf_tpu.train.trainer import make_batch_sampler

pytestmark = pytest.mark.smoke


def _flat(V=3, H=40, W=56):
    rng = np.random.default_rng(0)
    return {k: rng.normal(size=(V, H, W, 3)).astype(np.float32)
            for k in ("rgb", "rays_o", "rays_d", "viewdirs")}


def _epoch_coverage(sample, n_steps, V, H, W, P):
    cov = np.zeros((V, H, W), np.int64)
    for s in range(n_steps):
        kind, (v, r, c) = sample(s)
        assert kind == "patch"
        assert 0 <= r <= H - P and 0 <= c <= W - P
        cov[v, r:r + P, c:c + P] += 1
    return cov


def test_patch_mimg_epoch_covers_every_view():
    flat = _flat()
    V, H, W = flat["rgb"].shape[:3]
    sample = make_batch_sampler("patch_mimg", flat, n_rand=1024, seed=7)
    P = sample.patch
    assert P == 16  # min(1024//64, 40, 56) -> 16
    n_pos = len({min(r, H - P) for r in range(0, H, P)}) * \
        len({min(c, W - P) for c in range(0, W, P)})
    cov = _epoch_coverage(sample, V * n_pos, V, H, W, P)
    # every pixel of every view covered at least once per epoch
    assert (cov > 0).all()


def test_patch_simg_exhausts_one_view_before_the_next():
    flat = _flat()
    V, H, W = flat["rgb"].shape[:3]
    sample = make_batch_sampler("patch_simg", flat, n_rand=1024, seed=7)
    P = sample.patch
    n_pos = len({min(r, H - P) for r in range(0, H, P)}) * \
        len({min(c, W - P) for c in range(0, W, P)})
    views = [sample(s)[1][0] for s in range(2 * n_pos)]
    assert set(views[:n_pos]) == {0}
    assert set(views[n_pos:]) == {1}
    # within a block, positions cover the whole image exactly once
    cov = _epoch_coverage(sample, n_pos, V, H, W, P)
    assert (cov[0] > 0).all() and cov[1:].sum() == 0


def test_patch_inmask_drops_all_miss_patches():
    flat = _flat()
    V, H, W = flat["rgb"].shape[:3]
    hit = np.zeros((V, H, W), bool)
    hit[0] = True  # only view 0 intersects the coarse geometry
    sample = make_batch_sampler("patch_inmask", flat, n_rand=1024, seed=7,
                                hit=hit)
    views = {sample(s)[1][0] for s in range(50)}
    assert views == {0}
    # an all-False mask must never filter down to an empty rotation
    sample = make_batch_sampler("patch_inmask", flat, n_rand=1024, seed=7,
                                hit=np.zeros((V, H, W), bool))
    assert sample(0)[0] == "patch"


def test_patch_samplers_are_resume_stable():
    # a freshly constructed sampler replays the identical stream at any step
    flat = _flat()
    for name in ("patch_simg", "patch_mimg"):
        a = make_batch_sampler(name, flat, n_rand=1024, seed=3)
        ref = [a(s) for s in range(40)]
        b = make_batch_sampler(name, flat, n_rand=1024, seed=3)
        assert [b(s) for s in range(17, 40)] == ref[17:40]


def test_patch_side_follows_reference_rule_and_clamps():
    # side = N_rand//64 (reference patch_gen BS rule) rounded to x8, clamped
    # to the image
    flat = _flat(V=1, H=400, W=400)
    assert make_batch_sampler("patch_mimg", flat, 4096, 0).patch == 64
    flat = _flat(V=1, H=24, W=24)
    assert make_batch_sampler("patch_mimg", flat, 4096, 0).patch == 24
    flat = _flat(V=1, H=9, W=9)
    assert make_batch_sampler("patch_mimg", flat, 256, 0).patch == 8
