"""Checkpoint save/load + torch import shims."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from fourk_nerf_tpu.models import dmpigo, sr_esrnet
from fourk_nerf_tpu.train import checkpoints


pytestmark = __import__('pytest').mark.smoke

def test_npz_roundtrip_with_opt_state(tmp_path):
    cfg = dmpigo.make_config(
        xyz_min=[-1, -1, 0], xyz_max=[1, 1, 1], num_voxels=8 * 8 * 4, mpi_depth=4,
        rgbnet_dim=4, rgbnet_width=8,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    from fourk_nerf_tpu.train import optim

    opt = optim.init_state(params)
    path = str(tmp_path / "ck.npz")
    checkpoints.save_checkpoint(path, dmpigo.get_kwargs(cfg), params, buffers, opt, 123)
    kwargs, p2, b2, o2, step, meta = checkpoints.load_checkpoint(path)
    assert step == 123
    cfg2 = dmpigo.make_config(**kwargs)
    assert cfg2 == cfg
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(p2)):
        assert np.allclose(np.asarray(a), np.asarray(b))
    assert o2 is not None and int(o2["step"]) == 0
    assert b2["mask_cache"].dtype == bool


def test_torch_encoder_import(tmp_path):
    """Build a reference-style .tar from known tensors and import it."""
    torch = pytest.importorskip("torch")
    X, Y, Z, C = 6, 5, 4, 3
    rng = np.random.default_rng(0)
    density = rng.normal(size=(1, 1, X, Y, Z)).astype(np.float32)
    k0 = rng.normal(size=(1, C, X, Y, Z)).astype(np.float32)
    w0 = rng.normal(size=(8, C + 3)).astype(np.float32)  # torch (out,in)
    b0 = rng.normal(size=(8,)).astype(np.float32)
    w1 = rng.normal(size=(3, 8)).astype(np.float32)
    b1 = np.zeros(3, np.float32)
    act_shift = rng.normal(size=(1, 1, 1, 1, Z)).astype(np.float32)
    mask = rng.uniform(size=(X, Y, Z)) < 0.5

    sd = {
        "density.grid": torch.from_numpy(density),
        "k0.grid": torch.from_numpy(k0),
        "rgbnet.0.weight": torch.from_numpy(w0),
        "rgbnet.0.bias": torch.from_numpy(b0),
        "rgbnet.2.weight": torch.from_numpy(w1),
        "rgbnet.2.bias": torch.from_numpy(b1),
        "act_shift.grid": torch.from_numpy(act_shift),
        "mask_cache.mask": torch.from_numpy(mask),
    }
    ckpt = {
        "global_step": 30000,
        "model_kwargs": {
            "xyz_min": np.array([-1.0, -1, 0]), "xyz_max": np.array([1.0, 1, 1]),
            "num_voxels": X * Y * Z, "mpi_depth": Z, "voxel_size_ratio": 64.0,
            "rgbnet_dim": C,
        },
        "model_state_dict": sd,
    }
    path = str(tmp_path / "fine_last.tar")
    torch.save(ckpt, path)

    kwargs, params, buffers, step = checkpoints.import_torch_encoder_checkpoint(path)
    assert step == 30000
    assert params["density"].shape == (X, Y, Z, 1)
    assert np.allclose(np.asarray(params["density"])[..., 0], density[0, 0])
    assert params["k0"].shape == (X, Y, Z, C)
    assert np.allclose(np.asarray(params["k0"])[..., 1], k0[0, 1])
    assert np.allclose(np.asarray(params["rgbnet"]["w0"]), w0.T)
    assert np.allclose(np.asarray(params["rgbnet"]["b1"]), b1)
    assert buffers["act_shift"].shape == (1, 1, Z, 1)
    assert np.asarray(buffers["mask_cache"]).dtype == bool


def test_rrdbnet_bps_shapes():
    model = sr_esrnet.RRDBNetBPS(n_colors=3, scale=4, num_feat=8, num_block=1, num_grow_ch=4)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 6, 6, 3)))["params"]
    out = model.apply({"params": params}, jnp.ones((1, 6, 6, 3)) * 0.3)
    assert out.shape == (1, 24, 24, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_pixel_shuffle_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 3, 4)).astype(np.float32)  # NCHW C=8
    ref = torch.nn.functional.pixel_shuffle(torch.from_numpy(x), 2).numpy()
    ours = np.asarray(sr_esrnet._pixel_shuffle2(jnp.asarray(x.transpose(0, 2, 3, 1))))
    assert np.allclose(ours.transpose(0, 3, 1, 2), ref, atol=1e-6)


def test_nnfm_loss_runs_with_random_vgg():
    from fourk_nerf_tpu.train import sr_losses

    loss = sr_losses.NNFMLoss(layers=("conv1_2",), allow_random_vgg=True)
    x = jnp.asarray(np.random.default_rng(0).uniform(size=(1, 16, 16, 3)).astype(np.float32))
    g = jnp.asarray(np.random.default_rng(1).uniform(size=(1, 16, 16, 3)).astype(np.float32))
    out = loss(x, g, loss_names=("nnfm_loss", "gram_loss", "content_loss"))
    for v in out.values():
        assert np.isfinite(float(v))
    same = loss(x, x, loss_names=("nnfm_loss",))
    assert float(same["nnfm_loss"]) < 1e-5


def test_async_save_bitexact_and_donation_safe(tmp_path):
    """Async saves must (a) land bit-identical to sync saves, (b) snapshot
    the values at call time even when the caller's buffers are donated to a
    later computation, (c) be waitable before load."""
    cfg = dmpigo.make_config(
        xyz_min=[-1, -1, 0], xyz_max=[1, 1, 1], num_voxels=8 * 8 * 4,
        mpi_depth=4, rgbnet_dim=4, rgbnet_width=8,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))
    params = jax.device_put(params)
    expect = {k: np.asarray(v) for k, v in params.items()
              if not isinstance(v, dict)}

    p_sync = str(tmp_path / "sync.npz")
    p_async = str(tmp_path / "async.npz")
    checkpoints.save_checkpoint(p_sync, dmpigo.get_kwargs(cfg), params,
                                buffers, global_step=7)
    checkpoints.save_checkpoint(p_async, dmpigo.get_kwargs(cfg), params,
                                buffers, global_step=7, async_save=True)

    # donate + overwrite the live buffers BEFORE the async write finishes:
    # the snapshot must hold the pre-donation values
    bump = jax.jit(lambda t: jax.tree.map(lambda x: x + 1.0, t),
                   donate_argnums=(0,))
    params = bump(params)
    jax.block_until_ready(params)

    checkpoints.wait_for_pending_saves()
    _, pa, _, _, step_a, _ = checkpoints.load_checkpoint(p_async)
    _, ps, _, _, _, _ = checkpoints.load_checkpoint(p_sync)
    assert step_a == 7
    for k in ("density", "k0"):
        np.testing.assert_array_equal(np.asarray(pa[k]), expect[k])
        np.testing.assert_array_equal(np.asarray(pa[k]), np.asarray(ps[k]))


def test_async_save_error_surfaces(tmp_path, monkeypatch):
    """A failing background write must raise from wait_for_pending_saves,
    not vanish."""
    cfg = dmpigo.make_config(
        xyz_min=[-1, -1, 0], xyz_max=[1, 1, 1], num_voxels=4 * 4 * 4,
        mpi_depth=4, rgbnet_dim=0,
    )
    params, buffers = dmpigo.init(cfg, jax.random.PRNGKey(0))

    def boom(path, flat):
        raise OSError("disk full (simulated)")

    monkeypatch.setattr(checkpoints, "_write_npz", boom)
    checkpoints.save_checkpoint(str(tmp_path / "x.npz"),
                                dmpigo.get_kwargs(cfg), params,
                                buffers, async_save=True)
    with pytest.raises(OSError, match="disk full"):
        checkpoints.wait_for_pending_saves()
