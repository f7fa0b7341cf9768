import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import sr_esrnet, sr_unetdisc
from fourk_nerf_tpu.train import sr_losses


def _sftnet(scale=4, n_in=3, num_cond=1):
    model = sr_esrnet.SFTNet(n_in_colors=n_in, scale=scale, num_feat=16, num_block=2,
                             num_grow_ch=8, num_cond=num_cond)
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, n_in)), jnp.zeros((1, 8, 8, num_cond))
    )["params"]
    return model, params


def test_sftnet_upsamples_4x():
    model, params = _sftnet()
    x = jnp.ones((1, 8, 8, 3)) * 0.5
    cond = jnp.zeros((1, 8, 8, 1))
    out = model.apply({"params": params}, x, cond)
    assert out.shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sftnet_scale1_and_cond_dependence():
    model, params = _sftnet(scale=1, num_cond=1)
    x = jnp.ones((1, 8, 8, 3)) * 0.5
    o0 = model.apply({"params": params}, x, jnp.zeros((1, 8, 8, 1)))
    o1 = model.apply({"params": params}, x, jnp.ones((1, 8, 8, 1)))
    assert o0.shape == (1, 8, 8, 3)
    # the SFT conditioning must modulate the output
    assert not np.allclose(np.asarray(o0), np.asarray(o1))


def test_tile_process_matches_per_tile_oracle():
    """The batched-scan tiling must equal a straightforward per-tile loop with
    the same pad/crop arithmetic (validating the paste logic), and stay close
    to the full-frame forward away from tile seams."""
    model, params = _sftnet()
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, 12, 10, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(size=(1, 12, 10, 1)).astype(np.float32))
    apply_fn = lambda p, x, c: model.apply({"params": p}, x, c)
    scale, ts, tp = 4, 6, 4
    tiled = sr_esrnet.tile_process(apply_fn, params, img, cond, tile_size=ts, tile_pad=tp)

    # oracle: identical padding + per-tile forward in a python loop
    import math

    H, W = 12, 10
    ny, nx = math.ceil(H / ts), math.ceil(W / ts)
    ph, pw = ny * ts + 2 * tp, nx * ts + 2 * tp
    img_p = np.asarray(jnp.pad(img, ((0, 0), (tp, ph - H - tp), (tp, pw - W - tp), (0, 0)), mode="edge"))
    cond_p = np.asarray(jnp.pad(cond, ((0, 0), (tp, ph - H - tp), (tp, pw - W - tp), (0, 0)), mode="edge"))
    out = np.zeros((H * scale, W * scale, 3), np.float32)
    for y in range(ny):
        for x in range(nx):
            sy, sx = y * ts, x * ts
            t = img_p[:, sy:sy + ts + 2 * tp, sx:sx + ts + 2 * tp]
            ct = cond_p[:, sy:sy + ts + 2 * tp, sx:sx + ts + 2 * tp]
            sr = np.asarray(apply_fn(params, jnp.asarray(t), jnp.asarray(ct)))[0]
            core = sr[tp * scale:(tp + ts) * scale, tp * scale:(tp + ts) * scale]
            oy, ox = sy * scale, sx * scale
            h = min(ts * scale, H * scale - oy)
            w = min(ts * scale, W * scale - ox)
            out[oy:oy + h, ox:ox + w] = core[:h, :w]
    assert tiled.shape == (1, H * scale, W * scale, 3)
    assert np.allclose(tiled[0], out, atol=1e-5)

    # loose sanity against the seamless full-frame pass (receptive field of
    # the RRDB body exceeds the pad, so only rough agreement is expected --
    # same as the reference's tile_pad=10 tiling)
    full = np.asarray(apply_fn(params, img, cond))
    assert np.abs(tiled - full).mean() < 0.1


def test_unet_discriminator_shapes_and_sn_state():
    model = sr_unetdisc.UNetDiscriminatorSN(num_feat=8)
    x = jnp.zeros((2, 32, 32, 3))
    variables = model.init(jax.random.PRNGKey(0), x)
    out, new_state = model.apply(
        {"params": variables["params"], "spectral": variables["spectral"]},
        jnp.ones((2, 32, 32, 3)), update_sn=True, mutable=["spectral"],
    )
    assert out.shape == (2, 32, 32, 1)
    # power iteration must move u
    u_old = variables["spectral"]["conv1"]["u"]
    u_new = new_state["spectral"]["conv1"]["u"]
    assert not np.allclose(np.asarray(u_old), np.asarray(u_new))


def test_spectral_norm_bounds_singular_value():
    # after many power iterations the effective top singular value ~ 1
    model = sr_unetdisc.SNConv(features=8, kernel_size=(3, 3))
    x = jnp.ones((1, 8, 8, 4))
    variables = model.init(jax.random.PRNGKey(0), x)
    params, state = variables["params"], variables["spectral"]
    # scale the kernel up; SN should still normalize it
    params = {"kernel": params["kernel"] * 37.0}
    for _ in range(30):
        _, mut = model.apply({"params": params, "spectral": state}, x, True,
                             mutable=["spectral"])
        state = mut["spectral"]
    k = np.asarray(params["kernel"])
    w = k.transpose(3, 0, 1, 2).reshape(8, -1)
    u = np.asarray(state["u"])
    v = w.T @ u / np.linalg.norm(w.T @ u)
    sigma = float(u @ w @ v / np.linalg.norm(u))
    true_sigma = np.linalg.svd(w, compute_uv=False)[0]
    assert abs(sigma - true_sigma) / true_sigma < 0.05


def test_gan_loss_matches_bce():
    pred = jnp.array([[-1.0, 0.0, 2.0]])
    # BCE with logits, target=1: softplus(-x)
    expected = float(np.mean(np.log1p(np.exp(-np.asarray(pred)))))
    got = float(sr_losses.gan_loss(pred, True, is_disc=True))
    assert abs(got - expected) < 1e-6
    # generator-side scaling
    got_g = float(sr_losses.gan_loss(pred, True, is_disc=False, loss_weight=0.05))
    assert abs(got_g - 0.05 * expected) < 1e-6
    # target=0: softplus(x)
    expected0 = float(np.mean(np.log1p(np.exp(np.asarray(pred))) ))
    got0 = float(sr_losses.gan_loss(pred, False, is_disc=True))
    assert abs(got0 - expected0) < 1e-5


def test_gram_matrix():
    feat = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 4, 3)).astype(np.float32))
    g = np.asarray(sr_losses._gram(feat))
    f = np.asarray(feat).reshape(2, 16, 3)
    ref = np.einsum("nic,nid->ncd", f, f) / (3 * 4 * 4)
    assert np.allclose(g, ref, atol=1e-5)


def test_sftnet_torch_import_roundtrip():
    """Build a torch-style state dict from our params and re-import it."""
    import torch

    model, params = _sftnet(scale=4, n_in=3, num_cond=1)

    sd = {}

    def add_conv(tname, p):
        k = np.asarray(p["kernel"])  # HWIO -> OIHW
        sd[tname + ".weight"] = torch.from_numpy(np.ascontiguousarray(k.transpose(3, 2, 0, 1)))
        sd[tname + ".bias"] = torch.from_numpy(np.asarray(p["bias"]).copy())

    add_conv("conv_first", params["conv_first"])
    add_conv("conv_body", params["conv_body"])
    add_conv("conv_up1", params["conv_up1"])
    add_conv("conv_up2", params["conv_up2"])
    add_conv("conv_hr", params["conv_hr"])
    add_conv("conv_last", params["conv_last"])
    for i, cn in enumerate(["cond0", "cond1", "cond2", "cond3"]):
        add_conv(f"CondNet.{i * 2}", params[cn])
    inv_sft = {v: k for k, v in sr_esrnet._SFT_MAP.items()}
    for bi in range(2):
        blk = params[f"body{bi}"]
        for rdb in ("rdb1", "rdb2", "rdb3"):
            for conv in ("conv1", "conv2", "conv3", "conv4", "conv5"):
                add_conv(f"body.{bi}.{rdb}.{conv}", blk[rdb][conv])
            for sft in ("sft0", "sft1"):
                for ours, theirs in [(o, inv_sft[o]) for o in blk[rdb][sft]]:
                    add_conv(f"body.{bi}.{rdb}.{sft}.{theirs}", blk[rdb][sft][ours])
        for ours in blk["sft0"]:
            add_conv(f"body.{bi}.sft0.{inv_sft[ours]}", blk["sft0"][ours])
    for ours in params["sftbody"]:
        add_conv(f"sftbody.{inv_sft[ours]}", params["sftbody"][ours])

    imported = sr_esrnet.import_sftnet_torch(sd, num_block=2)
    merged = sr_esrnet.merge_params(params, imported)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(merged)):
        assert np.allclose(np.asarray(a), np.asarray(b))


def test_pose_and_viewdir_discriminators():
    import jax
    import jax.numpy as jnp

    dp = sr_unetdisc.UNetDiscriminatorSNPose(num_feat=8, cmap_dim=16)
    v = dp.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 9)))
    out, _ = dp.apply({"params": v["params"], "spectral": v["spectral"]},
                      jnp.ones((2, 32, 32, 3)), jnp.ones((2, 9)),
                      update_sn=True, mutable=["spectral"])
    assert out.shape == (2, 1)

    dv = sr_unetdisc.UNetDiscriminatorSNViewdir(num_feat=8, cmap_dim=16)
    v = dv.init(jax.random.PRNGKey(1), jnp.zeros((2, 32, 32, 3)), jnp.zeros((2, 8, 8, 63)))
    out, _ = dv.apply({"params": v["params"], "spectral": v["spectral"]},
                      jnp.ones((2, 32, 32, 3)), jnp.ones((2, 8, 8, 63)),
                      update_sn=True, mutable=["spectral"])
    assert out.shape == (2, 1)


def test_sftnet_bf16_close_to_f32():
    """bf16 SR inference (apply_bf16) stays within bf16 tolerance of the f32
    path on [0,1] images -- validates the fast decode default."""
    model = sr_esrnet.SFTNet(n_in_colors=3, scale=4, num_feat=16, num_block=1,
                             num_grow_ch=8, num_cond=1)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    c = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 1)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), x, c)["params"]
    y32 = np.asarray(model.apply({"params": params}, x, c))
    y16 = np.asarray(sr_esrnet.apply_bf16(model, params, x, c))
    assert y16.shape == y32.shape
    assert np.abs(y16 - y32).max() < 3e-2, np.abs(y16 - y32).max()
