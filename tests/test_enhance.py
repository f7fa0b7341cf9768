import numpy as np
import jax
import jax.numpy as jnp

from fourk_nerf_tpu.models import sr_esrnet


def test_enhance_shapes_and_tiling_agree():
    model = sr_esrnet.SFTNet(n_in_colors=3, scale=4, num_feat=8, num_block=1,
                             num_grow_ch=4, num_cond=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 8, 8, 3)),
                        jnp.zeros((1, 8, 8, 1)))["params"]
    apply_fn = lambda p, x, c: model.apply({"params": p}, x, c)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(size=(1, 11, 13, 3)).astype(np.float32))
    cond = jnp.asarray(rng.uniform(size=(1, 11, 13, 1)).astype(np.float32))

    out = sr_esrnet.enhance(apply_fn, params, img, cond, scale=4, pre_pad=2, mod=4)
    assert np.asarray(out).shape == (1, 44, 52, 3)

    out_tiled = sr_esrnet.enhance(apply_fn, params, img, cond, scale=4, pre_pad=2,
                                  mod=4, tile_size=6, tile_pad=4)
    assert np.asarray(out_tiled).shape == (1, 44, 52, 3)
    # tiles approximate the seamless pass (receptive field > pad)
    assert np.abs(np.asarray(out_tiled) - np.asarray(out)).mean() < 0.15
