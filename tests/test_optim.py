import numpy as np
import jax.numpy as jnp

from fourk_nerf_tpu.train import optim


pytestmark = __import__('pytest').mark.smoke

def _adam_oracle(p, g, m, v, step, lr, per_lr=None, masked=False):
    """NumPy replica of adam_upd_kernel.cu:8-58."""
    b1, b2, eps = optim.BETA1, optim.BETA2, optim.EPS
    step_size = lr * np.sqrt(1 - b2**step) / (1 - b1**step)
    m_new, v_new, p_new = m.copy(), v.copy(), p.copy()
    mask = (g != 0) if masked else np.ones_like(g, dtype=bool)
    m_new[mask] = b1 * m[mask] + (1 - b1) * g[mask]
    v_new[mask] = b2 * v[mask] + (1 - b2) * g[mask] ** 2
    delta = step_size * m_new / (np.sqrt(v_new) + eps)
    if per_lr is not None:
        delta = delta * per_lr
    p_new[mask] = p[mask] - delta[mask]
    return p_new, m_new, v_new


def test_plain_adam_update_matches_kernel_math():
    rng = np.random.default_rng(0)
    p = rng.normal(size=(10,)).astype(np.float32)
    params = {"density": jnp.asarray(p)}
    state = optim.init_state(params)
    m = np.zeros_like(p)
    v = np.zeros_like(p)
    pp = p.copy()
    for step in range(1, 4):
        g = rng.normal(size=(10,)).astype(np.float32)
        params, state = optim.apply_updates(
            params, {"density": jnp.asarray(g)}, state, {"density": 0.1}
        )
        pp, m, v = _adam_oracle(pp, g, m, v, step, 0.1)
    assert np.allclose(np.asarray(params["density"]), pp, atol=1e-5)
    assert int(state["step"]) == 3


def test_masked_update_skips_zero_grad_including_state():
    p = np.ones(6, dtype=np.float32)
    g = np.array([1.0, 0.0, -2.0, 0.0, 0.5, 0.0], dtype=np.float32)
    params = {"density": jnp.asarray(p)}
    state = optim.init_state(params)
    params, state = optim.apply_updates(
        params, {"density": jnp.asarray(g)}, state, {"density": 0.05},
        skip_zero_grad=frozenset({"density"}),
    )
    ref_p, ref_m, ref_v = _adam_oracle(p, g, np.zeros(6), np.zeros(6), 1, 0.05, masked=True)
    assert np.allclose(np.asarray(params["density"]), ref_p, atol=1e-7)
    assert np.allclose(np.asarray(state["exp_avg"]["density"]), ref_m, atol=1e-7)
    # zero-grad entries keep zero moments
    assert np.asarray(state["exp_avg_sq"]["density"])[1] == 0.0


def test_pervoxel_lr_scaling():
    p = np.ones(4, dtype=np.float32)
    g = np.full(4, 2.0, dtype=np.float32)
    per = np.array([1.0, 0.5, 0.25, 0.0], dtype=np.float32)
    params = {"density": jnp.asarray(p)}
    state = optim.init_state(params)
    params, state = optim.apply_updates(
        params, {"density": jnp.asarray(g)}, state, {"density": 0.1},
        per_lr={"density": jnp.asarray(per)},
    )
    ref_p, _, _ = _adam_oracle(p, g, np.zeros(4), np.zeros(4), 1, 0.1, per_lr=per)
    assert np.allclose(np.asarray(params["density"]), ref_p, atol=1e-7)
    # zero per-voxel lr => no movement (but moments still update)
    assert np.asarray(params["density"])[3] == 1.0
    assert np.asarray(state["exp_avg"]["density"])[3] != 0.0


def test_nested_mlp_group_and_frozen_group():
    params = {
        "rgbnet": {"w0": jnp.ones((2, 2)), "b0": jnp.zeros(2)},
        "k0": jnp.ones(3),
    }
    grads = {
        "rgbnet": {"w0": jnp.full((2, 2), 0.5), "b0": jnp.full(2, 0.5)},
        "k0": jnp.full(3, 0.5),
    }
    state = optim.init_state(params)
    new_params, state = optim.apply_updates(params, grads, state, {"rgbnet": 1e-3})
    assert not np.allclose(np.asarray(new_params["rgbnet"]["w0"]), 1.0)
    # k0 has no lr entry -> frozen
    assert np.allclose(np.asarray(new_params["k0"]), 1.0)


def test_group_lr_decay_schedule():
    # decay by 0.1 every lrate_decay*1000 steps (run.py:560-563)
    lr = optim.group_lr(0.1, 20000, lrate_decay=20)
    assert np.isclose(lr, 0.01)
    assert np.isclose(optim.group_lr(0.1, 0, 20), 0.1)


def test_build_group_lrs_convention():
    class FakeCfg(dict):
        pass

    cfg = {"lrate_density": 0.1, "lrate_k0": 0.1, "lrate_rgbnet": 1e-3,
           "lrate_srnet": 0, "N_iters": 100}
    params = {"density": jnp.zeros(1), "k0": jnp.zeros(1), "rgbnet": {}}
    lrs = optim.build_group_lrs(cfg, params)
    assert lrs == {"density": 0.1, "k0": 0.1, "rgbnet": 1e-3}
