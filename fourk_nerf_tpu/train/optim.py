"""MaskedAdam: the reference's sparse-voxel Adam as a functional transform.

Reproduces the three CUDA update kernels
(/root/reference/lib/cuda/adam_upd_kernel.cu:8-58) exactly:

- plain Adam with ``step_size = lr * sqrt(1-b2^t) / (1-b1^t)`` and
  ``eps`` added outside the sqrt;
- masked update: entries with grad == 0 are skipped entirely -- moments
  included (``skip_zero_grad`` fields, lib/masked_adam.py:64-67);
- per-voxel lr: the update is scaled element-wise by ``count/count.max()``
  (``set_pervoxel_lr``, lib/masked_adam.py:35-37).

Param groups follow the reference's convention: top-level keys of the model
params dict are matched against ``lrate_<key>`` config entries
(/root/reference/lib/utils.py:21-48). Learning-rate decay is the caller's
job: the reference multiplies each group lr by ``0.1^(1/(lrate_decay*1000))``
per step and RESETS both lr and Adam state at every progressive-scaling
boundary (run.py:465-476,560-563) -- see :func:`group_lr`.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

BETA1, BETA2, EPS = 0.9, 0.99, 1e-8  # lib/masked_adam.py:19


def init_state(params: Any) -> dict:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return {
        "exp_avg": zeros,
        "exp_avg_sq": jax.tree.map(jnp.zeros_like, params),
        "step": jnp.zeros((), dtype=jnp.int32),
    }


def apply_updates(params: dict, grads: dict, state: dict, lrs: dict,
                  skip_zero_grad: frozenset = frozenset(),
                  per_lr: dict | None = None,
                  windows: dict | None = None):
    """One MaskedAdam step over a two-level params dict.

    Args:
      params/grads: ``{group_name: leaf_or_subdict}``.
      lrs: ``{group_name: lr}`` (already decayed); groups absent from ``lrs``
        are frozen (reference: lr<=0 => requires_grad=False).
      skip_zero_grad: group names using the masked update (static).
      per_lr: optional ``{group_name: array}`` element-wise lr scaling.
      windows: optional ``{group_name: (origins...)}`` WINDOWED update: the
        grad for that group is a static-size window of the full param array
        (leading dims sliced at the given traced integer origins, remaining
        dims full) and is identically zero outside it, so only the window's
        param/moment entries are read, updated and written back
        (dynamic_slice + dynamic_update_slice).  Exactly equivalent to the
        full masked update when the group is in ``skip_zero_grad``: outside
        the window grad == 0 and the masked update leaves p/m/v untouched.

    Returns (new_params, new_state).
    """
    step = state["step"] + 1
    t = step.astype(jnp.float32)
    bias_correction = jnp.sqrt(1.0 - BETA2**t) / (1.0 - BETA1**t)

    new_params: dict = {}
    new_m: dict = {}
    new_v: dict = {}
    for name, p in params.items():
        g = grads.get(name)
        lr = lrs.get(name)
        if g is None or lr is None:
            new_params[name] = p
            new_m[name] = state["exp_avg"][name]
            new_v[name] = state["exp_avg_sq"][name]
            continue
        step_size = lr * bias_correction
        masked = name in skip_zero_grad
        plr = per_lr.get(name) if per_lr else None

        def upd(p_leaf, g_leaf, m_leaf, v_leaf, plr_leaf=None):
            m_new = BETA1 * m_leaf + (1.0 - BETA1) * g_leaf
            v_new = BETA2 * v_leaf + (1.0 - BETA2) * g_leaf * g_leaf
            delta = step_size * m_new / (jnp.sqrt(v_new) + EPS)
            if plr_leaf is not None:
                delta = delta * plr_leaf
            if masked:
                nonzero = g_leaf != 0
                return (
                    jnp.where(nonzero, p_leaf - delta, p_leaf),
                    jnp.where(nonzero, m_new, m_leaf),
                    jnp.where(nonzero, v_new, v_leaf),
                )
            return p_leaf - delta, m_new, v_new

        m = state["exp_avg"][name]
        v = state["exp_avg_sq"][name]
        if isinstance(p, dict):
            flat_p, treedef = jax.tree.flatten(p)
            flat_g = treedef.flatten_up_to(g)
            flat_m = treedef.flatten_up_to(m)
            flat_v = treedef.flatten_up_to(v)
            outs = [upd(*leafs) for leafs in zip(flat_p, flat_g, flat_m, flat_v)]
            new_params[name] = jax.tree.unflatten(treedef, [o[0] for o in outs])
            new_m[name] = jax.tree.unflatten(treedef, [o[1] for o in outs])
            new_v[name] = jax.tree.unflatten(treedef, [o[2] for o in outs])
        elif windows and name in windows:
            assert plr is None, "windowed update does not support per_lr"
            assert masked, "windowed update requires skip_zero_grad semantics"
            start = tuple(windows[name]) + (0,) * (p.ndim - len(windows[name]))
            p_win = jax.lax.dynamic_slice(p, start, g.shape)
            m_win = jax.lax.dynamic_slice(m, start, g.shape)
            v_win = jax.lax.dynamic_slice(v, start, g.shape)
            np_w, nm_w, nv_w = upd(p_win, g, m_win, v_win)
            new_params[name] = jax.lax.dynamic_update_slice(p, np_w, start)
            new_m[name] = jax.lax.dynamic_update_slice(m, nm_w, start)
            new_v[name] = jax.lax.dynamic_update_slice(v, nv_w, start)
        else:
            plr_leaf = plr if (plr is not None and plr.shape == p.shape) else None
            new_params[name], new_m[name], new_v[name] = upd(p, g, m, v, plr_leaf)

    return new_params, {"exp_avg": new_m, "exp_avg_sq": new_v, "step": step}


def state_compatible(loaded: Any, fresh: Any) -> bool:
    """True when a checkpointed optimizer state has the same tree structure
    and leaf shapes as a freshly initialized one (grid shapes change across
    pg_scale, so a stale state must be rejected, not crash)."""
    try:
        la, ta = jax.tree.flatten(loaded)
        lb, tb = jax.tree.flatten(fresh)
    except Exception:
        return False
    if ta != tb or len(la) != len(lb):
        return False
    return all(
        getattr(x, "shape", None) == getattr(y, "shape", None) for x, y in zip(la, lb)
    )


def restore_state(loaded: Any, fresh: Any, *, label: str = "optimizer"):
    """Restore a checkpointed optimizer state when compatible, mirroring the
    reference's ``optimizer.load_state_dict`` on resume
    (/root/reference/lib/utils.py:53-59). Returns (state, restored_bool)."""
    if loaded is None:
        return fresh, False
    if not state_compatible(loaded, fresh):
        print(f"restore_state: checkpointed {label} state incompatible with "
              "current shapes; reinitializing")
        return fresh, False
    return jax.tree.map(jnp.asarray, loaded), True


def group_lr(lr0: float, steps_since_reset, lrate_decay: float):
    """lr after ``steps_since_reset`` optimizer steps (run.py:560-563)."""
    decay_factor = 0.1 ** (1.0 / (lrate_decay * 1000.0))
    return lr0 * decay_factor**steps_since_reset


def build_group_lrs(cfg_train, params: dict) -> dict:
    """Base lr per param group via the ``lrate_<name>`` convention
    (/root/reference/lib/utils.py:26-47). Groups with lr <= 0 are frozen."""
    lrs = {}
    for k in cfg_train.keys():
        if not k.startswith("lrate_"):
            continue
        name = k[len("lrate_"):]
        if name not in params:
            # DirectQVGO stores its codebook projection under 'k0_vq' but the
            # reference drives it with lrate_k0 (the VQGrid IS model.k0)
            if name == "k0" and "k0_vq" in params:
                name = "k0_vq"
            else:
                continue
        lr = cfg_train[k]
        if lr and lr > 0:
            lrs[name] = float(lr)
    return lrs
