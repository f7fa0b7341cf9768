"""Self-describing checkpoints + torch-checkpoint import shim.

Native format: a single ``.npz`` with flattened tree paths plus a JSON
``model_kwargs`` blob -- preserving the reference's self-describing property
(models reconstruct from ``model_kwargs``, /root/reference/lib/utils.py:62-66,
run.py:616-633).

Import shim: reads the reference's torch ``.tar`` checkpoints (torch CPU) and
maps the ``[1, C, X, Y, Z]`` grid layout to our channel-last ``[X, Y, Z, C]``
and ``nn.Linear`` (out,in) weights to our (in,out) -- so published reference
checkpoints reproduce (BASELINE.md requirement).
"""

from __future__ import annotations

import json
import os
import threading

import numpy as np

from fourk_nerf_tpu.models import common

# -- async checkpointing ----------------------------------------------------
# A fern-scale joint checkpoint (grids + MaskedAdam moments) is ~4.5 GB; a
# synchronous save stalls training for the whole device->host transfer (>30
# min through the tunneled single-chip link in this image; seconds over PCIe
# on a real pod, but still a stall the reference pays too at
# /root/reference/run_sr.py:1022-1035). The TPU-native answer is the standard
# async-checkpoint pattern (orbax AsyncCheckpointer): snapshot the tree
# ON-DEVICE (an HBM->HBM copy, milliseconds -- REQUIRED anyway because the
# train steps donate their state buffers), then pull + write in a background
# thread while training continues. One worker with backpressure: a second
# save while one is in flight blocks until the first finishes, bounding the
# extra HBM footprint to one snapshot.
_SAVE_LOCK = threading.Lock()
_PENDING: list = []  # [(path, concurrent.futures.Future)]
_POOL = None


def _snapshot(x):
    """Device-side copy of a jax.Array (safe against later donation);
    host arrays pass through as-is (np.savez will read them unchanged)."""
    import jax

    if isinstance(x, jax.Array):
        return x.copy()
    return x


def _write_npz(path: str, flat: dict) -> None:
    # np.asarray here is the device->host pull: it runs on the worker thread
    flat = {k: np.asarray(v) for k, v in flat.items()}
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)  # atomic: a kill mid-save leaves the old ckpt


def wait_for_pending_saves() -> None:
    """Block until every async save has landed on disk; re-raise the first
    worker failure. Call before process exit and before trusting a
    just-written checkpoint path."""
    with _SAVE_LOCK:
        pending, _PENDING[:] = _PENDING[:], []
    for path, fut in pending:
        fut.result()


def save_checkpoint(path: str, model_kwargs: dict, params: dict, buffers: dict,
                    opt_state: dict | None = None, global_step: int = 0,
                    extra_meta: dict | None = None,
                    async_save: bool = False) -> None:
    flat = {}
    flat.update({f"params/{k}": v for k, v in common.tree_to_flat_dict(params).items()})
    flat.update({f"buffers/{k}": v for k, v in common.tree_to_flat_dict(buffers).items()})
    if opt_state is not None:
        flat.update({f"opt/{k}": v for k, v in common.tree_to_flat_dict(opt_state).items()})
    meta = {"model_kwargs": model_kwargs, "global_step": int(global_step)}
    if extra_meta:
        meta.update(extra_meta)
    flat["__meta__"] = np.frombuffer(json.dumps(meta).encode(), dtype=np.uint8)
    if not async_save:
        _write_npz(path, flat)
        return

    import concurrent.futures

    import jax

    # backpressure BEFORE snapshotting: at most one in-flight save's HBM copy
    wait_for_pending_saves()
    snap = {k: _snapshot(v) for k, v in flat.items()}
    # the copies must be materialized before the caller's next (donating)
    # train step invalidates the source buffers
    for v in snap.values():
        if isinstance(v, jax.Array):
            v.block_until_ready()
    global _POOL
    with _SAVE_LOCK:
        if _POOL is None:
            _POOL = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt-save")
        _PENDING.append((path, _POOL.submit(_write_npz, path, snap)))


def load_checkpoint(path: str):
    """Returns (model_kwargs, params, buffers, opt_state_or_None, global_step, meta)."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    meta = json.loads(bytes(flat.pop("__meta__")).decode())
    groups: dict = {"params": {}, "buffers": {}, "opt": {}}
    for k, v in flat.items():
        head, rest = k.split("/", 1)
        groups[head][rest] = v
    params = common.flat_dict_to_tree(groups["params"])
    buffers = common.flat_dict_to_tree(groups["buffers"])
    opt_state = common.flat_dict_to_tree(groups["opt"]) if groups["opt"] else None
    if opt_state is not None and "step" in opt_state:
        import jax.numpy as jnp

        opt_state["step"] = jnp.asarray(opt_state["step"])
    return meta["model_kwargs"], params, buffers, opt_state, meta.get("global_step", 0), meta


# ---------------------------------------------------------------------------
# Torch checkpoint import (reference .tar produced by run.py:616-633)
# ---------------------------------------------------------------------------

def _torch_load(path):
    """Prefer the safe (weights_only) unpickler; reference checkpoints contain
    numpy scalars, so allowlist those. Falls back to the unsafe path with a
    loud warning -- imported .tar/.pth files execute pickle code otherwise."""
    import torch

    try:
        try:
            import numpy.core.multiarray as _ma  # numpy scalar reconstruction
            with torch.serialization.safe_globals(
                [_ma._reconstruct, np.ndarray, np.dtype,
                 np.dtypes.Float32DType, np.dtypes.Float64DType,
                 np.dtypes.Int64DType]
            ):
                return torch.load(path, map_location="cpu", weights_only=True)
        except (ImportError, AttributeError):
            return torch.load(path, map_location="cpu", weights_only=True)
    except Exception as e:  # pickle.UnpicklingError and friends
        print(f"checkpoints: WARNING safe load failed ({type(e).__name__}); "
              f"falling back to weights_only=False for {path} -- only do this "
              "with checkpoints you trust")
        return torch.load(path, map_location="cpu", weights_only=False)


def _grid_to_channel_last(t) -> np.ndarray:
    """[1, C, X, Y, Z] -> [X, Y, Z, C]."""
    arr = np.asarray(t.detach().numpy() if hasattr(t, "detach") else t, dtype=np.float32)
    assert arr.ndim == 5 and arr.shape[0] == 1, arr.shape
    return np.moveaxis(arr[0], 0, -1)


def import_torch_encoder_checkpoint(path: str):
    """Convert a reference encoder ``.tar`` into (model_kwargs, params, buffers).

    Handles both DirectVoxGO and DirectMPIGO state dicts:
    ``density.grid``/``k0.grid`` -> channel-last grids, ``rgbnet.{2i}.weight``
    -> transposed MLP mats, ``act_shift`` (dmpigo per-plane grid), and
    ``mask_cache.mask``.
    """
    ckpt = _torch_load(path)
    kwargs = dict(ckpt["model_kwargs"])
    for k in ("xyz_min", "xyz_max"):
        kwargs[k] = np.asarray(kwargs[k]).tolist()
    sd = ckpt["model_state_dict"]

    params: dict = {}
    buffers: dict = {}
    params["density"] = _grid_to_channel_last(sd["density.grid"])
    if "k0.grid" in sd:
        params["k0"] = _grid_to_channel_last(sd["k0.grid"])

    mlp = {}
    li = 0
    # torch Sequential(Linear, act, Linear, act, ..., Linear): Linear modules
    # sit at indices 0, 2, 4, ... but nested Sequentials flatten differently;
    # collect all '.weight' keys under 'rgbnet' in order instead.
    wkeys = sorted(
        (k for k in sd if k.startswith("rgbnet.") and k.endswith(".weight")),
        key=lambda k: [int(p) for p in k.split(".")[1:-1]],
    )
    for wk in wkeys:
        bk = wk[: -len("weight")] + "bias"
        mlp[f"w{li}"] = np.asarray(sd[wk].numpy(), dtype=np.float32).T
        mlp[f"b{li}"] = np.asarray(sd[bk].numpy(), dtype=np.float32)
        li += 1
    if mlp:
        params["rgbnet"] = mlp

    if "act_shift.grid" in sd:  # dmpigo per-plane bias [1,1,1,1,D] -> [1,1,D,1]
        buffers["act_shift"] = _grid_to_channel_last(sd["act_shift.grid"])
    if "mask_cache.mask" in sd:
        buffers["mask_cache"] = np.asarray(sd["mask_cache.mask"].numpy(), dtype=bool)

    return kwargs, params, buffers, int(ckpt.get("global_step", 0))


def mask_from_coarse_torch_checkpoint(path: str, mask_cache_thres: float):
    """Build a free-space mask from a coarse reference checkpoint's density
    grid: 3x3x3 max-pool then alpha threshold (/root/reference/lib/grid.py:277-284).

    Returns (mask [X,Y,Z] bool, xyz_min, xyz_max).
    """
    import torch
    import torch.nn.functional as F

    st = _torch_load(path)
    density = F.max_pool3d(
        st["model_state_dict"]["density.grid"], kernel_size=3, padding=1, stride=1
    )
    act_shift = st["model_state_dict"]["act_shift"]
    ratio = st["model_kwargs"]["voxel_size_ratio"]
    alpha = 1 - torch.exp(-F.softplus(density + act_shift) * ratio)
    mask = (alpha >= mask_cache_thres).squeeze(0).squeeze(0).numpy()
    return (
        mask,
        np.asarray(st["model_kwargs"]["xyz_min"]),
        np.asarray(st["model_kwargs"]["xyz_max"]),
    )


def mask_from_coarse_checkpoint(path: str, mask_cache_thres: float):
    """Same as above for our native ``.npz`` coarse checkpoints."""
    import jax.numpy as jnp

    from fourk_nerf_tpu.ops import grid_sample, render

    kwargs, params, buffers = load_checkpoint(path)[:3]
    density = jnp.asarray(params["density"])[..., 0]
    density = grid_sample.max_pool3d_same(density)
    # bounded model: scalar act shift derived from alpha_init
    act_shift = float(np.log(1.0 / (1.0 - kwargs["alpha_init"]) - 1.0))
    alpha = render.raw2alpha(density, act_shift, kwargs["voxel_size_ratio"])
    mask = np.asarray(alpha >= mask_cache_thres)
    return mask, np.asarray(kwargs["xyz_min"]), np.asarray(kwargs["xyz_max"])
