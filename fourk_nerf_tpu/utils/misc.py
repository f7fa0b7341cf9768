"""Miscellaneous runtime helpers.

Equivalents of the reference's ``torch_utils/misc.py`` surface actually used
by its pipeline: shape assertions, profiled-function tracing, an
infinite shuffled sampler, and replica-consistency checking (the reference's
``check_ddp_consistency``) for the multi-device path.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Iterator, Sequence

import jax
import numpy as np


def assert_shape(x, ref_shape: Sequence[int | None]) -> None:
    """Assert tensor shape with None wildcards (torch_utils/misc.py:84-97)."""
    shape = tuple(x.shape)
    assert len(shape) == len(ref_shape), f"rank {len(shape)} != {len(ref_shape)}"
    for i, (s, r) in enumerate(zip(shape, ref_shape)):
        assert r is None or s == r, f"dim {i}: {s} != {r} (full: {shape} vs {ref_shape})"


def profiled_function(fn):
    """Wrap a function in a jax.profiler trace annotation
    (replaces torch.autograd.profiler.record_function,
    torch_utils/misc.py:102-108)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.profiler.TraceAnnotation(fn.__name__):
            return fn(*args, **kwargs)

    return wrapper


@contextlib.contextmanager
def device_timer(label: str = "", sync=None):
    """Wall-clock timer with a device fence (replaces the reference's
    ``torch.cuda.synchronize`` timing pattern, run_sr.py:1443-1450)."""
    if sync is not None:
        jax.block_until_ready(sync)
    t0 = time.perf_counter()
    box = {}
    yield box
    box["seconds"] = time.perf_counter() - t0
    if label:
        print(f"{label}: {box['seconds']:.4f}s")


def infinite_sampler(n: int, rng: np.random.Generator, shuffle: bool = True,
                     rank: int = 0, num_replicas: int = 1) -> Iterator[int]:
    """Endless (optionally sharded) index stream
    (torch_utils/misc.py:113-147 InfiniteSampler)."""
    order = np.arange(n)
    while True:
        if shuffle:
            order = rng.permutation(n)
        for i in order[rank::num_replicas]:
            yield int(i)


def check_replica_consistency(tree) -> None:
    """Assert every device holds identical values for a replicated pytree
    (replaces check_ddp_consistency, torch_utils/misc.py:185-199)."""
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        shards = getattr(leaf, "addressable_shards", None)
        if not shards or len(shards) <= 1:
            continue
        ref = np.asarray(shards[0].data)
        for s in shards[1:]:
            if not np.array_equal(ref, np.asarray(s.data)):
                raise AssertionError(f"replica mismatch at {jax.tree_util.keystr(path)}")
