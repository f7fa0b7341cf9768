"""Cross-device training-statistics collection.

TPU-native equivalent of the reference's ``training_stats`` moment collector
(/root/reference/torch_utils/training_stats.py:56-266): metrics are
accumulated as (count, sum, sum-of-squares) moment triples; in multi-device
training the triples are reduced with ``jax.lax.psum`` inside the jitted step
(replacing the reference's ``torch.distributed.all_reduce``), and the host
side keeps exponential aggregates per metric.

Usage inside a jitted/sharded step::

    moments = stats.moments(loss_vector)          # [3] triple
    moments = jax.lax.psum(moments, "data")       # optional cross-device
    # return moments to host, then:
    collector.report("train/loss", moments)

Host side::

    collector = stats.Collector()
    collector.report_scalar("lr", 0.1)
    collector.as_dict()["train/loss"].mean
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np


def moments(x) -> jnp.ndarray:
    """[count, sum, sum_sq] of a tensor (traceable)."""
    x = jnp.asarray(x, dtype=jnp.float32)
    return jnp.stack([jnp.asarray(x.size, jnp.float32), jnp.sum(x), jnp.sum(x * x)])


@dataclasses.dataclass
class Stat:
    num: float = 0.0
    total: float = 0.0
    total_sq: float = 0.0

    @property
    def mean(self) -> float:
        return self.total / max(self.num, 1e-8)

    @property
    def std(self) -> float:
        if self.num <= 1:
            return 0.0
        var = self.total_sq / self.num - self.mean**2
        return float(np.sqrt(max(var, 0.0)))


class Collector:
    """Accumulates moment triples per metric name; ``reset()`` between
    reporting intervals (mirrors training_stats.Collector semantics)."""

    def __init__(self):
        self._stats: dict[str, Stat] = {}

    def report(self, name: str, m) -> None:
        m = np.asarray(m, dtype=np.float64)
        s = self._stats.setdefault(name, Stat())
        s.num += float(m[0])
        s.total += float(m[1])
        s.total_sq += float(m[2])

    def report_scalar(self, name: str, value: float) -> None:
        self.report(name, [1.0, float(value), float(value) ** 2])

    def mean(self, name: str, default: float = float("nan")) -> float:
        return self._stats[name].mean if name in self._stats else default

    def as_dict(self) -> dict[str, Stat]:
        return dict(self._stats)

    def reset(self) -> None:
        self._stats.clear()
