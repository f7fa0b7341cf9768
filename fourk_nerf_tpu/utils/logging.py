"""Experiment logging: scalar writer + provenance dump.

TensorBoard-compatible when ``tensorboardX``/``torch.utils.tensorboard`` is
available; always mirrors scalars to a plain ``scalars.tsv`` so runs are
inspectable with no dependencies (reference uses SummaryWriter,
/root/reference/run.py:695-696, and dumps args+config for provenance,
run.py:641-646).
"""

from __future__ import annotations

import os
import time


class ScalarWriter:
    def __init__(self, logdir: str):
        self.logdir = logdir
        os.makedirs(logdir, exist_ok=True)
        self._tsv = open(os.path.join(logdir, "scalars.tsv"), "a")
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter  # type: ignore

            self._tb = SummaryWriter(logdir)
        except Exception:
            pass

    def scalar(self, tag: str, value: float, step: int) -> None:
        self._tsv.write(f"{time.time():.3f}\t{step}\t{tag}\t{value}\n")
        self._tsv.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, value, global_step=step)

    def close(self) -> None:
        self._tsv.close()
        if self._tb is not None:
            self._tb.close()


def dump_provenance(cfg, args, rundir: str) -> None:
    """Write args.txt + resolved config.py into the run dir (run.py:641-646)."""
    from fourk_nerf_tpu.config import dump_config

    os.makedirs(rundir, exist_ok=True)
    with open(os.path.join(rundir, "args.txt"), "w") as f:
        for k in sorted(vars(args)):
            f.write(f"{k} = {getattr(args, k)}\n")
    dump_config(cfg, os.path.join(rundir, "config.py"))
