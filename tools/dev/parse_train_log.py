#!/usr/bin/env python3
"""Parse trainer stdout (the ``i_print`` lines, trainer.py/sr_trainer.py)
into a JSON curves artifact: per-iteration loss terms + PSNR + elapsed.

Usage:
    python tools/dev/parse_train_log.py /tmp/medtrain.log profile_r3/curves_med/curves.json
"""

from __future__ import annotations

import json
import os
import re
import sys

LINE = re.compile(
    r"iter\s+(\d+)\s*/\s*(.*?)\s*/\s*PSNR(?:_SR)?:\s*([\d.]+)\s*/\s*Eps:\s*(\d+)s")
TERM = re.compile(r"(loss_\w+):\s*([\d.eE+-]+)")


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    rows = []
    final_eval = None
    with open(src) as f:
        for line in f:
            m = LINE.search(line)
            if m:
                it, terms, psnr, eps = m.groups()
                row = {"iter": int(it), "psnr": float(psnr),
                       "elapsed_s": int(eps)}
                row.update({k: float(v) for k, v in TERM.findall(terms)})
                rows.append(row)
            m = re.search(r"evaluate_sr: psnr ([\d.]+) ssim ([\d.]+)", line)
            if m:
                final_eval = {"psnr": float(m.group(1)),
                              "ssim": float(m.group(2))}
    os.makedirs(os.path.dirname(os.path.abspath(dst)), exist_ok=True)
    with open(dst, "w") as f:
        json.dump({"curves": rows, "final_eval": final_eval}, f, indent=1)
    print(f"wrote {dst}: {len(rows)} points, final_eval={final_eval}")


if __name__ == "__main__":
    main()
