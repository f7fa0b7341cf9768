#!/usr/bin/env python3
"""Long-slice artifact builder (VERDICT r4 item 4): parse one or more
trainer logs (original + resumed segments) into a JSON record with
it/s-over-time, pg_scale boundary markers, val/gate events, checkpoint
events, and the bit-exactness comparison of overlapping re-printed iters
between the original and resumed segments.

Usage:
    python tools/dev/parse_slice_log.py out.json log1 [log2 ...]
"""
from __future__ import annotations

import json
import re
import sys

ITER = re.compile(
    r"iter\s+(\d+)\s*/\s*(.*?)\s*/\s*PSNR(?:_SR)?:\s*([\d.]+)\s*/\s*Eps:\s*(\d+)s")
VAL = re.compile(r"evaluate_sr: psnr ([\d.]+) ssim ([\d.]+)"
                 r"(?: lpips\(proxy\) ([\d.]+))?")
CKPT = re.compile(r"saved checkpoint at (\S+)")
BEST = re.compile(r"best ckpt|new best", re.IGNORECASE)
PG = re.compile(r"pg_scale|scale_volume_grid|grid window (\d+) at world_size"
                r" \(([\d, ]+)\)")


def parse(path: str) -> dict:
    iters, vals, ckpts, best_events, grid_events = [], [], [], [], []
    with open(path, errors="replace") as f:
        for line in f:
            m = ITER.search(line)
            if m:
                it, terms, psnr, eps = m.groups()
                iters.append({"iter": int(it), "psnr": float(psnr),
                              "eps_s": int(eps), "line": line.strip()})
                continue
            m = VAL.search(line)
            if m:
                vals.append({"psnr": float(m.group(1)),
                             "ssim": float(m.group(2)),
                             "lpips_proxy": (float(m.group(3))
                                             if m.group(3) else None)})
            m = CKPT.search(line)
            if m:
                ckpts.append(m.group(1))
            if BEST.search(line):
                best_events.append(line.strip())
            m = PG.search(line)
            if m:
                grid_events.append(line.strip())
    # it/s between successive prints
    rate = []
    for a, b in zip(iters, iters[1:]):
        di, dt = b["iter"] - a["iter"], b["eps_s"] - a["eps_s"]
        if di > 0 and dt > 0:
            rate.append({"iter": b["iter"], "it_per_s": round(di / dt, 3)})
    return {"log": path, "n_prints": len(iters), "iters": iters,
            "rate": rate, "vals": vals, "ckpts": ckpts,
            "best_events": best_events, "grid_events": grid_events}


def main() -> None:
    dst, srcs = sys.argv[1], sys.argv[2:]
    segs = [parse(s) for s in srcs]
    out = {"segments": segs}
    if len(segs) >= 2:
        # bit-exactness: overlapping iters re-printed by the resumed
        # segment must match the original's full print lines exactly
        # (deterministic batch stream + donated-state step contract)
        orig = {r["iter"]: r["line"] for r in segs[0]["iters"]}
        overlap, mismatch = [], []
        for r in segs[1]["iters"]:
            if r["iter"] in orig:
                same = _strip_eps(orig[r["iter"]]) == _strip_eps(r["line"])
                (overlap if same else mismatch).append(r["iter"])
        out["resume_overlap_iters"] = overlap
        out["resume_mismatch_iters"] = mismatch
        out["resume_bit_exact"] = (len(mismatch) == 0 and len(overlap) > 0)
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    for s in segs:
        r = [x["it_per_s"] for x in s["rate"]]
        print(f"{s['log']}: {s['n_prints']} prints, "
              f"it/s min/med/max = "
              f"{min(r):.2f}/{sorted(r)[len(r)//2]:.2f}/{max(r):.2f}"
              if r else f"{s['log']}: {s['n_prints']} prints")
    if "resume_bit_exact" in out:
        print("resume overlap:", len(out["resume_overlap_iters"]),
              "mismatches:", out["resume_mismatch_iters"] or "none",
              "bit_exact:", out["resume_bit_exact"])
    print("wrote", dst)


def _strip_eps(line: str) -> str:
    # Eps is wall-clock since segment start -- the one legitimately
    # different field between original and resumed prints
    return re.sub(r"Eps:\s*\d+s", "", line)


if __name__ == "__main__":
    main()
