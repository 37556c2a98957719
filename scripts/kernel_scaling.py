"""Pure decode-kernel scaling probe (supplementary evidence for
BENCH/BASELINE.md): the full-catalog Arrow UDF's numpy kernel — FLAC/WAV/PCM
decode + reference-signal SNR — run under a plain multiprocessing pool at
two worker counts, no Spark. Isolates "does the compute scale" from this
box's shared-memory-bus and scheduler effects.

Usage: python scripts/kernel_scaling.py [--n N_CLIPS] [--procs 8 32]
Prints one JSON line per worker count plus the efficiency ratio.
"""

from __future__ import annotations

import argparse
import json
import multiprocessing as mp
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("MALLOC_MMAP_THRESHOLD_", str(128 * 1024 * 1024))


def _work(args: tuple[int, int]) -> int:
    lo, hi = args
    import numpy as np  # noqa: F401

    from anzlic_validator_spark.functions.audio import decode, ref_signal, snr_db
    from anzlic_validator_spark.synth import _clip_row

    n_ok = 0
    for i in range(lo, hi):
        row = _clip_row(i, 42, True)
        pcm, sr_emb, err = decode(row["bytes"], row["codec"])
        if err is None and pcm is not None:
            sr = sr_emb or int(row["sr_hz"])
            ref = ref_signal(i, sr, pcm.size, 42)
            if snr_db(ref, pcm) >= 30.0:
                n_ok += 1
    return n_ok


def run(n_clips: int, procs: int, warmup: bool) -> float:
    chunks = [(i * n_clips // (procs * 4), (i + 1) * n_clips // (procs * 4))
              for i in range(procs * 4)]
    with mp.Pool(procs) as pool:
        if warmup:
            pool.map(_work, chunks[:procs])  # spawn + import warmup
        t0 = time.monotonic()
        pool.map(_work, chunks)
        return time.monotonic() - t0


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8000)
    ap.add_argument("--procs", type=int, nargs=2, default=[8, 32])
    args = ap.parse_args()
    walls = {}
    for p in args.procs:
        walls[p] = run(args.n, p, warmup=True)
        print(json.dumps({"procs": p, "wall_s": round(walls[p], 2),
                          "clips_per_sec": round(args.n / walls[p], 1)}))
    a, b = args.procs
    eff = (args.n / walls[b]) / ((b / a) * (args.n / walls[a]))
    print(json.dumps({"pair": f"{a}->{b}", "efficiency": round(eff, 3)}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
