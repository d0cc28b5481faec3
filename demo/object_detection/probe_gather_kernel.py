"""TPU compile + perf probe: Pallas DMA row-gather vs XLA table[idx].

Two measurements, chained-in-jit per CLAUDE.md (standalone dispatches
sit on the ~0.86 ms relay floor), fetch-true sync:

1. raw row-gather at the Mask R-CNN packed-table shape (34k x 1024 bf16
   2 KB rows, 78k gathered rows) — every gathered row is consumed by a
   sum so neither arm can dead-code rows (XLA may still fuse its sum
   into the gather while the kernel materializes its output; the
   decision measurement is #2, where both paths feed identical math);
2. the REAL op: multilevel_roi_align at 640^2 b8 Mask R-CNN shapes with
   gather_impl="xla" vs "pallas" (identical numerics pinned by
   tests/test_pallas_gather.py).

RUN WITH A TIMEOUT IN THE BACKGROUND — a hung Mosaic compile can wedge
the axon relay (CLAUDE.md):

    timeout 1800 python demo/object_detection/probe_gather_kernel.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", ".."))
import jax
import jax.numpy as jnp
import numpy as np

from tlxcv_tpu.ops.pallas.gather import gather_rows
from tlxcv_tpu.ops.roi_align import multilevel_roi_align

N_ROWS = 34_000          # packed P2..P5 table, 640^2
C = 1024                 # 4 corners x 256 ch, bf16 -> 2 KB rows
R = 78_000               # box + mask branch rows per image
K = 8


def _median_time(fn, reps=5):
    t0 = time.time()
    first = float(fn())
    compile_s = time.time() - t0
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], compile_s, first


def bench_raw(fn, tag, idx0, table):
    @jax.jit
    def chained(table, idx):
        acc = jnp.zeros((), jnp.float32)
        for t in range(K):
            ii = (idx + t) % N_ROWS          # defeat CSE
            out = fn(table, ii)
            acc = acc + jnp.sum(out.astype(jnp.float32))  # consume ALL rows
        return acc

    dt, cs, first = _median_time(lambda: jnp.sum(chained(table, idx0)))
    dt /= K
    rows_s = R / dt
    print(f"  {tag}: {dt * 1e3:8.3f} ms/gather  {rows_s / 1e6:6.1f} M rows/s"
          f"  {rows_s * C * 2 / 1e9:6.1f} GB/s  (compile {cs:.0f}s)",
          flush=True)
    return dt


def bench_align(gather_impl, feats, boxes):
    @jax.jit
    def chained(feats, boxes):
        acc = jnp.zeros((), jnp.float32)
        for t in range(4):
            bx = boxes + jnp.float32(t)      # defeat CSE
            out = multilevel_roi_align(feats, bx, output_size=7,
                                       sampling_ratio=1,
                                       gather_impl=gather_impl)
            acc = acc + jnp.sum(out.astype(jnp.float32))
        return acc

    dt, cs, first = _median_time(lambda: jnp.sum(chained(feats, boxes)))
    dt /= 4
    print(f"  roi_align[{gather_impl:6s}]: {dt * 1e3:8.3f} ms/align "
          f"(compile {cs:.0f}s, sum {first:.1f})", flush=True)
    return dt


def main():
    rng = np.random.default_rng(1)
    idx0 = jnp.asarray(rng.integers(0, N_ROWS, size=R), jnp.int32)
    table = jnp.asarray(rng.normal(size=(N_ROWS, C)), jnp.bfloat16)

    print(f"1) raw row gather: table [{N_ROWS}, {C}] bf16, {R} rows, K={K}",
          flush=True)
    xla = bench_raw(lambda t, i: t[i], "XLA table[idx] ", idx0, table)
    for g, wave in [(256, 16), (512, 32), (1024, 32)]:
        try:
            dt = bench_raw(
                lambda t, i, g=g, w=wave: gather_rows(t, i, g=g, wave=w),
                f"pallas g={g:4d} w={wave:2d}", idx0, table)
            print(f"    -> {xla / dt:.2f}x vs XLA", flush=True)
        except Exception as e:
            print(f"  pallas g={g} wave={wave} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # r5 reformulation: BlockSpec-index-map pipeline (gather_rows_bs) —
    # no manual DMA, Mosaic's own double-buffered fetches
    from tlxcv_tpu.ops.pallas.gather import gather_rows_bs
    for g in (4, 8, 16):
        try:
            dt = bench_raw(
                lambda t, i, g=g: gather_rows_bs(t, i, g=g),
                f"pallas_bs g={g:3d}   ", idx0, table)
            print(f"    -> {xla / dt:.2f}x vs XLA", flush=True)
        except Exception as e:
            print(f"  pallas_bs g={g} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    print("2) multilevel_roi_align 640^2 b8, 512 boxes, s=7 sr=1",
          flush=True)
    feats = [jnp.asarray(rng.normal(size=(8, hw, hw, 256)), jnp.bfloat16)
             for hw in (160, 80, 40, 20)]
    lo = rng.uniform(0, 500, size=(8, 512, 2)).astype(np.float32)
    wh = rng.uniform(16, 140, size=(8, 512, 2)).astype(np.float32)
    boxes = jnp.asarray(np.concatenate([lo, lo + wh], -1))
    x = bench_align("xla", feats, boxes)
    for impl in ("pallas_bs", "pallas"):
        try:
            p = bench_align(impl, feats, boxes)
            print(f"    -> {x / p:.2f}x vs XLA", flush=True)
        except Exception as e:
            print(f"  roi_align[{impl}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
