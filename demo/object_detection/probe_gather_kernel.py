"""TPU compile + perf probe: Pallas DMA row-gather vs XLA table[idx].

Shapes are the Mask R-CNN 640^2 RoIAlign reality (BENCHMARKS.md
gather-bandwidth analysis): a packed FPN table of ~34k rows x 1024 bf16
channels (2 KB rows) per image, ~78k gathered rows per image across the
box (512 RoIs x 7x7) + mask (top-100 x 14x14 x ... ) branches — the
round-2 microbench measured XLA at ~20M rows/s = ~40 GB/s effective.

Chained-in-jit timing per CLAUDE.md (standalone dispatches sit on the
~0.86 ms relay floor): K applications per jit with the index vector
varied per step to defeat CSE, fetch-true sync.

RUN THIS WITH A TIMEOUT IN THE BACKGROUND — a hung Mosaic compile can
wedge the axon relay (CLAUDE.md):

    timeout 900 python demo/object_detection/probe_gather_kernel.py
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

N_ROWS = 34_000          # packed P2..P5 table, 640^2
C = 1024                 # 4 corners x 256 ch, bf16 -> 2 KB rows
R = 78_000               # box + mask branch rows per image
K = 8                    # chained applications per jit


def bench(fn, tag, idx0):
    @jax.jit
    def chained(table, idx):
        acc = jnp.zeros((C,), jnp.float32)
        for t in range(K):
            # vary indices per step (cheap, defeats CSE)
            ii = (idx + t) % N_ROWS
            out = fn(table, ii)
            acc = acc + out[0].astype(jnp.float32)
        return acc

    rng = np.random.default_rng(0)
    table = jnp.asarray(rng.normal(size=(N_ROWS, C)), jnp.bfloat16)
    t0 = time.time()
    res = float(jnp.sum(chained(table, idx0)))
    print(f"  {tag}: compiled+first-run in {time.time() - t0:.1f}s "
          f"(sum {res:.2f})", flush=True)
    reps = []
    for _ in range(5):
        t0 = time.perf_counter()
        res = float(jnp.sum(chained(table, idx0)))
        reps.append((time.perf_counter() - t0) / K)
    reps.sort()
    dt = reps[len(reps) // 2]
    rows_s = R / dt
    gbs = rows_s * C * 2 / 1e9
    print(f"  {tag}: {dt * 1e3:8.3f} ms/gather  {rows_s / 1e6:6.1f} M rows/s"
          f"  {gbs:6.1f} GB/s effective", flush=True)
    return dt


def main():
    rng = np.random.default_rng(1)
    idx0 = jnp.asarray(rng.integers(0, N_ROWS, size=R), jnp.int32)

    print(f"row gather: table [{N_ROWS}, {C}] bf16, {R} rows, K={K}",
          flush=True)
    xla = bench(lambda t, i: t[i], "XLA table[idx]", idx0)

    for g, wave in [(256, 16), (512, 16), (256, 32), (1024, 32)]:
        try:
            dt = bench(lambda t, i, g=g, w=wave: gather_rows(t, i, g=g,
                                                             wave=w),
                       f"pallas g={g} wave={wave}", idx0)
            print(f"  -> {xla / dt:.2f}x vs XLA", flush=True)
        except Exception as e:
            print(f"  pallas g={g} wave={wave} FAILED: "
                  f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
