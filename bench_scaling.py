"""Multi-device scaling harness: reads/s of the sharded coverage step
at 1, 2, 4, ... devices, with parallel efficiency.

On this environment only one TPU chip is attached, so the default run
uses N virtual CPU devices to validate the sharded program end-to-end
(collective overhead is real, per-device FLOPs are not — treat CPU
numbers as a harness check, not a TPU projection). On a real slice run
with PANDEPTH_SCALING_REAL=1.

Prints one JSON line per device count:
  {"devices": n, "reads_per_s": r, "efficiency": e}
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax

    if os.environ.get("PANDEPTH_SCALING_REAL") != "1":
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices",
                          int(os.environ.get("PANDEPTH_SCALING_DEVICES",
                                             "8")))
    import jax.numpy as jnp
    import numpy as np

    from pandepth_tpu.device.layout import GenomeLayout
    from pandepth_tpu.sharding.mesh import (make_mesh,
                                            sharded_coverage_step)

    n_avail = len(jax.devices())
    n_reads_per_dev = int(os.environ.get("PANDEPTH_SCALING_READS",
                                         "65536"))
    rng = np.random.RandomState(0)
    lengths = np.array([40_000_000, 25_000_000], np.int64)
    layout = GenomeLayout(lengths)

    base_rate = None
    n = 1
    while n <= n_avail:
        mesh = make_mesh(jax.devices()[:n], dp=1)
        reads = n * n_reads_per_dev
        tid = rng.randint(0, 2, reads).astype(np.int32)
        pos = rng.randint(0, 20_000_000, reads).astype(np.int32)
        flag = np.zeros(reads, np.int32)
        mapq = np.full(reads, 60, np.int32)
        opr = np.arange(reads, dtype=np.int32)
        opr_local = (opr % n_reads_per_dev).astype(np.int32)
        opc = np.zeros(reads, np.int32)
        opl = rng.randint(50, 151, reads).astype(np.int32)

        step = sharded_coverage_step(mesh, flags_mask=1796, min_mapq=-1,
                                     min_dep=1)
        bounds = jnp.asarray(layout.shard_bounds(n))
        seg_tid = np.array([0, 1], np.int32)
        seg_lo = jnp.asarray(layout.offsets[seg_tid])
        seg_hi = jnp.asarray(layout.offsets[seg_tid] + lengths)
        args = (jnp.asarray(tid), jnp.asarray(pos), jnp.asarray(flag),
                jnp.asarray(mapq), jnp.asarray(opc), jnp.asarray(opl),
                jnp.asarray(opr_local), jnp.asarray(layout.offsets),
                jnp.asarray(layout.limits), bounds, seg_lo, seg_hi)
        jax.block_until_ready(step(*args))  # compile + warm
        t0 = time.perf_counter()
        iters = 5
        for _ in range(iters):
            out = step(*args)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / iters
        rate = reads / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n)
        print(json.dumps({"devices": n, "reads_per_s": round(rate, 1),
                          "efficiency": round(eff, 3)}))
        sys.stdout.flush()
        n *= 2


if __name__ == "__main__":
    main()
