"""Device-path benchmark: the warm DEVICE engine end-to-end on the
3 Gb north-star fixture, captured on the real accelerator.

Writes ``BENCH_DEVICE.json`` (merge-update) with, all measured when
the chip answers:

- ``device_e2e_wall_s`` / ``device_reads_per_s`` /
  ``device_vs_baseline``: warm in-process CLI walls with
  ``PANDEPTH_HOST_FINALIZE=0`` (the resident daemon's cost model on a
  locally attached accelerator), median of N with IQR, against the
  reference binary's median wall on the same fixture + host.
- ``wire_mb_s``: host->device transfer throughput through this
  environment's TPU tunnel (one 16 MB ``device_put`` timed to a
  1-element fetch; ``block_until_ready`` returns instantly through
  the tunnel so a readback is the only real barrier).
- ``finalize_dispatch_ms`` / ``finalize_redispatch_ms`` /
  ``finalize_pairs``: the fused finalize program (decode + sort +
  prefix scans + segment eval in ONE XLA dispatch,
  ``sweep.finalize_encoded``) — first warm dispatch and the
  steady-state re-dispatch of the SAME resident program, harvested
  from the engine's ``PANDEPTH_SEG_DEBUG=2`` instrumentation during a
  real CLI run.

Every device-perf sentence in README/COMPONENTS renders from this
artifact (tools/render_docs.py); VERDICT r4 #1: no device claim
without a committed platform=device measurement behind it.

Usage:  python bench_device.py          # full capture
        PANDEPTH_DEVBENCH_RUNS=3 ...    # fewer e2e reps
"""

from __future__ import annotations

import contextlib
import io
import json
import os
import re
import statistics
import sys
import time

import bench as bench_mod

OUT = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                   "BENCH_DEVICE.json")
N_RUNS = int(os.environ.get("PANDEPTH_DEVBENCH_RUNS", 5))


def merge_write(updates: dict) -> None:
    data = {}
    try:
        with open(OUT) as fh:
            data = json.load(fh)
    except (OSError, ValueError):
        pass
    data.update(updates)
    with open(OUT, "w") as fh:
        json.dump(data, fh, indent=1, sort_keys=True)
        fh.write("\n")


def time_device_cli(bam: str, extra=()) -> float:
    from pandepth_tpu.cli import main as cli_main

    out = os.path.join(bench_mod.BENCH_DIR, "devout")
    t0 = time.perf_counter()
    rc = cli_main(["pandepth", "-i", bam, "-o", out] + list(extra))
    wall = time.perf_counter() - t0
    assert rc == 0
    return wall


def measure_wire_mb_s() -> float:
    import jax
    import numpy as np

    buf = np.random.randint(0, 255, 16 << 20, dtype=np.uint8)
    walls = []
    for _ in range(3):
        t0 = time.perf_counter()
        d = jax.device_put(buf)
        _ = np.asarray(d[:1])  # the only real barrier over the tunnel
        walls.append(time.perf_counter() - t0)
    return (16 << 20) / statistics.median(walls) / 1e6


def main() -> int:
    try:
        os.sync()
    except OSError:
        pass
    ok, n_probes = bench_mod.probe_device()
    if not ok:
        sys.stderr.write(
            f"bench_device: accelerator unreachable after {n_probes} "
            f"probe attempts; NOT writing device numbers\n")
        merge_write({"probe_failed": True,
                     "probe_attempts": n_probes})
        return 1

    os.environ["PANDEPTH_HOST_FINALIZE"] = "0"  # the device engine
    bam = bench_mod.ensure_fixture()

    from pandepth_tpu import boot

    jax = boot.configure_jax()
    dev = jax.devices()[0]
    sys.stderr.write(f"bench_device: platform={dev.platform} "
                     f"kind={dev.device_kind}\n")

    # ---- warm-up + one instrumented run for the finalize numbers ----
    os.environ["PANDEPTH_SEG_DEBUG"] = "2"
    cap = io.StringIO()
    t0 = time.perf_counter()
    with contextlib.redirect_stderr(cap):
        time_device_cli(bam)
    warm0 = time.perf_counter() - t0
    dbg = cap.getvalue()
    sys.stderr.write(dbg)
    os.environ.pop("PANDEPTH_SEG_DEBUG", None)
    m1 = re.search(r"\[seg\].*?pairs=(\d+).*?dispatch=([0-9.]+)s "
                   r"fetch=([0-9.]+)s", dbg)
    m2 = re.search(r"\[seg2\] dispatch=([0-9.]+)s fetch=([0-9.]+)s",
                   dbg)
    fin = {}
    if m1:
        fin["finalize_pairs"] = int(m1.group(1))
        fin["finalize_dispatch_ms"] = round(
            (float(m1.group(2)) + float(m1.group(3))) * 1e3, 1)
    if m2:
        fin["finalize_redispatch_ms"] = round(
            (float(m2.group(1)) + float(m2.group(2))) * 1e3, 1)
    sys.stderr.write(f"bench_device: warm0 {warm0:.2f}s {fin}\n")

    # ---- warm device-engine end-to-end walls ----
    walls = sorted(time_device_cli(bam) for _ in range(N_RUNS))
    wall = statistics.median(walls)
    iqr = (walls[-2] - walls[1]) if N_RUNS >= 4 else walls[-1] - walls[0]

    # ---- gene-mode warm device walls (ranged feed + 168k-segment
    # query batch through the same fused finalize), when the 3 Gb
    # campaign's annotation fixture exists ----
    gene = {}
    gff = os.path.join(bench_mod.BENCH_DIR, "bench3gb_genes.gff")
    gene_bam = os.path.join(bench_mod.BENCH_DIR,
                            "bench3gb_8000000.bam")
    if os.path.exists(gff) and os.path.exists(gene_bam):
        time_device_cli(gene_bam, ["-g", gff])  # warm
        gw = sorted(time_device_cli(gene_bam, ["-g", gff])
                    for _ in range(3))
        gene["device_gene_wall_s"] = round(statistics.median(gw), 3)
        if bench_mod.ensure_reference():
            import subprocess as sp

            t0 = time.perf_counter()
            sp.run([bench_mod.REF_BIN, "-i", gene_bam, "-g", gff,
                    "-o", os.path.join(bench_mod.BENCH_DIR,
                                       "refgeneout")],
                   check=True, capture_output=True)
            rw = time.perf_counter() - t0
            gene["device_gene_ref_wall_s"] = round(rw, 3)
            gene["device_gene_vs_baseline"] = round(
                rw / gene["device_gene_wall_s"], 3)
        sys.stderr.write(f"bench_device: gene {gene}\n")

    # ---- wire throughput ----
    wire = measure_wire_mb_s()

    # ---- reference on the same fixture/host ----
    ref_wall = None
    if bench_mod.ensure_reference():
        refs = sorted(bench_mod.time_reference(bam) for _ in range(3))
        ref_wall = statistics.median(refs)

    res = {
        "platform": "device",
        "device_kind": dev.device_kind,
        "probe_failed": False,
        "n_reads": bench_mod.N_READS,
        "device_e2e_wall_s": round(wall, 3),
        "device_e2e_iqr_s": round(iqr, 3),
        "device_e2e_runs": N_RUNS,
        "device_reads_per_s": round(bench_mod.N_READS / wall, 1),
        "ref_wall_s": round(ref_wall, 3) if ref_wall else None,
        "device_vs_baseline": round(ref_wall / wall, 3)
        if ref_wall else None,
        "wire_mb_s": round(wire, 1),
        **fin,
        **gene,
    }
    merge_write(res)
    sys.stderr.write(f"bench_device: wrote {OUT}\n")
    print(json.dumps(res))
    return 0


if __name__ == "__main__":
    sys.exit(main())
