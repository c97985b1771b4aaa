"""Render every perf number in README.md / COMPONENTS.md from the
committed bench artifacts — the docs can then never drift from the
JSONs (VERDICT r2+r3 both flagged hand-edited perf claims that
contradicted the artifacts).

Mechanism: docs carry value tokens

    <!--v:NAME-->rendered text<!--/v-->

where NAME is a key computed below from BENCH_3GB.json,
BENCH_3GB_cpu.json, SCALING.json and the newest BENCH_r*.json. This
script recomputes each token's text and substitutes it in place
(multi-line values allowed — the whole north-star table is one
token).

Usage:
    python tools/render_docs.py           # rewrite docs in place
    python tools/render_docs.py --check   # exit 1 + diff on mismatch

tests/test_docs_render.py runs --check in the default suite, so a
hand-edited number or a refreshed artifact fails the build until the
docs are re-rendered.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DOCS = ("README.md", "COMPONENTS.md")
TOKEN = re.compile(r"(<!--v:([a-zA-Z0-9_]+)-->)(.*?)(<!--/v-->)",
                   re.DOTALL)


def _load(name):
    try:
        with open(os.path.join(REPO, name)) as fh:
            return json.load(fh)
    except (OSError, ValueError):
        return {}


def _driver_bench_paths():
    """Git-TRACKED BENCH_r*.json paths (basename list). Restricting to
    tracked files keeps the drift gate about the *commit*: the driver
    drops a fresh untracked BENCH_r{N}.json at end-of-round, and that
    must not redden the handed-off tree (advisor r4 / VERDICT r4 #3) —
    it becomes the newest artifact only once a human/round commits it.
    Falls back to a filesystem glob outside a git checkout."""
    import subprocess

    try:
        out = subprocess.run(
            ["git", "-C", REPO, "ls-files", "BENCH_r*.json"],
            capture_output=True, text=True, timeout=30)
        if out.returncode == 0:
            return [ln for ln in out.stdout.splitlines() if ln.strip()]
    except Exception:
        pass
    return [os.path.basename(p)
            for p in glob.glob(os.path.join(REPO, "BENCH_r*.json"))]


def _latest_driver_bench():
    """Newest tracked BENCH_r{N}.json (the driver's end-of-round
    capture, once committed)."""
    best, best_n = {}, -1
    for p in _driver_bench_paths():
        m = re.search(r"BENCH_r(\d+)\.json$", p)
        if not m:
            continue
        n = int(m.group(1))
        if n > best_n:
            best_n = n
            best = _load(os.path.basename(p))
    return best.get("parsed", {}), best_n


def _x(v) -> str:
    return f"{v:.1f}x" if v is not None else "n/a"


def _s(v) -> str:
    if v is None:
        return "n/a"
    return f"{v:.2f} s" if v < 10 else f"{v:.0f} s"


def _mb(v) -> str:
    if v is None:
        return "—"
    return f"{v / 1024:.1f} GB" if v >= 1000 else f"{v:.0f} MB"


def build_values() -> dict:
    b3 = _load("BENCH_3GB.json")
    bc = _load("BENCH_3GB_cpu.json")
    sc = _load("SCALING.json")
    bd = _load("BENCH_DEVICE.json")
    bm = _load("BENCH_MICRO.json")
    drv, drv_round = _latest_driver_bench()
    v = {}

    # ---- device-path + micro numbers (real-chip artifacts) ----
    wire = bd.get("wire_mb_s")
    ns_host = bm.get("host_sweep_ns_per_pair")
    # encoded wire format is ~2 B/pair -> per-pair wire cost
    ns_wire = (2.0 / (wire * 1e6) * 1e9) if wire else None
    v["wirecost1"] = (
        f"ships ~2 B/event at {wire:.0f} MB/s measured "
        f"(~{ns_wire:.0f} ns/pair) where the native host"
        if wire else "ships ~2 B/event over a thin link where the "
        "native host")
    v["hostsweep_ns"] = (f"~{ns_host:.0f} ns" if ns_host else
                         "a few ns")
    v["wirecost2"] = (
        f"(~2 B/event at {wire:.0f} MB/s measured ≈ {ns_wire:.0f} "
        f"ns/pair vs ~{ns_host:.0f} ns/pair on host; "
        f"BENCH_DEVICE/BENCH_MICRO)"
        if wire and ns_host else "(wire cost vs host-sweep cost)")
    v["tunnelmb"] = (f"~{wire:.0f} MB/s measured" if wire
                     else "tens of MB/s")
    if bd.get("finalize_redispatch_ms"):
        v["devwarm"] = (
            f"({bd['finalize_redispatch_ms']:.0f} ms steady-state "
            f"re-dispatch for "
            f"{bd.get('finalize_pairs', 0) / 1e6:.1f}M encoded pairs "
            f"on the {bd.get('device_kind', 'TPU')} through the "
            f"tunnel — BENCH_DEVICE.json)")
    else:
        v["devwarm"] = "(see BENCH_DEVICE.json once captured)"
    if bm.get("fasta_scan_mb_s"):
        v["fastascan"] = (f"native scanner "
                          f"{bm['fasta_scan_mb_s'] / 1e3:.1f} GB/s "
                          f"warm-cache")
    else:
        v["fastascan"] = "native scanner"
    if bm.get("paf_lines_per_s"):
        v["paftok"] = f"~{bm['paf_lines_per_s'] / 1e6:.1f}M lines/s"
    else:
        v["paftok"] = "millions of lines/s"
    if bm.get("host_sweep_wall_s"):
        v["hostsweep"] = (
            f"{bm['host_sweep_pairs'] / 1e6:.0f}M pairs in "
            f"{bm['host_sweep_wall_s']:.2f} s "
            f"({bm['host_sweep_ns_per_pair']:.0f} ns/pair) on this "
            f"4-core host")
    else:
        v["hostsweep"] = "16M events in well under a second"
    if bd.get("device_vs_baseline"):
        v["c_devx"] = (
            f"device engine separately {bd['device_vs_baseline']:.1f}x "
            f"on the real chip (BENCH_DEVICE.json: platform=device, "
            f"{bd.get('device_kind', 'TPU')})")
        v["bench_device_par"] = (
            f"`bench_device.py` (the device-path artifact "
            f"`BENCH_DEVICE.json`, captured on the real "
            f"{bd.get('device_kind', 'TPU')}): warm device engine "
            f"end-to-end {bd['device_e2e_wall_s']:.2f} s on the "
            f"{bd.get('n_reads', 0) // 1_000_000}M-read 3 Gb fixture "
            f"({bd['device_reads_per_s'] / 1e6:.1f}M reads/s, "
            f"**{bd['device_vs_baseline']:.2f}x** the reference's "
            f"{bd['ref_wall_s']:.1f} s), host→device wire "
            f"{wire:.1f} MB/s through the tunnel, fused finalize "
            f"re-dispatch {bd.get('finalize_redispatch_ms', 0):.0f} ms "
            f"for {bd.get('finalize_pairs', 0) / 1e6:.1f}M encoded "
            f"pairs."
            + (f" Gene mode (ranged feed + 168k-segment query batch): "
               f"{bd['device_gene_wall_s']:.2f} s, "
               f"**{bd.get('device_gene_vs_baseline', 0):.1f}x** the "
               f"reference." if bd.get("device_gene_wall_s") else ""))
    else:
        v["c_devx"] = ("device engine pending a real-chip capture "
                       "(bench_device.py)")
        v["bench_device_par"] = ("`bench_device.py`: no device "
                                 "artifact yet.")

    # ---- README: the 3 Gb north-star table ----
    rows = [
        ("chr", "chr"), ("gene (`-g`, 175k CDS)", "gene"),
        ("bed (`-b`, 175k rows)", "bed"), ("win (`-w 500000`)", "win"),
        ("`-w 100` (~30M windows)", "w100"),
        ("`-a` site dump (3 Gb of rows)", "sitedump"),
        ("multi-sample `.list` (3 files)", "list"),
        ("gene + GC (`-c -r`, 3 Gb fasta)", "gc"),
        ("CRAM + GC (2M reads)", "cramgc"),
        ("PAF (8M records)", "paf"),
        ("deep coverage (240M reads, 30x)", "deep"),
        ("15 Gb genome (int64 tier, 8M reads)", "big"),
    ]
    lines = ["| config | ours | reference | speedup | RSS ours / ref |",
             "|---|---|---|---|---|"]
    for label, key in rows:
        ow = b3.get(f"ours_{key}_wall_s")
        if ow is None:
            continue
        rw = b3.get(f"ref_{key}_wall_s")
        vs = b3.get(f"vs_baseline_{key}")
        orss = b3.get(f"ours_{key}_rss_mb")
        rrss = b3.get(f"ref_{key}_rss_mb")
        ref_cell = _s(rw) if rw is not None else (
            f"> {_s(vs * ow)} (timeout)" if vs else "—")
        vs_cell = (f"**{_x(vs)}**" if rw is not None
                   else f"**> {_x(vs)}**") if vs else "—"
        lines.append(f"| {label} | {_s(ow)} | {ref_cell} | {vs_cell} "
                     f"| {_mb(orss)} / {_mb(rrss)} |")
    v["perf3gb_table"] = "\n".join(lines)

    # ---- README: the driver-bench paragraph ----
    if drv:
        n_reads = drv.get("n_reads", 4_000_000)
        mr = drv.get("value", 0) / 1e6
        vs = drv.get("vs_baseline")
        dev = drv.get("device_engine_reads_per_s")
        dev_vs = drv.get("device_engine_vs_baseline")
        sp = drv.get("spread") or {}
        spread = sp.get("ours_iqr_s", sp.get("ours_s"))
        wall = n_reads / drv["value"] if drv.get("value") else None
        noise = (f"{100 * spread / wall:.0f}% spread"
                 if spread is not None and wall else "spread recorded")
        dev_part = (f"; the device engine measured separately at "
                    f"{dev / 1e6:.1f}M reads/s"
                    + (f" ({dev_vs:.1f}x)" if dev_vs else "")
                    if dev else "")
        plat = drv.get("platform", "device")
        plat_part = ("" if plat == "device" else
                     f" [capture platform: {plat} — see "
                     f"BENCH_DEVICE.json for the real-chip device "
                     f"numbers]")
        est = drv.get("estimator", "median5-vs-median3")
        v["bench_driver_par"] = (
            f"`bench.py` (the driver metric, {n_reads // 1_000_000}M-"
            f"read fixture; artifact `BENCH_r{drv_round:02d}.json`): "
            f"{mr:.1f}M aligned reads/s, **{vs:.2f}x** the reference "
            f"wall on the same host ({est}, "
            f"{noise}){dev_part}{plat_part}.")
    else:
        v["bench_driver_par"] = "`bench.py`: no driver artifact yet."

    # ---- README: 10x scale check (opt-in bench3gb section) ----
    if b3.get("ours_scale10x_wall_s"):
        ow = b3["ours_scale10x_wall_s"]
        rw = b3.get("ref_scale10x_wall_s")
        n = b3.get("scale10x_reads", 80_000_000)
        par = b3.get("parity_scale10x")
        deep_part = ""
        if b3.get("ours_deep_wall_s"):
            nd = b3.get("deep_reads", 240_000_000)
            dpar = b3.get("parity_deep")
            deep_part = (
                f" At {nd // 1_000_000}M reads x "
                f"{b3.get('deep_read_len', 375)} bp (~30x coverage, "
                f"the deep row): {_s(b3['ours_deep_wall_s'])} vs the "
                f"reference's {_s(b3.get('ref_deep_wall_s'))} "
                f"(**{_x(b3.get('vs_baseline_deep'))}**"
                f"{', byte parity' if dpar else ''}), RSS "
                f"{_mb(b3.get('ours_deep_rss_mb'))} vs "
                f"{_mb(b3.get('ref_deep_rss_mb'))}.")
            if b3.get("ours_deepsite_wall_s"):
                deep_part += (
                    f" The deep `-a` site dump runs per-contig "
                    f"BAI-ranged passes (`run._run_site_split`, "
                    f"memory O(max contig events)): "
                    f"{_s(b3['ours_deepsite_wall_s'])} vs "
                    f"{_s(b3.get('ref_deepsite_wall_s'))} "
                    f"(**{_x(b3.get('vs_baseline_deepsite'))}**"
                    f"{', parity' if b3.get('parity_deepsite') else ''}"
                    f"), RSS {_mb(b3.get('ours_deepsite_rss_mb'))} vs "
                    f"{_mb(b3.get('ref_deepsite_rss_mb'))}.")
        v["scale10x_par"] = (
            f"Scale checks at depth: {n // 1_000_000}M reads over the "
            f"same 3 Gb genome run {_s(ow)} vs the reference's "
            f"{_s(rw)} (**{_x(b3.get('vs_baseline_scale10x'))}**"
            f"{', byte parity' if par else ''}, "
            f"{n / ow / 1e6:.1f}M reads/s), RSS "
            f"{_mb(b3.get('ours_scale10x_rss_mb'))} vs the "
            f"reference's flat {_mb(b3.get('ref_scale10x_rss_mb'))}."
            f"{deep_part} One-shot RSS is BOUNDED at any read count: "
            f"a coordinate-sorted feed folds staged events at the "
            f"stream frontier into running prefix integrals "
            f"(`HostCoverageEngine.begin_streaming_fold`, the "
            f"sweep-engine analog of the reference's 10 Mb windowed "
            f"scan), so deep coverage costs O(fold window + "
            f"boundaries) memory, not O(events).")
    else:
        v["scale10x_par"] = ("(10x scale check pending: run "
                             "`PANDEPTH_BENCH3GB_SCALE10X=1 python "
                             "bench3gb.py` to record it.)")

    # ---- README bullets ----
    v["daemon_nums"] = (
        f"daemon chr {_x(b3.get('vs_baseline_chr_daemon'))} / gene "
        f"{_x(b3.get('vs_baseline_gene_daemon'))} in BENCH_3GB.json")
    v["cpu_nums"] = (
        f"chr {_x(bc.get('vs_baseline_chr'))}, gene "
        f"{_x(bc.get('vs_baseline_gene'))}, bed "
        f"{_x(bc.get('vs_baseline_bed'))}, win "
        f"{_x(bc.get('vs_baseline_win'))}")

    # ---- README: weak-scaling numbers ----
    ws = {int(r["devices"]): r["efficiency"]
          for r in sc.get("weak_scaling", [])}
    if ws:
        v["scaling_nums"] = (
            ", ".join(f"{ws[d]:.2f} efficiency at {d}"
                      for d in sorted(ws) if d > 1))
    else:
        v["scaling_nums"] = "no scaling artifact yet"

    # ---- COMPONENTS cells ----
    v["c_cramgc"] = _x(b3.get("vs_baseline_cramgc"))
    if drv:
        v["c_driver"] = (f"vs_baseline {drv.get('vs_baseline')}, "
                         f"{drv.get('value', 0) / 1e6:.1f}M reads/s")
    else:
        v["c_driver"] = "no driver artifact yet"
    v["c_b3row"] = (
        f"chr {_x(b3.get('vs_baseline_chr'))}, gene "
        f"{_x(b3.get('vs_baseline_gene'))}, bed "
        f"{_x(b3.get('vs_baseline_bed'))}, win "
        f"{_x(b3.get('vs_baseline_win'))}, w100 "
        f"{_x(b3.get('vs_baseline_w100'))}, GC "
        f"{_x(b3.get('vs_baseline_gc'))}, CRAM+GC "
        f"{_x(b3.get('vs_baseline_cramgc'))}, PAF "
        f"{_x(b3.get('vs_baseline_paf'))}")
    v["c_genebed"] = (f"gene **{_x(b3.get('vs_baseline_gene'))}**, bed "
                      f"**{_x(b3.get('vs_baseline_bed'))}** (chr "
                      f"{_x(b3.get('vs_baseline_chr'))}, win "
                      f"{_x(b3.get('vs_baseline_win'))})")
    v["c_daemongap"] = (
        f"cold runs no longer need the daemon to be fast (host engine "
        f"chr {_s(b3.get('ours_chr_wall_s'))} vs daemon "
        f"{_s(b3.get('ours_chr_daemon_wall_s'))})")
    rng = b3.get("ref_w100_wall_range_s")
    ref_w100 = (f"{rng[0]:.0f}-{rng[1]:.0f} s" if rng
                else _s(b3.get("ref_w100_wall_s")))
    v["c_w100"] = (
        f"ours {_s(b3.get('ours_w100_wall_s'))} / "
        f"{_mb(b3.get('ours_w100_rss_mb'))} vs ref {ref_w100} / "
        f"{_mb(b3.get('ref_w100_rss_mb'))} "
        f"(≥{b3.get('vs_baseline_w100', 0):.0f}x vs its fastest "
        f"observed wall, parity {b3.get('parity_w100')})")
    v["c_sitedump"] = (
        f"{_x(b3.get('vs_baseline_sitedump'))} "
        f"({_s(b3.get('ours_sitedump_wall_s'))} vs "
        f"{_s(b3.get('ref_sitedump_wall_s'))}), RSS "
        f"{_mb(b3.get('ours_sitedump_rss_mb'))} vs "
        f"{_mb(b3.get('ref_sitedump_rss_mb'))}, parity "
        f"{b3.get('parity_sitedump')}")
    v["c_list"] = (
        f"{_x(b3.get('vs_baseline_list'))} "
        f"({_s(b3.get('ours_list_wall_s'))} vs "
        f"{_s(b3.get('ref_list_wall_s'))}), RSS "
        f"{_mb(b3.get('ours_list_rss_mb'))} vs "
        f"{_mb(b3.get('ref_list_rss_mb'))}, parity "
        f"{b3.get('parity_list')}")
    v["c_scale10x"] = (
        f"{_x(b3.get('vs_baseline_scale10x'))} at "
        f"{b3.get('scale10x_reads', 0) // 1_000_000}M reads "
        f"({_s(b3.get('ours_scale10x_wall_s'))} vs "
        f"{_s(b3.get('ref_scale10x_wall_s'))}), parity "
        f"{b3.get('parity_scale10x')}")
    if b3.get("ours_deep_wall_s"):
        v["c_deep"] = (
            f"{_x(b3.get('vs_baseline_deep'))} at "
            f"{b3.get('deep_reads', 0) // 1_000_000}M reads / ~30x "
            f"({_s(b3.get('ours_deep_wall_s'))} vs "
            f"{_s(b3.get('ref_deep_wall_s'))}), RSS "
            f"{_mb(b3.get('ours_deep_rss_mb'))} vs "
            f"{_mb(b3.get('ref_deep_rss_mb'))} (bounded fold), parity "
            f"{b3.get('parity_deep')}")
    else:
        v["c_deep"] = ("pending: PANDEPTH_BENCH3GB_DEEP=1 python "
                       "bench3gb.py")
    if b3.get("ours_deepsite_wall_s"):
        v["c_deepsite"] = (
            f"{_x(b3.get('vs_baseline_deepsite'))} "
            f"({_s(b3.get('ours_deepsite_wall_s'))} vs "
            f"{_s(b3.get('ref_deepsite_wall_s'))}), RSS "
            f"{_mb(b3.get('ours_deepsite_rss_mb'))} vs "
            f"{_mb(b3.get('ref_deepsite_rss_mb'))}, parity "
            f"{b3.get('parity_deepsite')}")
    else:
        v["c_deepsite"] = ("pending: PANDEPTH_BENCH3GB_DEEPSITE=1 "
                           "python bench3gb.py")
    if b3.get("ours_deepgene_wall_s"):
        v["c_deepgene"] = (
            f"{_x(b3.get('vs_baseline_deepgene'))} "
            f"({_s(b3.get('ours_deepgene_wall_s'))} vs "
            f"{_s(b3.get('ref_deepgene_wall_s'))}, parity "
            f"{b3.get('parity_deepgene')}) — the one deep config the "
            f"reference wins warm: both tools decode every block (the "
            f"gene set touches ~every BGZF block at 30x), and its "
            f"per-record iterate is lighter than our event walk while "
            f"its per-BASE counting advantage vanishes in gene mode; "
            f"honest data point, not hidden")
    else:
        v["c_deepgene"] = ("pending: PANDEPTH_BENCH3GB_DEEPGENE=1 "
                           "python bench3gb.py")
    if b3.get("ours_deeplist_wall_s"):
        v["c_deeplist"] = (
            f"{_x(b3.get('vs_baseline_deeplist'))} at "
            f"{b3.get('deeplist_reads', 0) // 1_000_000}M pooled "
            f"reads ({_s(b3.get('ours_deeplist_wall_s'))} vs "
            f"{_s(b3.get('ref_deeplist_wall_s'))}), RSS "
            f"{_mb(b3.get('ours_deeplist_rss_mb'))} vs "
            f"{_mb(b3.get('ref_deeplist_rss_mb'))}, parity "
            f"{b3.get('parity_deeplist')}")
    else:
        v["c_deeplist"] = ("pending: PANDEPTH_BENCH3GB_DEEPLIST=1 "
                           "python bench3gb.py")
    if b3.get("ours_big_wall_s"):
        v["c_big"] = (
            f"{_x(b3.get('vs_baseline_big'))} on a "
            f"{b3.get('big_genome_gb', 15)} Gb genome "
            f"({_s(b3.get('ours_big_wall_s'))} vs "
            f"{_s(b3.get('ref_big_wall_s'))}), RSS "
            f"{_mb(b3.get('ours_big_rss_mb'))} vs "
            f"{_mb(b3.get('ref_big_rss_mb'))}, parity "
            f"{b3.get('parity_big')}")
    else:
        v["c_big"] = ("pending: PANDEPTH_BENCH3GB_BIG=1 python "
                      "bench3gb.py")
    v["c_daemonrows"] = (
        f"daemon chr {_s(b3.get('ours_chr_daemon_wall_s'))} "
        f"({_x(b3.get('vs_baseline_chr_daemon'))}) / gene "
        f"{_s(b3.get('ours_gene_daemon_wall_s'))} "
        f"({_x(b3.get('vs_baseline_gene_daemon'))}) — faster than the "
        f"cold host rows")
    if ws:
        v["c_scalephase"] = (
            f"efficiency {', '.join(f'{ws[d]:.2f}@{d}' for d in sorted(ws) if d > 1)} "
            f"with per-phase attribution (extract / exchange / "
            f"sweep_eval ms per device count)")
    else:
        v["c_scalephase"] = "no scaling artifact yet"
    return v


def render(text: str, values: dict, path: str) -> str:
    def sub(m):
        name = m.group(2)
        if name not in values:
            raise SystemExit(f"{path}: unknown doc token v:{name}")
        return m.group(1) + values[name] + m.group(4)

    return TOKEN.sub(sub, text)


def main(argv) -> int:
    check = "--check" in argv
    values = build_values()
    rc = 0
    for doc in DOCS:
        p = os.path.join(REPO, doc)
        with open(p) as fh:
            old = fh.read()
        new = render(old, values, doc)
        if new == old:
            continue
        if check:
            rc = 1
            import difflib

            sys.stderr.write(f"--- {doc} is stale vs artifacts ---\n")
            sys.stderr.writelines(difflib.unified_diff(
                old.splitlines(True), new.splitlines(True),
                f"{doc} (committed)", f"{doc} (rendered)", n=0))
        else:
            with open(p, "w") as fh:
                fh.write(new)
            print(f"rendered {doc}")
    if check and rc:
        sys.stderr.write(
            "\ndocs drifted from bench artifacts; run "
            "`python tools/render_docs.py` to refresh\n")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
