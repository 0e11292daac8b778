"""Regenerate README.md's performance blocks from the committed artifacts
(VERDICT r4 item 7: docs must be generated from artifacts, not hand-edited
ahead of them).

The README contains marked blocks:

    <!-- AUTO:name -->
    ...generated markdown...
    <!-- /AUTO:name -->

This script rewrites every block from BENCH_r*.json (latest), BANK_SCALE.json,
scaling_results.json, ACCURACY_r05.json and MULTIMODEL_PERF.json.
`--check` regenerates in memory and exits 1 if README.md differs — wired
into the test suite (tests/test_readme_sync.py) so numbers cannot drift.
"""

import glob
import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load(name):
    path = os.path.join(REPO, name)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def latest_bench():
    def key(path):
        m = re.search(r"BENCH_r(\d+)", os.path.basename(path))
        rnd = int(m.group(1)) if m else -1
        # a driver-recorded BENCH_rN beats the builder's BENCH_rN_pre
        return (rnd, 0 if "_pre" in path else 1)

    best = None
    best_key = None
    for path in glob.glob(os.path.join(REPO, "BENCH_r*.json")):
        with open(path) as f:
            d = json.load(f)
        parsed = d.get("parsed", d)
        if parsed and "value" in parsed:
            k = key(path)
            if best_key is None or k > best_key:
                best, best_key = parsed, k
    return best


def block_headline():
    b = latest_bench()
    lines = [
        "| metric | value |",
        "|---|---|",
        f"| streaming detector (median of 10 runs) | **{b['value']:.1f} fps/chip** "
        f"({b['vs_baseline']:.0f}x the CPU baseline of the same pipeline) |",
    ]
    if b.get("disk_to_pose_fps") is not None:
        lines.append(
            f"| disk-to-pose (PNG decode + prefetch + detect) | {b['disk_to_pose_fps']:.1f} fps |"
        )
    if b.get("device_fps") is not None:
        lines.append(
            f"| device-bound fused match program (in-device repeat) | {b['device_fps']:.0f} fps |"
        )
    if b.get("host_post_ms") is not None:
        lines.append(
            f"| host half of a frame (grouping + checks + pose math) | {b['host_post_ms']:.1f} ms |"
        )
    if b.get("icp_fps") is not None:
        lines.append(f"| ICP-on stream (fused per-frame grouped refine+verify) | {b['icp_fps']:.1f} fps |")
    if b.get("dual_fps") is not None:
        lines.append(f"| dual-modality stream (ColorGradient+DepthNormal) | {b['dual_fps']:.1f} fps |")
    if b.get("dual_device_fps") is not None:
        lines.append(f"| dual-modality device-bound rate | {b['dual_device_fps']:.0f} fps |")
    return "\n".join(lines)


def block_scaling():
    sr = _load("scaling_results.json")
    bs = _load("BANK_SCALE.json")
    rows = [
        "| axis | shape | efficiency (measured compute + comm model) |",
        "|---|---|---|",
        "| dp (frames) | any | ~100% (collective-free; each chip runs whole frames) |",
    ]
    cells = ", ".join(
        f"{r['efficiency_pct']:.0f}% @ tp={r['tp']}"
        for r in sr["strong_scaling"]
    )
    rows.append(f"| tp (bank) | {sr['n_templates']:,} templates | {cells} |")
    for c in bs["configs"]:
        if c.get("dual_modality"):
            continue
        cells = ", ".join(
            f"{r['efficiency_pct']:.0f}% @ tp={r['tp']}"
            for r in c["strong_scaling"]
        )
        label = (
            f"{c['n_templates']:,} templates (reference subdiv-{c['subdiv']} regime)"
        )
        rows.append(f"| tp (bank) | {label} | {cells} |")
    return "\n".join(rows)


def block_bigbank():
    bs = _load("BANK_SCALE.json")
    rows = [
        "| shape | generation | bank on disk | match state (HBM) | single-chip match |",
        "|---|---|---|---|---|",
    ]
    for c in bs["configs"]:
        tag = "dual, " if c.get("dual_modality") else ""
        gen = (
            f"{c['generation_seconds']:.0f} s ({c['templates_per_second']:.0f} templates/s)"
            if c.get("generation_seconds")
            else "(cached)"
        )
        rows.append(
            f"| subdiv {c['subdiv']} — **{c['n_templates']:,} templates** ({tag}prefiltered exact cut) | "
            f"{gen} | {c['bank_disk_mb']:.0f} MB | {c['match_state_hbm_mb']:.0f} MB | "
            f"{c['single_chip_ms_per_frame']:.1f} ms/frame ({c['single_chip_fps']:.1f} fps) |"
        )
    return "\n".join(rows)


def block_accuracy():
    acc = _load("ACCURACY_r05.json")
    t = acc["total"]
    n = t["frames"]
    base_modes = {
        k: v for k, v in acc["modes"].items() if not k.endswith("_icp")
    }
    med_t = [
        s["median_t_err_mm"] for s in base_modes.values()
        if s["median_t_err_mm"] is not None
    ]
    med_r = [
        s["median_rot_err_deg"] for s in base_modes.values()
        if s["median_rot_err_deg"] is not None
    ]
    lines = [
        f"`ACCURACY_r05.json` (scripts/accuracy_eval.py) runs the reference's "
        f"running-score protocol over a **{n}-frame synthetic sequence** with "
        f"exact GT rendered by the repo's own rasterizer — between-template "
        f"poses, cluttered backgrounds, the fixture sensor's +40 mm "
        f"shiny-object depth corruption, speckle holes and cube distractors "
        f"(modes: {', '.join(acc['modes'])}):",
        "",
        f"- detection rate **{t['detection_rate_pct']:.1f}%** "
        f"({t['detected']}/{n}); every reported pose passes BOTH reference "
        f"criteria (VSD < 0.3 and ADD-S <= 21 mm) — 100% precision on this set;",
        f"- median translation error {min(med_t):.1f}-{max(med_t):.1f} mm, "
        f"median rotation error {min(med_r):.1f}-{max(med_r):.1f} deg;",
        "- every miss is a no-detection; controlled ablations in the "
        "artifact's diagnostics section isolate the cause to the shipped "
        "bank's ANGULAR sampling density (zeroing the +-5 deg in-plane "
        "jitter — exactly mid-between the 10 deg in-plane steps — recovers "
        "29/30, while a radius-step-25 bank does not), i.e. the known "
        "between-template limit the reference addresses with a smaller "
        "angle step, not a pipeline defect.",
    ]
    ci = acc["modes"].get("clean_icp")
    si = acc["modes"].get("shiny_icp")
    if ci and si:
        import numpy as _np

        base = acc["modes"]["clean"]
        lines.append(
            f"- ICP-on rows (outside the headline totals — the shipped "
            f"config matches the reference default `use icp: 0`): on a "
            f"clean sensor ICP improves the symmetry-aware surface fit "
            f"(median ADD-S {_np.median(base['adds']):.2f} -> "
            f"{_np.median(ci['adds']):.2f} mm, every verified detection "
            f"passes ADD-S) while rotation-vs-GT inflates through the "
            f"part's near-symmetry gauge (ICP's axis rotation is "
            f"unconstrained by the geometry); on the +40 mm shiny sensor "
            f"it registers to the corrupted surface (median t err "
            f"{si['median_t_err_mm']:.0f} mm, VSD pass "
            f"{si['vsd_pass']}/{si['frames']}) — the measured reason the "
            f"reference defaults ICP off for this sensor.",
        )
    return "\n".join(lines)


def block_multimodel():
    mm = _load("MULTIMODEL_PERF.json")
    if mm is None:
        return "(MULTIMODEL_PERF.json not yet generated)"
    rows = [
        "| classes | total templates | sync detect_all | streamed |",
        "|---|---|---|---|",
        f"| 1 | 1,950 | {mm['single_class_detect_fps']:.1f} fps (detect) | "
        "headline above |",
    ]
    for m in mm["multi"]:
        stream = (
            f"{m['detect_all_stream_fps']:.1f} fps"
            if m.get("detect_all_stream_fps") is not None
            else "—"
        )
        rows.append(
            f"| {m['n_classes']} | {m['total_templates']:,} | "
            f"{m['detect_all_fps']:.1f} fps | {stream} |"
        )
    return "\n".join(rows)


BLOCKS = {
    "headline": block_headline,
    "scaling_table": block_scaling,
    "bigbank_table": block_bigbank,
    "accuracy": block_accuracy,
    "multimodel": block_multimodel,
}


def regenerate(text: str) -> str:
    for name, fn in BLOCKS.items():
        pattern = re.compile(
            rf"(<!-- AUTO:{name} -->).*?(<!-- /AUTO:{name} -->)",
            re.DOTALL,
        )
        if not pattern.search(text):
            raise SystemExit(f"README.md missing AUTO block: {name}")
        text = pattern.sub(
            lambda m, _fn=fn: m.group(1) + "\n" + _fn() + "\n" + m.group(2),
            text,
        )
    return text


def main():
    path = os.path.join(REPO, "README.md")
    with open(path) as f:
        text = f.read()
    new = regenerate(text)
    if "--check" in sys.argv:
        if new != text:
            sys.stderr.write(
                "README.md is out of sync with the committed artifacts; "
                "run scripts/gen_readme.py\n"
            )
            sys.exit(1)
        print("README.md in sync with artifacts")
        return
    with open(path, "w") as f:
        f.write(new)
    print("README.md regenerated from artifacts")


if __name__ == "__main__":
    main()
