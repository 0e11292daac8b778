"""Command-line entry points.

Replaces the reference's three executables (CMakeLists.txt:67-69):
`Template_Generator` -> `generate`, `Detector` -> `detect` (+`evaluate`),
`Arcuo_Benchmark` -> `aruco`. Unlike the reference (which has no argument
parsing and hardcodes paths, detector.cpp:7-42), sources and models are flags;
configuration still comes from the same `linemod_settings.yml`.

Usage:
    python -m linemod_tpu.cli generate [--settings F] [--banks DIR]
    python -m linemod_tpu.cli detect --model lagergehaeuse.ply \
        [--images benchmark/img%d.png --depths benchmark/depth%d.png] \
        [--benchmark] [--display OUT_DIR]
    python -m linemod_tpu.cli evaluate --model lagergehaeuse.ply \
        [--images benchmarkLINEMOD/color%d.jpg --depths benchmarkLINEMOD/depth%d.dpt \
         --gt linemod]   # or --gt yml for the reference's pose%d.yml capture format
    python -m linemod_tpu.cli aruco --out board.png
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np


def _load_image_pair(img_tpl: str, depth_tpl: str, i: int):
    import cv2

    img_path = img_tpl % i if "%" in img_tpl else img_tpl
    depth_path = depth_tpl % i if "%" in depth_tpl else depth_tpl
    if not os.path.exists(img_path):
        return None, None
    color = cv2.imread(img_path)
    if depth_path.endswith(".dpt"):
        from .utils.io import load_depth_linemod_dataset

        depth = load_depth_linemod_dataset(depth_path)
    else:
        depth = cv2.imread(depth_path, cv2.IMREAD_ANYDEPTH)
    return color, depth


def _frame_source(images: str, depths: str, start: int = 0):
    """Iterate (color, depth) frames. PNG sequences go through the native
    C++ prefetch loader when its library is available (decode of frame i+1
    overlaps frame i's processing on a background thread,
    native/loader.cpp); anything else falls back to per-frame cv2/raw IO."""
    if (
        start == 0
        and "%" in images
        and images.endswith(".png")
        and depths.endswith(".png")
    ):
        from .utils import native

        if native.available():
            try:
                yield from native.NativeFrameLoader(images, depths)
                return
            except Exception:
                pass  # fall back to cv2 below
    i = start
    while True:
        color, depth = _load_image_pair(images, depths, i)
        if color is None:
            return
        yield color, depth
        i += 1


def cmd_generate(args):
    from .config import load_settings
    from .pipeline.template_generator import TemplateGenerator

    cam, settings = load_settings(args.settings)
    gen = TemplateGenerator(cam, settings, out_dir=args.banks)
    gen.run()
    return 0


def cmd_detect(args):
    from .config import load_model_properties, load_settings
    from .models.template_bank import TemplateBank
    from .ops.icp import IcpRefiner
    from .ops.rasterizer import mesh_to_arrays
    from .pipeline.benchmark import Benchmark, read_ground_truth_pose
    from .pipeline.pose_detection import DetectionDebug, PoseDetection
    from .utils.draw import draw_coordinate_system, draw_features
    from .utils.mesh_io import load_mesh

    cam, settings = load_settings(args.settings)
    model_path = os.path.join(settings.model_folder, args.model)
    bank_path = os.path.join(args.banks, os.path.splitext(args.model)[0] + ".npz")
    if not os.path.exists(bank_path):
        print(f"error: no bank at {bank_path}; run generate first", file=sys.stderr)
        return 2
    bank = TemplateBank.load(bank_path)
    props = load_model_properties(model_path)
    mesh = load_mesh(model_path)
    marr = mesh_to_arrays(mesh)
    icp = (
        IcpRefiner(mesh, cam, settings.icp_subsampling_factor, mesh_arrays=marr)
        if settings.use_icp
        else None
    )
    det = PoseDetection(bank, cam, settings, props, mesh=mesh, icp=icp)
    bench = Benchmark(mesh, cam) if args.benchmark else None
    timer = None
    if args.profile:
        from .utils.profiling import StageTimer

        # sync=False: wall-clock stages; the detect stage already ends with a
        # real device fetch
        timer = StageTimer(sync=False)
    from contextlib import nullcontext

    def stage(name):
        return timer.stage(name) if timer else nullcontext()

    i = -1
    times = []
    for i, (color, depth) in enumerate(_frame_source(args.images, args.depths)):
        t0 = time.time()
        dbg = DetectionDebug() if (args.display or args.show) else None
        with stage("detect"):
            if timer:
                # profiled sub-stages: device submit, the transport fetch,
                # and the host half (grouping + checks + pose math) — the
                # latter is what bounds the frame on a PCIe-class link
                with stage("detect.submit"):
                    handle = det.detect_submit(color, depth)
                with stage("detect.fetch"):
                    handle = (np.asarray(handle[0]), handle[1], handle[2])
                with stage("detect.host_post"):
                    poses = det.detect_collect(
                        handle, args.num_objects, debug=dbg
                    )
            else:
                poses = det.detect(color, depth, args.num_objects, debug=dbg)
        times.append(time.time() - t0)
        msg = f"frame {i}: {len(poses)} pose(s) in {times[-1]*1000:.1f} ms"
        if poses and bench is not None:
            with stage("benchmark"):
                gt = read_ground_truth_pose(
                    os.path.join(os.path.dirname(args.images % 0), f"pose{i}.yml")
                )
                scene = det.recenter(np.ascontiguousarray(depth)).astype(np.float32)
                err = bench.score_vsd(scene, gt, poses[0])
            bench.next_image()
            msg += f"  VSD error: {err:.3f}  ({bench.hodan_score:.0f}% correct)"
        elif bench is not None:
            bench.next_image()
        print(msg)
        if (args.display or args.show) and poses:
            import cv2

            with stage("display"):
                out = color.copy()
                # feature dots of every passing check (drawResponse analogue,
                # src/HighLevelLinemod.cpp:545-566) + pose axes
                for t, _, _, okc, okd, xy in dbg.checks:
                    if okc and okd:
                        draw_features(
                            out, bank.feat0[t], bank.valid0[t], xy
                        )
                for p in poses:
                    draw_coordinate_system(out, cam, 75.0, p)
                if args.display:
                    os.makedirs(args.display, exist_ok=True)
                    cv2.imwrite(os.path.join(args.display, f"det{i}.png"), out)
                if args.show:
                    # the reference's live loop (imshow + waitKey,
                    # src/PoseDetection.cpp:121-122); ESC quits
                    cv2.imshow("linemod_tpu detect", out)
                    if (cv2.waitKey(1) & 0xFF) == 27:
                        break
        if args.max_frames and i + 1 >= args.max_frames:
            break
    if i < 0:
        print("error: no input images", file=sys.stderr)
        return 2
    if times:
        print(
            f"{i + 1} frames, mean {np.mean(times)*1000:.1f} ms "
            f"({1.0/np.mean(times):.2f} fps)"
        )
    if timer:
        print(timer.summary())
    return 0


def cmd_evaluate(args):
    """Dataset evaluation with running pass rates (the reference's
    commented-in LINEMOD-dataset flow, detector.cpp:13,28 +
    src/Benchmark.cpp:40-131,196-251): VSD on every frame, plus ADD —
    or ADD-S when the model is rotationally symmetric / has symmetry
    planes (the ambiguous-pose variant, src/Benchmark.cpp:84-131)."""
    from .config import load_model_properties, load_settings
    from .models.template_bank import TemplateBank
    from .pipeline.benchmark import (
        Benchmark,
        read_ground_truth_linemod,
        read_ground_truth_pose,
    )
    from .pipeline.pose_detection import PoseDetection
    from .utils.mesh_io import load_mesh

    cam, settings = load_settings(args.settings)
    model_path = os.path.join(settings.model_folder, args.model)
    bank_path = os.path.join(args.banks, os.path.splitext(args.model)[0] + ".npz")
    if not os.path.exists(bank_path):
        print(f"error: no bank at {bank_path}; run generate first", file=sys.stderr)
        return 2
    bank = TemplateBank.load(bank_path)
    props = load_model_properties(model_path)
    mesh = load_mesh(model_path)
    det = PoseDetection(bank, cam, settings, props)
    bench = Benchmark(mesh, cam)
    # rot-sym-aware metric selection: symmetric objects are scored with the
    # ambiguous (closest-vertex) variant, like calculateErrorLMAmbigous.
    # A zero entry in planes_of_symmetry means NO symmetry about that plane
    # (prune_by_symmetry keeps everything for zeros), so only nonzero entries
    # select ADD-S.
    use_adds = props.rotationally_symmetrical or any(
        s != 0.0 for s in props.planes_of_symmetry
    )
    if args.diameter is not None:
        diameter = args.diameter
    else:
        from .ops.metrics import OBJECT_DIAMETER

        diameter = OBJECT_DIAMETER

    n = vsd_pass = pose_pass = detected = 0
    i = args.start
    while True:
        color, depth = _load_image_pair(args.images, args.depths, i)
        if color is None:
            break
        if args.gt == "linemod":
            base = os.path.dirname(args.images % 0 if "%" in args.images else args.images)
            gt = read_ground_truth_linemod(
                os.path.join(base, f"tra{i}.tra"), os.path.join(base, f"rot{i}.rot")
            )
        else:
            base = os.path.dirname(args.images % 0 if "%" in args.images else args.images)
            gt = read_ground_truth_pose(os.path.join(base, f"pose{i}.yml"))
        poses = det.detect(color, depth, 1)
        n += 1
        msg = f"frame {i}: "
        if poses:
            detected += 1
            scene = det.recenter(np.ascontiguousarray(depth)).astype(np.float32)
            vsd = bench.score_vsd(scene, gt, poses[0])
            if use_adds:
                err = bench.score_adds(gt, poses[0], diameter)
                metric = "ADD-S"
            else:
                err = bench.score_add(gt, poses[0], diameter)
                metric = "ADD"
            vsd_pass += vsd < 0.3
            pose_pass += err <= diameter
            msg += f"VSD {vsd:.3f}  {metric} {err:.2f} mm"
        else:
            msg += "no detection"
        msg += (
            f"   running: VSD {100.0 * vsd_pass / n:.1f}%"
            f"  {'ADD-S' if use_adds else 'ADD'} {100.0 * pose_pass / n:.1f}%"
            f"  detected {100.0 * detected / n:.1f}%"
        )
        print(msg)
        i += 1
        if args.max_frames and n >= args.max_frames:
            break
    if n == 0:
        print("error: no input images", file=sys.stderr)
        return 2
    print(
        f"== {n} frames: VSD pass {100.0 * vsd_pass / n:.1f}%, "
        f"{'ADD-S' if use_adds else 'ADD'} pass {100.0 * pose_pass / n:.1f}%, "
        f"detection rate {100.0 * detected / n:.1f}%"
    )
    return 0


def cmd_aruco(args):
    from .pipeline.aruco_capture import create_aruco_board

    if args.capture:
        # ground-truth dataset capture (the Arcuo_Benchmark loop,
        # src/Aruco.cpp:36-110): --interactive shows the HUD with TAB-save /
        # ESC; otherwise every board-detected frame is saved headlessly
        from .config import load_settings
        from .pipeline.aruco_capture import (
            capture_ground_truth,
            capture_ground_truth_interactive,
        )

        cam, _ = load_settings(args.settings)
        if args.images == "kinect":
            from .pipeline.sensors import Kinect2Source

            src = Kinect2Source()
        else:
            src = _frame_source(args.images, args.depths)
        if args.interactive:
            n = capture_ground_truth_interactive(src, cam, args.out_dir)
        else:
            n = capture_ground_truth(src, cam, args.out_dir)
        print(f"captured {n} frames to {args.out_dir}")
        return 0
    create_aruco_board(args.out)
    print(f"wrote {args.out}")
    return 0


def _enable_compile_cache():
    """Persist XLA executables across runs (remote TPU compiles take minutes)."""
    try:
        import jax

        cache = os.environ.get("LINEMOD_TPU_JAX_CACHE", "/root/repo/.jax_cache")
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def cmd_convert(args):
    """Bank migration to/from the reference's on-disk pair."""
    from .models.template_bank import TemplateBank
    from .utils.refformat import export_reference_bank

    if bool(args.from_reference) == bool(args.to_reference):
        raise SystemExit("convert: pass exactly one of --from-reference / "
                         "--to-reference")
    if not args.bank:
        raise SystemExit("convert: --bank is required")
    if args.from_reference:
        from .utils.refformat import import_reference_banks

        banks = import_reference_banks(args.from_reference)
        if len(banks) == 1 and not os.path.isdir(args.bank):
            bank = next(iter(banks.values()))
            bank.save(args.bank)
            print(f"imported {bank.num_templates} templates "
                  f"({bank.class_id}) -> {args.bank}")
        else:
            # the reference pair holds every model; --bank is a directory
            os.makedirs(args.bank, exist_ok=True)
            for cid, bank in banks.items():
                stem = os.path.splitext(os.path.basename(cid))[0]
                path = os.path.join(args.bank, stem + ".npz")
                bank.save(path)
                print(f"imported {bank.num_templates} templates "
                      f"({cid}) -> {path}")
    else:
        bank = TemplateBank.load(args.bank)
        yml, binp = export_reference_bank(bank, args.to_reference)
        print(f"exported {bank.num_templates} templates -> {yml}, {binp}")
    return 0


def main(argv=None):
    _enable_compile_cache()
    p = argparse.ArgumentParser(prog="linemod_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("generate", help="build template banks for all models")
    g.add_argument("--settings", default="linemod_settings.yml")
    g.add_argument("--banks", default="banks")
    g.set_defaults(fn=cmd_generate)

    d = sub.add_parser("detect", help="run detection over an image sequence")
    d.add_argument("--settings", default="linemod_settings.yml")
    d.add_argument("--banks", default="banks")
    d.add_argument("--model", required=True)
    d.add_argument("--images", default="benchmark/img%d.png")
    d.add_argument("--depths", default="benchmark/depth%d.png")
    d.add_argument("--num-objects", type=int, default=1)
    d.add_argument("--benchmark", action="store_true")
    d.add_argument("--display", default="", help="directory for overlay images")
    d.add_argument("--show", action="store_true",
                   help="live overlay window (imshow loop, ESC quits); "
                        "requires a GUI-capable OpenCV")
    d.add_argument("--max-frames", type=int, default=0)
    d.add_argument("--profile", action="store_true",
                   help="print a per-stage wall-clock breakdown at the end")
    d.set_defaults(fn=cmd_detect)

    e = sub.add_parser(
        "evaluate", help="score detection over a dataset (VSD + ADD/ADD-S pass rates)"
    )
    e.add_argument("--settings", default="linemod_settings.yml")
    e.add_argument("--banks", default="banks")
    e.add_argument("--model", required=True)
    e.add_argument(
        "--images", default="benchmarkLINEMOD/color%d.jpg",
        help="frame template (reference layout: benchmarkLINEMOD/color%%d.jpg)",
    )
    e.add_argument(
        "--depths", default="benchmarkLINEMOD/depth%d.dpt",
        help=".dpt (LINEMOD raw) or 16-bit png depth template",
    )
    e.add_argument(
        "--gt", choices=["linemod", "yml"], default="linemod",
        help="ground-truth format: tra%%d.tra/rot%%d.rot or pose%%d.yml",
    )
    e.add_argument("--diameter", type=float, default=None,
                   help="ADD correctness diameter (default: reference constant)")
    e.add_argument("--start", type=int, default=0)
    e.add_argument("--max-frames", type=int, default=0)
    e.set_defaults(fn=cmd_evaluate)

    a = sub.add_parser(
        "aruco", help="aruco board image / ground-truth dataset capture"
    )
    a.add_argument("--out", default="aruco_board.png")
    a.add_argument("--capture", action="store_true",
                   help="capture img/depth/pose ground-truth frames")
    a.add_argument("--interactive", action="store_true",
                   help="HUD capture loop (TAB=save, ESC=quit); needs a GUI")
    a.add_argument("--settings", default="linemod_settings.yml")
    a.add_argument("--images", default="capture/img%d.png",
                   help="frame source template, or 'kinect' for live capture")
    a.add_argument("--depths", default="capture/depth%d.png")
    a.add_argument("--out-dir", default="benchmark")
    a.set_defaults(fn=cmd_aruco)

    c = sub.add_parser(
        "convert",
        help="convert banks between this framework's npz format and the "
             "reference's linemod_templates.yml.gz + linemod_tempPosFile.bin "
             "pair (src/HighLevelLinemod.cpp:256-320)",
    )
    c.add_argument("--from-reference", metavar="DIR",
                   help="directory holding the reference pair to import")
    c.add_argument("--to-reference", metavar="DIR",
                   help="directory to export the reference pair into")
    c.add_argument("--bank", help="npz bank path (import target / export source)")
    c.set_defaults(fn=cmd_convert)

    args = p.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
