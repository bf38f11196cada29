"""CLI entry point: run SLAM over a dataset and export results.

Mirrors the reference frontend CLI (main.py:145-335): same flags
(--dataset/--config/--save-as/--calib), same outputs (TUM keyframe
trajectory, PLY reconstruction, keyframe images).

    python -m mast3r_slam_tpu.slam.run --dataset datasets/tum/rgbd_dataset_freiburg1_room \
        --config eval_no_calib --checkpoint checkpoints/MASt3R....pth
"""

from __future__ import annotations

import argparse
import pathlib
import sys

import numpy as np


def build_slam(cfg, dataset, checkpoint=None, retrieval_checkpoint=None,
               codebook=None, seed=0, preset="vit_large"):
    import jax
    import jax.numpy as jnp

    from ..models.interface import MASt3RModel
    from ..models import mast3r as M
    from .pipeline import SLAM

    (h, w), _ = dataset.get_img_shape()
    img_hw = (int(h), int(w))

    import dataclasses
    import jax.numpy as _jnp

    mcfg = M.VIT_LARGE if preset == "vit_large" else M.VIT_TINY_TEST
    trunk_dtype = cfg.get("engine", {}).get("dtype", "bfloat16")
    if preset == "vit_large" and trunk_dtype == "float32":
        mcfg = dataclasses.replace(mcfg, dtype=_jnp.float32)
    head_dtype = cfg.get("engine", {}).get("head_dtype", "float32")
    if head_dtype == "bfloat16":
        mcfg = dataclasses.replace(mcfg, head_dtype=_jnp.bfloat16)
    attn_impl = cfg.get("engine", {}).get("attn_impl", "xla")
    if attn_impl != mcfg.attn_impl:
        mcfg = dataclasses.replace(mcfg, attn_impl=attn_impl)
    from ..models import layers as _layers

    _layers.set_ln_stats(cfg.get("engine", {}).get("ln_stats", "twopass"))
    if checkpoint and str(checkpoint).endswith(".npz"):
        from ..models.io import load_params

        model = MASt3RModel(load_params(checkpoint), mcfg, img_hw)
    elif checkpoint:
        model = MASt3RModel.from_torch_checkpoint(checkpoint, img_hw, mcfg)
    else:
        print("WARNING: no checkpoint; random weights (geometry will be noise)",
              file=sys.stderr)
        model = MASt3RModel.random_init(jax.random.key(seed), img_hw, mcfg)

    retrieval = None
    if retrieval_checkpoint and codebook:
        from ..retrieval import RetrievalDatabase

        retrieval = RetrievalDatabase.from_torch_checkpoint(
            retrieval_checkpoint, codebook
        )

    K = None
    if cfg["use_calib"] and dataset.has_calib():
        K = jnp.asarray(dataset.camera_intrinsics.K_frame, dtype=jnp.float32)

    return SLAM(model, cfg, img_hw, K=K, retrieval=retrieval)


def main(argv=None):
    parser = argparse.ArgumentParser(description="TPU-native MASt3R-class SLAM")
    parser.add_argument("--dataset", required=True)
    parser.add_argument("--config", default="base")
    parser.add_argument("--save-as", default="default")
    parser.add_argument("--calib", default="")
    parser.add_argument("--checkpoint", default="")
    parser.add_argument("--retrieval-checkpoint", default="")
    parser.add_argument("--codebook", default="")
    parser.add_argument("--max-frames", type=int, default=None)
    parser.add_argument("--no-viz", action="store_true", help="compat no-op")
    parser.add_argument("--model-preset", default="vit_large",
                        choices=["vit_large", "tiny"],
                        help="tiny = smoke-test trunk (random weights)")
    parser.add_argument("--profile", action="store_true",
                        help="print per-stage timing report at the end")
    parser.add_argument("--viz-ws", type=int, default=0, metavar="PORT",
                        help="stream live pose/keyframe-pointcloud events on "
                             "ws://127.0.0.1:PORT (open viz/viewer.html?ws=...)")
    parser.add_argument("--trace", default="",
                        help="write a jax.profiler trace (xplane) to this dir")
    parser.add_argument("--platform", default="",
                        help="force jax platform (e.g. cpu); needed because "
                             "TPU-tunnel hosts pre-select a platform at "
                             "interpreter startup")
    parser.add_argument("--set", dest="overrides", action="append", default=[],
                        metavar="DOTTED.KEY=VALUE",
                        help="override a config value (repeatable), e.g. "
                             "--set engine.mesh=8 --set tracking.Q_conf=1.5; "
                             "values parse as YAML scalars")
    args = parser.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from ..config import load_config, merge_config
    from ..data.dataloader import load_dataset
    from ..eval.export import save_keyframes, save_reconstruction

    cfg = load_config(args.config)
    if args.calib:
        cfg = merge_config(cfg, {"use_calib": True})
    for ov in args.overrides:
        key, sep, raw = ov.partition("=")
        if not sep:
            parser.error(f"--set expects DOTTED.KEY=VALUE, got {ov!r}")
        if not raw:
            # 'KEY=' would yaml-parse to None and silently null the key,
            # which downstream cfg.get defaults cannot rescue
            parser.error(f"--set {key}= has an empty value; pass an explicit "
                         f"YAML scalar (use '{key}=null' to null the key)")
        import yaml

        patch = yaml.safe_load(raw)  # same scalar parsing as config files
        for part in reversed(key.split(".")):
            patch = {part: patch}
        cfg = merge_config(cfg, patch)

    dataset = load_dataset(
        args.dataset,
        use_calib=cfg["use_calib"],
        center_pp=cfg["dataset"]["center_principle_point"],
    )
    if args.calib:
        # user-supplied intrinsics file (reference main.py:174-183 +
        # config/intrinsics.yaml format: width/height/calibration list)
        import numpy as np
        import yaml

        from ..data.dataloader import Intrinsics

        with open(args.calib) as f:
            intr = yaml.safe_load(f)
        dataset.use_calibration = True
        dataset.camera_intrinsics = Intrinsics.from_calib(
            dataset.img_size,
            intr["width"],
            intr["height"],
            np.asarray(intr["calibration"], dtype=np.float64),
            center_pp=cfg["dataset"]["center_principle_point"],
        )
    if cfg["use_calib"] and not dataset.has_calib():
        print("[Warning] No calibration provided for this dataset!")
        return None
    if cfg["dataset"]["subsample"] > 1:
        dataset.subsample(cfg["dataset"]["subsample"])
    if getattr(dataset, "img_size", 512) != 512:
        # keep the engine's prefetch resize consistent with the dataset's
        # (non-512 deployments; see SLAM.preprocess)
        cfg.setdefault("engine", {})["resize"] = dataset.img_size

    slam = build_slam(
        cfg,
        dataset,
        checkpoint=args.checkpoint or None,
        retrieval_checkpoint=args.retrieval_checkpoint or None,
        codebook=args.codebook or None,
        preset=args.model_preset,
    )
    broadcaster = None
    if args.viz_ws:
        from ..serve.broadcast import EventBroadcaster

        broadcaster = EventBroadcaster(port=args.viz_ws).start()
        slam.on_event = broadcaster.push
        # viewer->engine backchannel: pause/step/conf-threshold/terminate
        # from the browser UI (reference WindowMsg, visualization.py:33-41)
        slam.control = broadcaster.control
        print(f"live viewer stream: ws://127.0.0.1:{broadcaster.bound_port} "
              f"(open mast3r_slam_tpu/viz/viewer.html?ws=...)")

    if args.trace:
        import jax

        with jax.profiler.trace(args.trace):
            result = slam.run(dataset, max_frames=args.max_frames)
    else:
        result = slam.run(dataset, max_frames=args.max_frames)
    if broadcaster is not None:
        broadcaster.stop()

    save_dir = pathlib.Path("logs")
    if args.save_as != "default":
        save_dir = save_dir / args.save_as
    save_dir.mkdir(parents=True, exist_ok=True)
    seq = pathlib.Path(args.dataset).stem

    if dataset.save_results:
        slam.save_trajectory(save_dir / f"{seq}.txt", result)
        save_reconstruction(
            save_dir / f"{seq}.ply",
            slam.keyframes,
            slam.img_hw,
            # viewer slider feeds the export threshold, as in the reference
            # (main.py:319 passes last_msg.C_conf_threshold)
            conf_threshold=(slam.control.conf_threshold
                            if slam.control is not None else 1.5),
            use_calib=cfg["use_calib"],
        )
        save_keyframes(save_dir / "keyframes" / seq, dataset.timestamps,
                       slam.keyframes)
        from ..viz import export_scene_json, render_topdown

        edges = [
            (int(slam.graph.ii[e]), int(slam.graph.jj[e]))
            for e in range(slam.graph.n_edges)
        ]
        render_topdown(slam.keyframes, save_dir / f"{seq}_map.png", edges=edges)
        export_scene_json(slam, save_dir / f"{seq}_scene.json")
    if args.profile:
        print(slam.timer.report())
    print(
        f"done: {result.n_keyframes} keyframes, {result.fps:.2f} fps, "
        f"{result.n_reloc} reloc frames -> {save_dir}/{seq}.txt"
    )
    return result


if __name__ == "__main__":
    main()
