"""Main attack driver — CLI analog of ``attack_main2.py __main__``
(`:842-1151`) and ``interpolation.py __main__`` (`:1094-1494`).

Runs end-to-end with NO external checkpoints or datasets: absent a
``--images_dir`` it synthesises the fusion inputs from the generator
(the reference's ``--use_generate_img`` path, `attack_main2.py:1001-1002`)
and absent a ``--target_image`` it synthesises an out-of-domain target from a
fixed seed (standing in for ``vase1.png``, `attack_main2.py:916`).

Example (tiny models, CPU):
    python -m tpufusion.cli.attack_run --dataset ffhq --size 32 --tiny \
        --attacks dp_noise pgd --save_dir runs
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="tpufusion attack driver")
    p.add_argument("--config", default=None,
                   help="JSON preset from configs/ (CLI flags that are "
                        "explicitly set override preset values)")
    p.add_argument("--dataset", default="ffhq", choices=["ffhq", "car", "church"])
    p.add_argument("--attacks", nargs="*", default=["dp_noise"],
                   help="attack names (see tpufusion.configs.ATTACK_CHOICES)")
    p.add_argument("--images_dir", default=None)
    p.add_argument("--align", action="store_true",
                   help="FFHQ-align raw images before encoding (default "
                        "provider: the packaged trained LandmarkNet; "
                        "override with --landmark_net or --dlib_predictor)")
    p.add_argument("--landmark_net", default=None,
                   help="trained LandmarkNet weights (.npz) for --align "
                        "(default: the packaged models/weights net)")
    p.add_argument("--dlib_predictor", default=None,
                   help="dlib shape-predictor .dat for --align (if dlib is "
                        "installed)")
    p.add_argument("--target_image", default=None)
    p.add_argument("--save_dir", default="runs")
    p.add_argument("--size", type=int, default=None, help="generator size override")
    p.add_argument("--tiny", action="store_true", help="tiny test-scale models")
    p.add_argument("--seed", type=int, default=123456789)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--n_iters", type=int, default=None)
    p.add_argument("--which_adv", type=int, nargs="*", default=[])
    p.add_argument("--whitebox_stepwise", action="store_true",
                   help="alias for --whitebox_execution stepwise")
    p.add_argument("--whitebox_execution", default="auto",
                   choices=["auto", "scan", "stepwise"],
                   help="white-box executor: auto = stepwise when snapshots "
                        "are active (streamed frames, bounded device memory) "
                        "else scan; explicit scan/stepwise is always "
                        "honoured (scan + snapshots stacks frames on device)")
    p.add_argument("--whitebox_grad_accum", type=int, default=1,
                   help="sequential microbatch chunks per white-box "
                        "iteration: >1 bounds activation memory to "
                        "batch/accum per step so effective batches beyond "
                        "the single-chip ceiling run without OOM "
                        "(stepwise executor)")
    p.add_argument("--whitebox_preset", default="attack_main",
                   choices=["attack_main", "interpolation"],
                   help="white-box loss preset: attack_main2.py:649 or "
                        "interpolation.py:818")
    p.add_argument("--max_count", type=int, default=50)
    p.add_argument("--epochs", type=int, default=1,
                   help="patch-training epochs over the train set")
    p.add_argument("--patch_type", default="square", choices=["square", "circle"])
    p.add_argument("--patch_size", type=float, default=0.1)
    p.add_argument("--patch_npz", default=None,
                   help="precomputed patch.npz (patch+mask) — reuse instead "
                        "of retraining (the reference's regenerate=0 path, "
                        "adversarial_patch.py:211-213)")
    p.add_argument("--paste_times", type=int, default=3)
    p.add_argument("--scale", type=float, default=0.4)
    p.add_argument("--pgd_steps", type=int, default=100,
                   help="PGD iteration budget (reference recipe: 100, `interpolation.py:1343`)")
    p.add_argument("--train_size", type=int, default=2000)
    p.add_argument("--test_size", type=int, default=1000)
    p.add_argument("--max_num_fusion", type=int, default=1,
                   help="number of independent fusion groups to evaluate "
                        "(interpolation.py:1265 batch loop)")
    p.add_argument("--hybrid_adv", action="store_true")
    p.add_argument("--transfer_chain", action="store_true",
                   help="run the classifier-transfer chain: attack the "
                        "surrogate classifier, persist crops, reload via "
                        "adv_generate, fuse (interpolation.py:1331-1394)")
    p.add_argument("--hybrid_from_dirs", nargs="*", default=None,
                   help="existing attack run dirs (under save_dir/dataset) to "
                        "splice a hybrid batch from (--hybrid_adv_from_existing)")
    p.add_argument("--inputs_path", default=None,
                   help="reuse saved fusion inputs: all_inputs.npz artifact or "
                        "montage image (use_existing_data)")
    p.add_argument("--adv_inputs_path", default=None,
                   help="precomputed adversarial inputs for adv_generate")
    p.add_argument("--stylegan_ckpt", default=None)
    p.add_argument("--e4e_ckpt", default=None)
    p.add_argument("--vgg_ckpt", default=None)
    p.add_argument("--fusion_weights", default=None)
    p.add_argument("--discriminator_ckpt", default=None,
                   help="stylegan2-ada pkl with D for realism scoring "
                        "(attack_main2.py:934-938)")
    p.add_argument("--mesh", default=None, metavar="SPEC",
                   help="run on a device mesh: 'data=N[,model=M]' (or just "
                        "'N' for pure DP). Routes white_box_*, "
                        "patch_white_box, pgd/fgsm/pgd_classifier and "
                        "cw/cw_classifier through their data-parallel steps, "
                        "fusion_pgd_* with --max_num_fusion>1 through the "
                        "group-parallel attack + group-parallel evaluation, "
                        "and TP-shards the generator when model>1. Test "
                        "multi-device on one host with "
                        "XLA_FLAGS=--xla_force_host_platform_device_count=N "
                        "JAX_PLATFORMS=cpu")
    p.add_argument("--no_save_img", action="store_true")
    p.add_argument("--snapshot_every", type=int, default=5,
                   help="white-box image snapshot cadence in iters "
                        "(0 disables; reference save_img cadence is 5)")
    p.add_argument("--flush_every", type=int, default=5,
                   help="artifact npz flush cadence in batches "
                        "(reference flushes every 5)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="wrap the experiment loop in a jax profiler trace "
                        "written to DIR (view with tensorboard/xprof)")
    return p


def _parse_mesh_spec(spec: str) -> dict:
    """'data=4,model=2' | 'data=8' | '8' -> {'data': ..., 'model': ...}."""
    out = {"model": 1}
    for part in spec.split(","):
        k, _, v = part.partition("=")
        if not v:
            k, v = "data", k
        if k not in ("data", "model"):
            raise SystemExit(f"--mesh: unknown axis {k!r} (use data/model)")
        try:
            out[k] = int(v)
        except ValueError:
            raise SystemExit(f"--mesh: bad axis size {v!r} in {spec!r}")
    return out


def _explicit_dests(parser: argparse.ArgumentParser, argv) -> set:
    """Dests of flags literally present on the command line.

    Preset merging must know which flags the user actually typed — comparing
    parsed values against parser defaults mistakes an explicit
    ``--dataset ffhq`` for "unset" (ADVICE r2).  Handles ``--flag=value``
    and argparse's unambiguous prefix abbreviations.
    """
    argv = list(sys.argv[1:] if argv is None else argv)
    # Sentinel-default re-parse (ADVICE r3): temporarily swap every action's
    # default for a unique sentinel and let argparse itself decide which
    # dests the command line set — this inherits argparse's exact handling
    # of the '--' separator, prefix abbreviation, and '--flag=value'.
    sentinel = object()
    saved = [(a, a.default) for a in parser._actions]
    try:
        for a, _ in saved:
            a.default = sentinel
        ns, _ = parser.parse_known_args(argv)
    finally:
        for a, d in saved:
            a.default = d
    return {d for d, v in vars(ns).items() if v is not sentinel}


def main(argv=None) -> int:
    parser = build_parser()
    args = parser.parse_args(argv)
    explicit = _explicit_dests(parser, argv)

    from tpufusion.configs import ATTACK_CHOICES

    unknown = [a for a in (args.attacks or []) if a not in ATTACK_CHOICES]
    if unknown:
        raise SystemExit(
            f"unknown attack(s) {unknown}; choices: {', '.join(ATTACK_CHOICES)}")

    import jax
    import jax.numpy as jnp

    from tpufusion.configs import AttackRunConfig, PathsConfig
    from tpufusion.core.prng import seed_everything
    from tpufusion.data import ImageFolderDataset, setup_loaders, transform_for
    from tpufusion.io import load_image
    from tpufusion.pipeline import FusionPipeline, create_test_pipeline
    from tpufusion.runner import generate_inputs, run_experiment

    if args.config:
        from tpufusion.configs import load_config

        cfg = load_config(args.config)
        # CLI flags the user explicitly TYPED override the preset — detected
        # from argv, so a flag explicitly set to its parser default (e.g.
        # ``--dataset ffhq`` against a church preset) still wins (ADVICE r2)
        for cli_key, cfg_key in [
            ("dataset", "dataset_name"), ("lr", "lr"), ("n_iters", "n_iters"),
            ("max_count", "max_count"), ("patch_type", "patch_type"),
            ("patch_size", "patch_size"), ("paste_times", "paste_times"),
            ("scale", "scale"), ("pgd_steps", "pgd_steps"),
            ("train_size", "train_size"), ("test_size", "test_size"),
            ("size", "image_size"), ("epochs", "epochs"),
            ("patch_npz", "patch_npz"), ("max_num_fusion", "max_num_fusion"),
            ("which_adv", "which_adv"), ("seed", "seed"),
            ("whitebox_preset", "whitebox_preset"),
            ("whitebox_grad_accum", "whitebox_grad_accum"),
            ("snapshot_every", "snapshot_every"),
            ("flush_every", "flush_every"),
        ]:
            if cli_key in explicit:
                setattr(cfg, cfg_key, getattr(args, cli_key))
        if "attacks" in explicit:
            cfg.attacks = tuple(args.attacks)
        if args.patch_npz:
            cfg.regenerate = False
        if args.whitebox_stepwise:
            cfg.whitebox_execution = "stepwise"
        elif "whitebox_execution" in explicit:
            cfg.whitebox_execution = args.whitebox_execution
        if args.hybrid_adv:
            cfg.hybrid_adv = True
        if args.align:
            cfg.align = True
        if args.no_save_img:
            cfg.save_img = False
        if args.inputs_path:
            cfg.use_existing_data = True
        for cli_key, path_key in [
            ("images_dir", "images_dir"), ("save_dir", "save_dir"),
            ("stylegan_ckpt", "stylegan_ckpt"), ("e4e_ckpt", "e4e_ckpt"),
            ("vgg_ckpt", "vgg_ckpt"), ("fusion_weights", "fusion_weights"),
            ("target_image", "target_image"),
            ("adv_inputs_path", "adv_inputs_path"),
            ("discriminator_ckpt", "discriminator_ckpt"),
        ]:
            if cli_key in explicit and getattr(args, cli_key) is not None:
                setattr(cfg.paths, path_key, getattr(args, cli_key))
        # reflect resolved preset values back into args — ALL later branches
        # (input loading, target, checkpoints) read args.*, so every field the
        # preset can carry must round-trip here, not just dataset/save_dir
        args.dataset = cfg.dataset_name
        args.save_dir = cfg.paths.save_dir
        args.seed = cfg.seed
        args.whitebox_preset = cfg.whitebox_preset
        if cfg.align:
            args.align = True
        if cfg.image_size is not None:
            args.size = cfg.image_size
        if cfg.paths.images_dir and not args.images_dir:
            args.images_dir = cfg.paths.images_dir
        if cfg.paths.target_image and not args.target_image:
            args.target_image = cfg.paths.target_image
        if cfg.paths.adv_inputs_path and not args.adv_inputs_path:
            args.adv_inputs_path = cfg.paths.adv_inputs_path
        # fields a preset CAN carry but this driver has no use for — say so
        # instead of silently no-opping (ADVICE r2)
        from tpufusion.configs import AttackRunConfig as _ARC

        for fld in ("batch", "n_sample"):
            if getattr(cfg, fld) != getattr(_ARC(), fld):
                print(f"[attack_run] note: preset field '{fld}' is not used "
                      f"by this driver (fusion group size comes from the "
                      f"dataset; 'n_sample' drives the invert CLI)")
        _run_cfg = cfg
    else:
        _run_cfg = None
    cfg = _run_cfg if _run_cfg is not None else AttackRunConfig(
        dataset_name=args.dataset, attacks=tuple(args.attacks), lr=args.lr,
        seed=args.seed, align=args.align,
        n_iters=args.n_iters, which_adv=args.which_adv, max_count=args.max_count,
        whitebox_execution=("stepwise" if args.whitebox_stepwise
                            else args.whitebox_execution),
        whitebox_preset=args.whitebox_preset,
        whitebox_grad_accum=args.whitebox_grad_accum,
        epochs=args.epochs, regenerate=args.patch_npz is None,
        patch_npz=args.patch_npz,
        patch_type=args.patch_type, patch_size=args.patch_size,
        paste_times=args.paste_times, scale=args.scale, pgd_steps=args.pgd_steps,
        train_size=args.train_size, test_size=args.test_size,
        max_num_fusion=args.max_num_fusion,
        hybrid_adv=args.hybrid_adv, save_img=not args.no_save_img,
        snapshot_every=args.snapshot_every, flush_every=args.flush_every,
        image_size=args.size,
        hybrid_adv_from_existing=bool(args.hybrid_from_dirs),
        hybrid_adv_dirs=tuple(args.hybrid_from_dirs or ()),
        use_existing_data=bool(args.inputs_path),
        paths=PathsConfig(
            images_dir=args.images_dir, save_dir=args.save_dir,
            stylegan_ckpt=args.stylegan_ckpt, e4e_ckpt=args.e4e_ckpt,
            vgg_ckpt=args.vgg_ckpt, fusion_weights=args.fusion_weights,
            target_image=args.target_image,
            adv_inputs_path=args.adv_inputs_path,
        ),
    )

    if not cfg.attacks:
        # nargs='*' permits `--attacks` with zero names; fail BEFORE the
        # (minutes-long at real scale) pipeline build, not at cfg.attacks[0]
        raise SystemExit("no attacks requested — pass at least one name "
                         f"to --attacks (choices: {', '.join(ATTACK_CHOICES)})")

    # seeding happens AFTER preset resolution so a preset-carried seed is
    # honoured (ADVICE r2: the pool used to be seeded from args.seed before
    # the preset loaded, silently no-opping cfg.seed)
    args.seed = cfg.seed
    pool = seed_everything(cfg.seed)

    if args.transfer_chain and not cfg.save_img:
        raise SystemExit(
            "--transfer_chain persists adversarial crops to disk and reloads "
            "them via adv_generate — it cannot run with --no_save_img / "
            "save_img=false (ADVICE r2: this used to be silently ignored)")

    dataset_dir = os.path.join(args.save_dir, args.dataset)
    os.makedirs(dataset_dir, exist_ok=True)

    t0 = time.time()
    print(f"[attack_run] building {args.dataset} pipeline "
          f"(size={args.size or 'default'}, tiny={args.tiny}) …")
    if args.tiny:
        pipeline = create_test_pipeline(args.dataset, pool.next(), size=args.size or 32)
    else:
        # model-scale knobs round-trip from the config (ADVICE r2: a preset
        # setting these used to silently no-op)
        pipeline = FusionPipeline.create(
            args.dataset, pool.next(), size=args.size,
            channel_multiplier=cfg.channel_multiplier,
            encoder_base_channels=cfg.encoder_base_channels,
            encoder_units=tuple(cfg.encoder_units),
        )
    pipeline = _maybe_load_checkpoints(pipeline, cfg.paths)
    print(f"[attack_run] pipeline ready in {time.time() - t0:.1f}s "
          f"(generator {pipeline.image_size}^2)")

    mesh = None
    if args.mesh:
        from tpufusion.parallel import create_mesh, shard_generator_params

        spec = _parse_mesh_spec(args.mesh)
        devices = jax.devices()
        if spec.get("data") is not None:
            # a smaller mesh than the host uses the first data*model devices
            # (same semantics as `invert --mesh N`)
            want = spec["data"] * spec["model"]
            if want > len(devices):
                raise SystemExit(
                    f"--mesh requests {want} devices "
                    f"(data={spec['data']} x model={spec['model']}) but only "
                    f"{len(devices)} are visible")
            devices = devices[:want]
        mesh = create_mesh(devices, data=spec.get("data"),
                           model=spec["model"])
        if mesh.shape["model"] > 1:
            # TP: shard mapping/affine out-features + conv out-channels
            pipeline.drawer.gen_vars = shard_generator_params(
                pipeline.drawer.gen_vars, mesh, generator=pipeline.generator)
        print(f"[attack_run] mesh {dict(mesh.shape)} over {mesh.size} "
              f"{jax.devices()[0].platform} device(s)")

    n = cfg.n_inputs

    # hybrid-from-existing: no new attacks, just splice prior runs and fuse
    # (reference clears adversarial_choose in this mode, `attack_main2.py:949-950`)
    if args.hybrid_from_dirs:
        from tpufusion.runner import run_hybrid_from_dirs

        result = run_hybrid_from_dirs(
            pipeline, cfg, dataset_dir, args.hybrid_from_dirs,
            save_root=dataset_dir,
        )
        print(f"[attack_run] hybrid splice from {len(args.hybrid_from_dirs)} "
              f"runs (counts {result['counts']}); artifacts under {dataset_dir}")
        return 0

    n_groups = max(cfg.max_num_fusion, 1)
    if args.inputs_path:
        from tpufusion.runner import load_existing_inputs

        inputs = load_existing_inputs(args.inputs_path, n, pipeline.image_size)
        print(f"[attack_run] reusing saved inputs from {args.inputs_path}")
        input_groups = [inputs]
    elif args.images_dir:
        preprocess = None
        if args.align:
            from tpufusion.data.alignment import resolve_align_preprocess

            preprocess = resolve_align_preprocess(
                args.landmark_net, args.dlib_predictor)
        ds = ImageFolderDataset(args.images_dir, transform=transform_for(args.dataset),
                                preprocess=preprocess)
        _, test_loader = setup_loaders(
            ds, train_size=min(cfg.train_size, max(len(ds) - n, 0)),
            test_size=min(cfg.test_size, len(ds)), test_batch_size=n,
            seed=args.seed % (2**31),
        )
        loader_it = iter(test_loader)
        input_groups = []
        for _ in range(n_groups):
            try:
                batch = jnp.asarray(next(loader_it))
            except StopIteration:
                break
            if batch.shape[0] < n:
                break
            if batch.shape[1] != pipeline.image_size:
                # dataset transforms emit the reference resolution; shrink
                # when running a reduced-size pipeline (tests / quick runs)
                from tpufusion.core.imaging import resize_bilinear

                batch = resize_bilinear(batch, pipeline.image_size,
                                        pipeline.image_size)
            input_groups.append(batch)
        if not input_groups:
            raise SystemExit(f"--images_dir yielded no full group of {n} images")
        inputs = input_groups[0]
    else:
        print("[attack_run] no --images_dir: generating inputs from the generator")
        # record the data-free path in the run metadata (the reference's
        # --use_generate_img flag, `attack_main2.py:1001-1002`)
        cfg.use_generate_img = True
        input_groups = [generate_inputs(pipeline, n, pool.next())
                        for _ in range(n_groups)]
        inputs = input_groups[0]

    if args.target_image:
        target = jnp.asarray(load_image(args.target_image, pipeline.image_size))
    else:
        z = jax.random.normal(jax.random.key(7777), (1, 512)) * 2.0
        target, _ = pipeline.drawer.z_to_image(z)
        target = jnp.asarray(target)

    if args.transfer_chain:
        from tpufusion.runner import run_transfer_chain

        attack = cfg.attacks[0] if cfg.attacks[0] in (
            "pgd_classifier", "cw_classifier", "cw") else "pgd_classifier"
        chain = run_transfer_chain(
            pipeline, cfg, inputs, target, pool.next(), dataset_dir,
            attack=attack,
        )
        r = chain["fuse"]["adv_generate"][0]
        print(f"[attack_run] transfer chain ({attack} -> adv_generate): "
              f"input-noise MSE {float(jnp.mean(r['noise'])):.5f}, crops at "
              f"{chain['adv_inputs_path']}")
        return 0

    discriminator = None
    d_ckpt = args.discriminator_ckpt or cfg.paths.discriminator_ckpt
    if d_ckpt:
        from tpufusion.io import convert_ada_discriminator
        from tpufusion.io.ada_pkl import load_network_pkl_tensors
        from tpufusion.models.discriminator import Discriminator

        nets = load_network_pkl_tensors(d_ckpt)
        d_tensors = nets.get("D", nets.get("root"))
        if not d_tensors:
            raise SystemExit(
                f"--discriminator_ckpt {d_ckpt} contains no 'D' network "
                f"(found: {sorted(nets)})")
        d = Discriminator(size=pipeline.image_size,
                          channel_multiplier=1 if args.tiny else 2,
                          policy=pipeline.policy)
        d_vars = convert_ada_discriminator(d_tensors, d)
        d_vars = jax.tree.map(jnp.asarray, d_vars)
        discriminator = (d, d_vars)
        print(f"[attack_run] realism scoring with D from {d_ckpt}")

    import contextlib

    profile_ctx = contextlib.nullcontext()
    if args.profile:
        from tpufusion.utils.logging import trace_profile

        profile_ctx = trace_profile(args.profile)
        print(f"[attack_run] profiling to {args.profile}")

    # group-parallel fusion attacks: with a mesh and multiple groups, attack
    # ALL groups in one sharded program up front (the reference's
    # max_num_fusion loop, `interpolation.py:1265`, parallelised over
    # 'data'), then run the EVALUATION phase (partial fusion both modes +
    # metric rows, `interpolation.py:1076-1091`) for all groups as a second
    # sharded program; run_experiment below consumes both via adv_override
    adv_overrides = [dict() for _ in input_groups]
    gp_attacks = [a for a in cfg.attacks if a.startswith("fusion_pgd")]
    if mesh is not None and mesh.size > 1 and len(input_groups) > 1 and gp_attacks:
        from tpufusion.attacks.fusion_attack import FusionAttackConfig
        from tpufusion.attacks.pgd import PGDConfig
        from tpufusion.parallel import (
            make_sharded_group_eval,
            make_sharded_group_fusion_attack,
        )

        groups_arr = jnp.stack(input_groups)
        gp_target = target[None]  # (1, 1, S, S, 3): shared across groups
        gp_eval = make_sharded_group_eval(pipeline, mesh)
        for a in gp_attacks:
            facfg = FusionAttackConfig(
                mode="arithmetic" if a.endswith("arith") else "spatial",
                objective="pixel", targeted=True,
                pgd=PGDConfig(eps=cfg.pgd_eps * 2.0, alpha=cfg.pgd_alpha * 2.0,
                              steps=cfg.pgd_steps),
            )
            gattack = make_sharded_group_fusion_attack(pipeline, facfg, mesh)
            adv_all, traces = gattack(groups_arr, gp_target, pool.next())
            evals = gp_eval(groups_arr, adv_all)
            for gi in range(len(input_groups)):
                per_group = {k: v[gi] for k, v in evals.items()}
                adv_overrides[gi][a] = {"batches": [adv_all[gi]],
                                        "trace": traces[gi],
                                        "evals": [per_group]}
            print(f"[attack_run] {a}: {len(input_groups)} groups attacked "
                  f"AND evaluated in two sharded programs over mesh "
                  f"{dict(mesh.shape)}")

    # one run_experiment per fusion group (`interpolation.py:1265` evaluates
    # max_num_fusion independent batches; each gets its own numbered run dir)
    def run_group(gi: int, group) -> None:
        results = run_experiment(
            pipeline, cfg, group, target, pool.next(),
            save_root=dataset_dir if cfg.save_img else None,
            discriminator=discriminator,
            mesh=mesh, adv_override=adv_overrides[gi] or None,
        )
        tag = f" [group {gi}]" if len(input_groups) > 1 else ""
        if results.get("realism"):
            # the reference prints D logits of benign vs adversarial fused
            # images (`attack_main2.py:1029-1032,1091-1094`, commented-in)
            print(f"[attack_run]{tag} realism(D): benign fused "
                  f"{float(jnp.mean(results['realism']['fused_spatial'])):+.4f}")
        for attack in cfg.attacks:
            for r in results[attack]:
                noise = float(jnp.mean(r["noise"]))
                ssim_all = float(r["ssim_spatial"][-1])
                msg = (f"[attack_run]{tag} {attack}: input-noise MSE "
                       f"{noise:.5f}, spatial SSIM(all-adv vs benign) "
                       f"{ssim_all:.4f}")
                if r.get("adv_realism") is not None:
                    msg += (f", realism(D) adv fused "
                            f"{float(jnp.mean(r['adv_realism'])):+.4f}")
                print(msg)

    with profile_ctx:
        for gi, group in enumerate(input_groups):
            run_group(gi, group)
    print(f"[attack_run] artifacts under {dataset_dir}")
    return 0


def _maybe_load_checkpoints(pipeline, paths):
    """Fill converted reference checkpoints into the pipeline if provided."""
    from tpufusion.io import (
        convert_e4e_checkpoint,
        convert_stylegan2_checkpoint,
        convert_vgg16_checkpoint,
        load_torch_state_dict,
    )
    import jax.numpy as jnp

    if paths.stylegan_ckpt:
        state = load_torch_state_dict(paths.stylegan_ckpt)
        g_ema = state.get("g_ema", state)
        pipeline.drawer.gen_vars = convert_stylegan2_checkpoint(g_ema, pipeline.generator)
    if paths.e4e_ckpt:
        ckpt = load_torch_state_dict(paths.e4e_ckpt)
        enc_vars, latent_avg = convert_e4e_checkpoint(ckpt, pipeline.encoder)
        pipeline.enc_vars = enc_vars
        if latent_avg is not None:
            pipeline.latent_avg = jnp.asarray(latent_avg)
    if paths.vgg_ckpt:
        state = load_torch_state_dict(paths.vgg_ckpt)
        pipeline.vgg_vars = convert_vgg16_checkpoint(state)
    if paths.fusion_weights:
        pipeline.drawer.blend_params = pipeline.drawer.blender.load_fusion_nets(
            paths.fusion_weights
        )
    return pipeline


if __name__ == "__main__":
    sys.exit(main())
