"""End-to-end runner tests — the full benign/attack/partial/metrics loop
(SURVEY §3.1/§3.2) on a tiny pipeline, plus the CLI drivers."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufusion.configs import AttackRunConfig
from tpufusion.pipeline import create_test_pipeline
from tpufusion.runner import dispatch_attack, generate_inputs, run_experiment


@pytest.fixture(scope="module")
def pipeline():
    return create_test_pipeline("church", jax.random.key(0), size=32)


@pytest.fixture(scope="module")
def batch(pipeline):
    inputs = generate_inputs(pipeline, 3, jax.random.key(1))
    target = jax.random.uniform(jax.random.key(2), (1, 32, 32, 3), minval=-1, maxval=1)
    return inputs, target


class TestDispatch:
    def test_dp_noise(self, pipeline, batch):
        inputs, target = batch
        cfg = AttackRunConfig(dataset_name="church", scale=0.3)
        (adv,) = dispatch_attack(pipeline, "dp_noise", inputs, target, cfg, jax.random.key(3))
        assert adv.shape == inputs.shape
        assert not np.allclose(np.asarray(adv), np.asarray(inputs))

    def test_out_domain_single_yields_n_batches(self, pipeline, batch):
        inputs, target = batch
        cfg = AttackRunConfig(dataset_name="church")
        advs = dispatch_attack(pipeline, "out_domain_single", inputs, target, cfg, jax.random.key(4))
        assert len(advs) == inputs.shape[0]

    def test_patch_paste(self, pipeline, batch):
        inputs, target = batch
        cfg = AttackRunConfig(dataset_name="church", paste_times=3)
        (adv,) = dispatch_attack(pipeline, "patch", inputs, target, cfg, jax.random.key(5))
        # centre region replaced on every image
        c = 32 // 2
        assert not np.allclose(np.asarray(adv[:, c, c]), np.asarray(inputs[:, c, c]))

    def test_pgd_bounded(self, pipeline, batch):
        inputs, target = batch
        cfg = AttackRunConfig(dataset_name="church", pgd_steps=3, pgd_eps=0.02, pgd_alpha=0.01)
        (adv,) = dispatch_attack(pipeline, "pgd", inputs, target, cfg, jax.random.key(6))
        assert float(jnp.max(jnp.abs(adv - inputs))) <= 0.04 + 1e-5

    def test_patch_white_box_trains_and_reuses(self, pipeline, batch, tmp_path):
        """Train a patch (run_dir persists patch.npz), then reuse it via
        patch_npz without retraining — the regenerate=0 path
        (`adversarial_patch.py:211-213`)."""
        import numpy as np

        inputs, target = batch
        cfg = AttackRunConfig(dataset_name="church", max_count=2, epochs=1,
                              patch_size=0.2)
        run_dir = str(tmp_path)
        (adv,) = dispatch_attack(pipeline, "patch_white_box", inputs, target,
                                 cfg, jax.random.key(9), run_dir=run_dir)
        npz = os.path.join(run_dir, "patch.npz")
        assert os.path.exists(npz)
        assert adv.shape == inputs.shape

        reuse = AttackRunConfig(dataset_name="church", regenerate=False,
                                patch_npz=npz)
        (adv2,) = dispatch_attack(pipeline, "patch_white_box", inputs, target,
                                  reuse, jax.random.key(10))
        np.testing.assert_allclose(np.asarray(adv2), np.asarray(adv),
                                   atol=1e-6)

        bad = AttackRunConfig(dataset_name="church", regenerate=False)
        with pytest.raises(ValueError):
            dispatch_attack(pipeline, "patch_white_box", inputs, target, bad,
                            jax.random.key(11))

    def test_whitebox_preset_selection(self, pipeline, batch):
        """cfg.whitebox_preset='interpolation' must switch to the
        interpolation.py:818 loss (different weights -> different adv)."""
        inputs, target = batch
        advs = {}
        for preset in ("attack_main", "interpolation"):
            cfg = AttackRunConfig(dataset_name="church", n_iters=3, lr=0.01,
                                  whitebox_preset=preset)
            (advs[preset],) = dispatch_attack(
                pipeline, "white_box_target", inputs, target, cfg,
                jax.random.key(91))
        assert not np.allclose(np.asarray(advs["attack_main"]),
                               np.asarray(advs["interpolation"]))

    def test_every_registered_attack_dispatches(self, pipeline, batch,
                                                tmp_path):
        """Smoke matrix over configs.ATTACK_CHOICES: every registered name
        must dispatch end-to-end on the tiny pipeline and return batches of
        the input shape (catches dispatch/registry drift)."""
        import numpy as np

        from tpufusion.configs import ATTACK_CHOICES

        inputs, target = batch
        # adv_generate needs a persisted crops artifact
        adv_npz = str(tmp_path / "adv.npz")
        np.savez(adv_npz, data=np.asarray(inputs))
        for attack in ATTACK_CHOICES:
            cfg = AttackRunConfig(
                dataset_name="church", n_iters=2, max_count=2, epochs=1,
                pgd_steps=2, cw_steps=2, patch_size=0.2,
            )
            cfg.paths.adv_inputs_path = adv_npz
            advs = dispatch_attack(pipeline, attack, inputs, target, cfg,
                                   jax.random.key(77))
            assert len(advs) >= 1, attack
            for adv in advs:
                assert adv.shape == inputs.shape, attack
                assert bool(jnp.all(jnp.isfinite(adv))), attack

    def test_unknown_attack_raises(self, pipeline, batch):
        inputs, target = batch
        cfg = AttackRunConfig(dataset_name="church")
        with pytest.raises(ValueError):
            dispatch_attack(pipeline, "nope", inputs, target, cfg, jax.random.key(0))


class TestRunExperiment:
    def test_full_loop_with_artifacts(self, pipeline, batch, tmp_path):
        inputs, target = batch
        cfg = AttackRunConfig(
            dataset_name="church", attacks=("dp_noise",), scale=0.2, save_img=True,
        )
        results = run_experiment(
            pipeline, cfg, inputs, target, jax.random.key(7), save_root=str(tmp_path)
        )
        assert "benign" in results and "dp_noise" in results
        r = results["dp_noise"][0]
        n = inputs.shape[0]
        assert r["partial_spatial"].shape[0] == n + 1
        assert r["partial_arith"].shape[0] == n + 1
        assert r["ssim_spatial"].shape == (n + 1,)
        # artifacts on disk
        run_dirs = [d for d in os.listdir(tmp_path) if "dp_noise" in d]
        assert len(run_dirs) == 1
        run_dir = tmp_path / run_dirs[0]
        assert (run_dir / "parameters.txt").exists()
        assert (run_dir / "benign" / "spatial_org_fusion_0.jpg").exists()
        assert (run_dir / "adversarial" / "all_adv_inputs.npz").exists()
        table = [f for f in os.listdir(run_dir) if f.startswith("new_mask")]
        assert table  # metrics table written (csv fallback)

    def test_loss_log_and_results_jsonl(self, pipeline, batch, tmp_path):
        """Attacks with optimisation traces persist loss_{attack}.txt
        (reference loss logs, interpolation.py:825-838) and every run dir
        gets a machine-readable results.jsonl twin of the xlsx table."""
        import json

        inputs, target = batch
        cfg = AttackRunConfig(
            dataset_name="church", attacks=("pgd",), pgd_steps=3, save_img=True,
        )
        run_experiment(pipeline, cfg, inputs, target, jax.random.key(21),
                       save_root=str(tmp_path))
        run_dir = tmp_path / [d for d in os.listdir(tmp_path) if "pgd" in d][0]
        log = (run_dir / "loss_pgd.txt").read_text().strip().splitlines()
        assert len(log) == 3 and "inversion_loss:" in log[0]
        rows = [json.loads(l) for l in
                (run_dir / "results.jsonl").read_text().splitlines()]
        assert rows[0]["attack"] == "pgd"
        n = inputs.shape[0]
        assert len(rows[0]["ssim_spatial"]) == n + 1
        assert all(0.0 <= v <= 1.0 for v in rows[0]["ssim_spatial"])

    def test_fgsm_records_real_semantics(self, pipeline, batch, tmp_path):
        """'fgsm' dispatches as R+FGSM (PRNG-dependent); the run parameters
        must record that so downstream comparisons aren't mislabeled as
        standard FGSM (ADVICE r4 #3)."""
        import json

        inputs, target = batch
        cfg = AttackRunConfig(dataset_name="church", attacks=("fgsm",))
        run_experiment(pipeline, cfg, inputs, target, jax.random.key(22),
                       save_root=str(tmp_path))
        run_dir = tmp_path / [d for d in os.listdir(tmp_path) if "fgsm" in d][0]
        params = json.loads((run_dir / "parameters.json").read_text())
        assert params["attack semantics"] == "r+fgsm (random_start, steps=1)"

    def test_hybrid_splice(self, pipeline, batch):
        inputs, target = batch
        cfg = AttackRunConfig(
            dataset_name="church", attacks=("dp_noise", "out_domain_more"),
            hybrid_adv=True,
        )
        results = run_experiment(pipeline, cfg, inputs, target, jax.random.key(8))
        assert "hybrid" in results
        assert results["hybrid"]["inputs"].shape == inputs.shape
        assert results["hybrid"]["counts"] == [2, 1]


class TestCLI:
    def test_fuse_cli(self, tmp_path, monkeypatch):
        from tpufusion.cli.fuse import main

        out = str(tmp_path / "demo.jpg")
        rc = main(["--dataset", "church", "--tiny", "--size", "32", "--out", out])
        assert rc == 0
        assert os.path.exists(out)

    def test_attack_run_cli(self, tmp_path):
        from tpufusion.cli.attack_run import main

        rc = main([
            "--dataset", "church", "--tiny", "--size", "32",
            "--attacks", "dp_noise", "--save_dir", str(tmp_path),
        ])
        assert rc == 0
        ds_dir = tmp_path / "church"
        assert ds_dir.exists() and any(ds_dir.iterdir())

    def test_attack_run_cli_max_num_fusion(self, tmp_path):
        """--max_num_fusion N evaluates N independent fusion groups, each in
        its own numbered run dir (interpolation.py:1265 batch loop)."""
        from tpufusion.cli.attack_run import main

        rc = main([
            "--dataset", "church", "--tiny", "--size", "32",
            "--attacks", "dp_noise", "--max_num_fusion", "2",
            "--save_dir", str(tmp_path),
        ])
        assert rc == 0
        run_dirs = [d for d in os.listdir(tmp_path / "church")
                    if "dp_noise" in d]
        assert len(run_dirs) == 2

    def test_attack_run_cli_with_config_preset(self, tmp_path):
        """JSON preset drives the run; explicit CLI flags override it."""
        import json

        from tpufusion.cli.attack_run import main

        preset = tmp_path / "preset.json"
        preset.write_text(json.dumps({
            "dataset_name": "church",
            "attacks": ["dp_noise"],
            "scale": 0.2,
        }))
        rc = main([
            "--config", str(preset), "--tiny", "--size", "32",
            "--save_dir", str(tmp_path / "runs"),
        ])
        assert rc == 0
        assert (tmp_path / "runs" / "church").exists()

    def test_attack_run_cli_empty_attacks_fails_fast(self, tmp_path):
        """`--attacks` with zero names (nargs='*') must fail with a clear
        message BEFORE the pipeline build, not at cfg.attacks[0]."""
        from tpufusion.cli.attack_run import main

        with pytest.raises(SystemExit, match="no attacks"):
            main(["--attacks", "--tiny", "--size", "32",
                  "--save_dir", str(tmp_path)])

    def test_attack_run_cli_snapshot_flush_override_preset(self, tmp_path):
        """--snapshot_every / --flush_every typed alongside --config must
        override the preset (they were missing from the override table)."""
        import json

        from tpufusion.cli.attack_run import main

        preset = tmp_path / "p.json"
        preset.write_text(json.dumps({
            "dataset_name": "church", "attacks": ["white_box_target"],
            "n_iters": 4, "snapshot_every": 2,
        }))
        rc = main(["--config", str(preset), "--tiny", "--size", "32",
                   "--snapshot_every", "0", "--flush_every", "1",
                   "--save_dir", str(tmp_path / "runs")])
        assert rc == 0
        run_dir = [d for d in (tmp_path / "runs" / "church").iterdir()
                   if "white_box" in d.name][0]
        names = os.listdir(run_dir)
        # snapshot_every 0 (CLI) beat the preset's 2: no snapshot montages
        assert not [n for n in names if n.startswith("adv_input_")]

    def test_attack_run_cli_preset_paths_and_flags_round_trip(self, tmp_path):
        """Preset paths (target_image) and CLI flags outside the numeric
        override table (--max_num_fusion, --no_save_img) must all take
        effect with --config (code-review r2 findings)."""
        import json

        import numpy as np
        from PIL import Image

        from tpufusion.cli.attack_run import main

        tgt = tmp_path / "target.png"
        Image.fromarray(
            (np.linspace(0, 255, 32 * 32 * 3) % 255).astype(np.uint8)
            .reshape(32, 32, 3)).save(tgt)
        preset = tmp_path / "preset.json"
        preset.write_text(json.dumps({
            "dataset_name": "church",
            "attacks": ["dp_noise"],
            "paths": {"target_image": str(tgt)},
        }))
        rc = main([
            "--config", str(preset), "--tiny", "--size", "32",
            "--max_num_fusion", "2", "--no_save_img",
            "--save_dir", str(tmp_path / "runs"),
        ])
        assert rc == 0
        # --no_save_img honored under --config: no run dirs were written
        ds_dir = tmp_path / "runs" / "church"
        assert not any("dp_noise" in d for d in os.listdir(ds_dir))

    def test_attack_run_cli_explicit_default_beats_preset(self, tmp_path):
        """A flag explicitly typed at its parser-default value must still
        override the preset (ADVICE r2: default-comparison lost this case)."""
        import json

        from tpufusion.cli.attack_run import main

        preset = tmp_path / "preset.json"
        preset.write_text(json.dumps({
            "dataset_name": "church",  # CLI says ffhq — the parser default
            "attacks": ["dp_noise"],
        }))
        rc = main([
            "--config", str(preset), "--dataset", "ffhq", "--tiny",
            "--size", "32", "--save_dir", str(tmp_path / "runs"),
        ])
        assert rc == 0
        assert (tmp_path / "runs" / "ffhq").exists()
        assert not (tmp_path / "runs" / "church").exists()

    def test_attack_run_cli_preset_seed_honoured(self, tmp_path):
        """A preset-carried seed must reach the PRNG pool (ADVICE r2: the
        pool used to be seeded before the preset loaded)."""
        import json

        from tpufusion.cli.attack_run import main

        runs_a, runs_b, runs_c = (tmp_path / x for x in ("a", "b", "c"))
        base = {"dataset_name": "church", "attacks": ["dp_noise"]}
        for runs, seed in ((runs_a, 1), (runs_b, 1), (runs_c, 2)):
            preset = tmp_path / f"preset_{runs.name}.json"
            preset.write_text(json.dumps(dict(base, seed=seed)))
            rc = main(["--config", str(preset), "--tiny", "--size", "32",
                       "--save_dir", str(runs)])
            assert rc == 0

        def noise_mse(runs):
            d = runs / "church"
            (adir,) = [x for x in os.listdir(d) if "dp_noise" in x]
            line = (d / adir / "results.jsonl").read_text().splitlines()[0]
            return json.loads(line)["noise_mse"]

        assert noise_mse(runs_a) == noise_mse(runs_b)  # same seed
        assert noise_mse(runs_a) != noise_mse(runs_c)  # different seed

    def test_transfer_chain_rejects_no_save_img(self, tmp_path):
        """--transfer_chain needs persisted crops; combining it with
        --no_save_img must error, not silently write artifacts (ADVICE r2)."""
        import pytest as _pytest

        from tpufusion.cli.attack_run import main

        with _pytest.raises(SystemExit, match="transfer_chain"):
            main(["--dataset", "church", "--tiny", "--size", "32",
                  "--transfer_chain", "--no_save_img",
                  "--save_dir", str(tmp_path / "runs")])

    def test_load_config_presets_parse(self):
        """Every shipped configs/*.json preset loads into AttackRunConfig."""
        import glob

        from tpufusion.configs import load_config

        root = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "configs")
        presets = sorted(glob.glob(os.path.join(root, "*.json")))
        assert len(presets) >= 5
        for p in presets:
            cfg = load_config(p)
            assert cfg.dataset_name in ("ffhq", "car", "church")
            assert cfg.attacks

    def test_load_config_rejects_unknown_keys(self, tmp_path):
        import json

        import pytest as _pytest

        from tpufusion.configs import load_config

        bad = tmp_path / "bad.json"
        bad.write_text(json.dumps({"dataset_name": "ffhq", "no_such_key": 1}))
        with _pytest.raises(ValueError, match="no_such_key"):
            load_config(str(bad))

    def test_invert_cli(self, tmp_path):
        import numpy as _np
        from PIL import Image

        from tpufusion.cli.invert import main

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        for i in range(2):
            Image.fromarray(
                (_np.random.RandomState(i).rand(40, 40, 3) * 255).astype("uint8")
            ).save(img_dir / f"{i}.png")
        rc = main([
            "--images_dir", str(img_dir), "--dataset", "church", "--tiny",
            "--size", "32", "--save_dir", str(tmp_path / "inv"), "--batch", "2",
        ])
        assert rc == 0
        assert (tmp_path / "inv" / "latents.npz").exists()
        assert (tmp_path / "inv" / "inversions" / "00001.jpg").exists()

    def test_invert_cli_mesh_matches_single(self, tmp_path):
        """--mesh N shards the encode batch; latents must equal the
        single-device run (incl. a batch that does not divide the mesh)."""
        import numpy as _np
        from PIL import Image

        from tpufusion.cli.invert import main

        img_dir = tmp_path / "imgs"
        img_dir.mkdir()
        for i in range(3):
            Image.fromarray(
                (_np.random.RandomState(i).rand(40, 40, 3) * 255).astype("uint8")
            ).save(img_dir / f"{i}.png")
        for name, extra in (("single", []), ("mesh", ["--mesh", "4"])):
            rc = main([
                "--images_dir", str(img_dir), "--dataset", "church", "--tiny",
                "--size", "32", "--save_dir", str(tmp_path / name),
                "--batch", "3", "--latents_only", *extra,
            ])
            assert rc == 0
        a = _np.load(tmp_path / "single" / "latents.npz")["latents"]
        b = _np.load(tmp_path / "mesh" / "latents.npz")["latents"]
        _np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


class TestAdvGenerate:
    def test_loads_npz_artifact(self, pipeline, batch, tmp_path):
        import numpy as _np

        from tpufusion.configs import AttackRunConfig, PathsConfig
        from tpufusion.io import ArtifactStore

        inputs, target = batch
        store = ArtifactStore(str(tmp_path))
        adv_saved = _np.asarray(inputs) + 0.1
        store.append("all_adv_inputs", adv_saved)
        paths = store.flush()
        cfg = AttackRunConfig(
            dataset_name="church",
            paths=PathsConfig(adv_inputs_path=paths["all_adv_inputs"]),
        )
        (adv,) = dispatch_attack(pipeline, "adv_generate", inputs, target, cfg,
                                 jax.random.key(0))
        np.testing.assert_allclose(np.asarray(adv), adv_saved, atol=1e-6)

    def test_loads_montage_crops(self, pipeline, batch, tmp_path):
        from tpufusion.configs import AttackRunConfig, PathsConfig
        from tpufusion.io import save_montage

        inputs, target = batch
        p = save_montage(inputs, str(tmp_path / "adv.png"), nrow=inputs.shape[0])
        cfg = AttackRunConfig(
            dataset_name="church", paths=PathsConfig(adv_inputs_path=p),
        )
        (adv,) = dispatch_attack(pipeline, "adv_generate", inputs, target, cfg,
                                 jax.random.key(0))
        assert adv.shape == inputs.shape
        # 8-bit roundtrip tolerance
        np.testing.assert_allclose(
            np.asarray(adv), np.clip(np.asarray(inputs), -1, 1), atol=2 / 255 + 1e-3
        )

    def test_missing_path_raises(self, pipeline, batch):
        from tpufusion.configs import AttackRunConfig

        inputs, target = batch
        with pytest.raises(ValueError):
            dispatch_attack(pipeline, "adv_generate", inputs, target,
                            AttackRunConfig(dataset_name="church"), jax.random.key(0))


class TestResumePaths:
    def test_hybrid_from_existing_dirs(self, pipeline, batch, tmp_path):
        """Prior runs' all_adv_inputs.npz artifacts splice into one fusion."""
        import numpy as _np

        from tpufusion.configs import AttackRunConfig
        from tpufusion.io import ArtifactStore, new_run_folder
        from tpufusion.runner import run_hybrid_from_dirs

        inputs, _ = batch
        for i, name in enumerate(["0_church_dp_noise", "1_church_pgd"]):
            store = ArtifactStore(str(tmp_path / name / "adversarial"))
            store.append("all_adv_inputs", _np.asarray(inputs) + 0.1 * (i + 1))
            store.flush()
        cfg = AttackRunConfig(dataset_name="church")
        result = run_hybrid_from_dirs(
            pipeline, cfg, str(tmp_path), ["0_church_dp_noise", "1_church_pgd"],
            save_root=str(tmp_path),
        )
        assert result["inputs"].shape == inputs.shape
        assert result["counts"] == [2, 1]
        assert result["fused"].shape[-3:] == (32, 32, 3)
        hybrid_dirs = [d for d in os.listdir(tmp_path) if "hybrid" in d]
        assert hybrid_dirs
        assert (tmp_path / hybrid_dirs[0] / "hybrid_fusion.jpg").exists()

    def test_attack_run_cli_with_existing_inputs(self, tmp_path):
        import numpy as _np

        from tpufusion.cli.attack_run import main
        from tpufusion.io import ArtifactStore

        store = ArtifactStore(str(tmp_path))
        store.append("all_inputs", _np.random.RandomState(0)
                     .uniform(-1, 1, (3, 32, 32, 3)).astype(_np.float32))
        paths = store.flush()
        rc = main([
            "--dataset", "church", "--tiny", "--size", "32",
            "--attacks", "dp_noise", "--save_dir", str(tmp_path / "runs"),
            "--inputs_path", paths["all_inputs"],
        ])
        assert rc == 0


class TestClassifierTransfer:
    def test_pgd_classifier_dispatch_bounded_and_flips(self, pipeline, batch):
        """The reference PGD recipe (`interpolation.py:1343`) as a
        dispatchable attack: eps-ball bounded, classifier-targeted."""
        import jax as _jax

        from tpufusion.runner import dispatch_attack

        cfg = AttackRunConfig(dataset_name=pipeline.dataset,
                              pgd_steps=5, pgd_eps=0.1, pgd_alpha=0.05)
        inputs, target = batch
        (adv,) = dispatch_attack(pipeline, "pgd_classifier", inputs, target,
                                 cfg, _jax.random.key(3))
        delta = np.abs(np.asarray(adv) - np.asarray(inputs))
        assert delta.max() <= cfg.pgd_eps * 2.0 + 1e-5
        assert delta.max() > 1e-4  # actually perturbed
        assert np.asarray(adv).min() >= -1.0 and np.asarray(adv).max() <= 1.0

    def test_pgd_classifier_car_uses_vit(self, batch):
        import jax as _jax

        from tpufusion.pipeline import create_test_pipeline
        from tpufusion.runner import classifier_for

        car = create_test_pipeline("car", _jax.random.key(0), size=32)
        cfg = AttackRunConfig(dataset_name="car")
        logits_fn, variables = classifier_for(car, cfg, _jax.random.key(1))
        logits = logits_fn(variables, jnp.zeros((2, 32, 32, 3)))
        assert logits.shape == (2, 8)  # tiny ViT head

    def test_transfer_chain_e2e(self, pipeline, batch, tmp_path):
        """generate -> persist -> adv_generate reload -> fuse, one call;
        the reloaded crops must drive the same partial-fusion evaluation."""
        import jax as _jax

        from tpufusion.runner import run_transfer_chain

        cfg = AttackRunConfig(dataset_name=pipeline.dataset, pgd_steps=2)
        inputs, target = batch
        chain = run_transfer_chain(pipeline, cfg, inputs, target,
                                   _jax.random.key(5), str(tmp_path))
        assert os.path.exists(chain["adv_inputs_path"])
        gen_adv = np.asarray(chain["generate"]["pgd_classifier"][0]["adv_inputs"])
        fuse_adv = np.asarray(chain["fuse"]["adv_generate"][0]["adv_inputs"])
        np.testing.assert_allclose(fuse_adv, gen_adv, atol=1e-6)
        r = chain["fuse"]["adv_generate"][0]
        n = inputs.shape[0]
        assert r["partial_spatial"].shape[0] == n + 1
        assert r["ssim_spatial"].shape == (n + 1,)
        # the montage form of the crops is persisted too (the reference's
        # reload format, interpolation.py:1379-1394)
        run_dir = chain["generate"]["_run_dirs"]["pgd_classifier"]
        assert os.path.exists(
            os.path.join(run_dir, f"{pipeline.dataset}_adv_images.jpg"))


class TestCWDispatch:
    def test_cw_attack_dispatch(self, pipeline, batch):
        from tpufusion.configs import AttackRunConfig

        inputs, target = batch
        cfg = AttackRunConfig(dataset_name="church", cw_steps=5)
        (adv,) = dispatch_attack(pipeline, "cw", inputs, target, cfg, jax.random.key(30))
        assert adv.shape == inputs.shape
        assert bool(jnp.all(jnp.isfinite(adv)))


class TestBlurDispatch:
    def test_blur_attack(self, pipeline, batch):
        from tpufusion.configs import AttackRunConfig

        inputs, target = batch
        cfg = AttackRunConfig(dataset_name="church", scale=0.2)
        (adv,) = dispatch_attack(pipeline, "blur", inputs, target, cfg, jax.random.key(31))
        assert adv.shape == inputs.shape
        # blur reduces local variance
        assert float(jnp.var(adv)) < float(jnp.var(inputs))


class TestFusionPGDDispatch:
    def test_fusion_pgd_arith(self, pipeline, batch):
        from tpufusion.configs import AttackRunConfig

        inputs, target = batch
        cfg = AttackRunConfig(dataset_name="church", pgd_steps=3,
                              pgd_eps=0.02, pgd_alpha=0.01)
        (adv,) = dispatch_attack(pipeline, "fusion_pgd_arith", inputs, target,
                                 cfg, jax.random.key(32))
        assert adv.shape == inputs.shape
        assert float(jnp.max(jnp.abs(adv - inputs))) <= 0.04 + 1e-5


class TestRealismScoring:
    def test_discriminator_scores_in_results(self, pipeline, batch):
        from tpufusion.configs import AttackRunConfig
        from tpufusion.models.discriminator import create_discriminator

        inputs, target = batch
        d, d_vars = create_discriminator(32, jax.random.key(50),
                                         channel_multiplier=1,
                                         policy=pipeline.policy)
        cfg = AttackRunConfig(dataset_name="church", attacks=("dp_noise",),
                              scale=0.2, save_img=False)
        results = run_experiment(pipeline, cfg, inputs, target,
                                 jax.random.key(51), discriminator=(d, d_vars))
        assert results["realism"]["inputs"].shape == (inputs.shape[0],)
        assert results["realism"]["fused_spatial"].shape == (1,)
        assert results["dp_noise"][0]["adv_realism"].shape == (1,)


class TestExportProgramsCLI:
    def test_export_and_serve_side_load(self, tmp_path):
        """export_programs writes decode/fusion artifacts + params.npz; the
        serving side reconstructs images with only load_program/load_pytree."""
        import jax.numpy as jnp

        from tpufusion.cli.export_programs import main
        from tpufusion.io import load_program
        from tpufusion.io.params_io import load_pytree

        out = str(tmp_path / "artifacts")
        rc = main(["--dataset", "church", "--tiny", "--size", "32",
                   "--batch", "2", "--out", out])
        assert rc == 0
        dec = load_program(os.path.join(out, "decode.jexp"))
        n_latent = dec.in_avals[-1].shape[1]  # recorded expected shapes
        params = load_pytree(os.path.join(out, "params.npz"))
        codes = jax.random.normal(jax.random.key(1), (2, n_latent, 512)) * 0.2
        img = dec(params["gen_vars"], codes)
        assert img.shape == (2, 32, 32, 3)
        assert bool(jnp.all(jnp.isfinite(img)))
        assert os.path.exists(os.path.join(out, "fusion.jexp.roles"))


class TestMidRunObservability:
    """VERDICT r3 ask #5: per-iter snapshots + mid-run artifact cadence."""

    def test_whitebox_run_writes_snapshots(self, pipeline, batch, tmp_path):
        inputs, target = batch
        cfg = AttackRunConfig(
            dataset_name="church", attacks=("white_box_target",),
            n_iters=4, snapshot_every=2, save_img=True,
        )
        run_experiment(pipeline, cfg, inputs, target, jax.random.key(11),
                       save_root=str(tmp_path))
        run_dir = tmp_path / [d for d in os.listdir(tmp_path)
                              if "white_box" in d][0]
        names = set(os.listdir(run_dir))
        assert "adv_input_white_box_target_2.png" in names
        assert "rec_white_box_target_2.png" in names
        # reference cadence (`attack_main2.py:657`): the final iteration
        # never snapshots — with n_iters=4 every=2 only the iter-2 frame
        assert "adv_input_white_box_target_4.png" not in names
        assert "rec_white_box_target_4.png" not in names

    def test_store_flushes_mid_experiment(self, pipeline, batch, tmp_path,
                                          monkeypatch):
        """With flush_every=1, the npz must exist on disk after the FIRST
        batch — before the experiment completes (`attack_main2.py:1096`)."""
        import tpufusion.runner as runner_mod

        inputs, target = batch
        cfg = AttackRunConfig(
            dataset_name="church", attacks=("out_domain_single",),
            flush_every=1, save_img=True,
        )
        seen = []
        orig = runner_mod.ResultsTable.add_batch

        def spy(self, *a, **k):
            # out_domain_single yields n batches; after batch 0 flushed,
            # the accumulated npz must already be on disk
            for root, _, files in os.walk(tmp_path):
                if "all_adv_inputs.npz" in files:
                    seen.append(os.path.join(root, "all_adv_inputs.npz"))
            return orig(self, *a, **k)

        monkeypatch.setattr(runner_mod.ResultsTable, "add_batch", spy)
        run_experiment(pipeline, cfg, inputs, target, jax.random.key(12),
                       save_root=str(tmp_path))
        # the LAST add_batch call happens after n-1 flushes: file existed
        assert seen, "all_adv_inputs.npz never appeared mid-experiment"


class TestWhiteboxExecutionResolution:
    """An explicit scan/stepwise choice must never be silently overridden;
    only 'auto' adapts to snapshot state."""

    def test_resolve_rules(self):
        from tpufusion.runner import resolve_whitebox_execution

        assert resolve_whitebox_execution("auto", True) == "stepwise"
        assert resolve_whitebox_execution("auto", False) == "scan"
        assert resolve_whitebox_execution("scan", True) == "scan"
        assert resolve_whitebox_execution("scan", False) == "scan"
        assert resolve_whitebox_execution("stepwise", True) == "stepwise"
        assert resolve_whitebox_execution("stepwise", False) == "stepwise"
        with pytest.raises(ValueError, match="whitebox_execution"):
            resolve_whitebox_execution("fast", True)

    def test_explicit_scan_with_snapshots_uses_scan_executor(
            self, pipeline, batch, tmp_path, monkeypatch):
        """Explicit scan + snapshots must run the scan executor (frames
        stacked on device by the nested scan) AND still write snapshots."""
        import tpufusion.attacks.whitebox as wb

        def boom(*a, **k):  # pragma: no cover - failure path
            raise AssertionError("stepwise executor used despite "
                                 "whitebox_execution='scan'")

        monkeypatch.setattr(wb, "vmap_whitebox_stepwise", boom)
        inputs, target = batch
        cfg = AttackRunConfig(
            dataset_name="church", attacks=("white_box_target",),
            n_iters=4, snapshot_every=2, save_img=True,
            whitebox_execution="scan",
        )
        run_experiment(pipeline, cfg, inputs, target, jax.random.key(13),
                       save_root=str(tmp_path))
        run_dir = tmp_path / [d for d in os.listdir(tmp_path)
                              if "white_box" in d][0]
        names = set(os.listdir(run_dir))
        assert "adv_input_white_box_target_2.png" in names
        assert "rec_white_box_target_2.png" in names
        assert "rec_white_box_target_4.png" not in names  # final iter: no frame
