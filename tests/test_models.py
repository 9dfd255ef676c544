"""Model tests — e4e encoder (C4), VGG16 (C6), discriminator (C22),
checkpoint converters (SURVEY §7 hard part #2)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpufusion.core.dtypes import Policy
from tpufusion.models.discriminator import create_discriminator, realism_scores
from tpufusion.models.e4e import create_encoder, get_latents
from tpufusion.models.stylegan2 import create_generator
from tpufusion.models.vgg16 import create_vgg16, perceptual_distance
from tpufusion.io.checkpoint import (
    convert_stylegan2_checkpoint,
    convert_vgg16_checkpoint,
)

FP32 = Policy()


class TestEncoder:
    @pytest.fixture(scope="class")
    def enc(self):
        return create_encoder(
            jax.random.key(0), n_styles=6, image_size=32, base_channels=8,
            unit_counts=(1, 1, 1, 1), policy=FP32,
        )

    def test_output_shape(self, enc):
        encoder, variables = enc
        x = jax.random.uniform(jax.random.key(1), (2, 32, 32, 3), minval=-1, maxval=1)
        w = jax.jit(encoder.apply)(variables, x)
        assert w.shape == (2, 6, 512)

    def test_progressive_deltas(self, enc):
        """Rows 1.. are w0 + delta; with zeroed delta-head params they'd all
        equal w0 — here just check they differ but stay correlated."""
        encoder, variables = enc
        x = jax.random.uniform(jax.random.key(2), (1, 32, 32, 3), minval=-1, maxval=1)
        w = jax.jit(encoder.apply)(variables, x)
        w = np.asarray(w[0])
        assert not np.allclose(w[0], w[1])

    def test_get_latents_adds_avg_and_trims_cars(self, enc):
        encoder, variables = enc
        x = jnp.zeros((1, 32, 32, 3))
        avg = jnp.ones((6, 512))
        raw = jax.jit(encoder.apply)(variables, x)
        out = get_latents(encoder, variables, x, avg)
        np.testing.assert_allclose(np.asarray(out), np.asarray(raw) + 1.0, atol=1e-6)

    def test_grad_flows(self, enc):
        encoder, variables = enc

        @jax.jit
        def g(x):
            return jax.grad(lambda y: jnp.sum(encoder.apply(variables, y) ** 2))(x)

        grad = g(jnp.ones((1, 32, 32, 3)) * 0.1)
        assert bool(jnp.any(grad != 0))


class TestVGG:
    def test_tap_shapes(self):
        vgg, variables = create_vgg16(jax.random.key(0), policy=FP32, image_size=64)
        x = jnp.zeros((2, 64, 64, 3))
        c11, c12, p2, c42 = jax.jit(vgg.apply)(variables, x)
        assert c11.shape == (2, 64, 64, 64)
        assert c12.shape == (2, 64, 64, 64)
        assert p2.shape == (2, 16, 16, 128)  # after 2 pools
        assert c42.shape == (2, 8, 8, 512)  # after pool3 (ceil)

    def test_perceptual_distance_zero_for_identical(self):
        vgg, variables = create_vgg16(jax.random.key(0), policy=FP32, image_size=32)
        x = jax.random.uniform(jax.random.key(1), (1, 32, 32, 3))
        f = jax.jit(vgg.apply)(variables, x)
        assert float(perceptual_distance(f, f)) == 0.0


class TestDiscriminator:
    def test_logits_shape(self):
        d, variables = create_discriminator(32, jax.random.key(0),
                                            channel_multiplier=1, policy=FP32)
        imgs = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3), minval=-1, maxval=1)
        scores = jax.jit(lambda v, x: realism_scores(d, v, x))(variables, imgs)
        assert scores.shape == (4,)
        assert bool(jnp.all(jnp.isfinite(scores)))

    def test_stddev_group_non_divisible_batch(self):
        """Batch 6 with stddev_group 4 must use a real cross-sample group
        (largest divisor, 3) — the old fallback degraded to g=1, an
        all-zero stddev channel that skewed scores by batch size."""
        d, variables = create_discriminator(32, jax.random.key(0),
                                            channel_multiplier=1, policy=FP32)
        imgs = jax.random.uniform(jax.random.key(2), (6, 32, 32, 3),
                                  minval=-1, maxval=1)
        s6 = jax.jit(lambda v, x: realism_scores(d, v, x))(variables, imgs)
        assert s6.shape == (6,) and bool(jnp.all(jnp.isfinite(s6)))
        # scoring the divisible sub-batches must roughly bracket the same
        # scale (degenerate stddev used to shift every score)
        s4 = realism_scores(d, variables, imgs[:4])
        assert bool(jnp.all(jnp.isfinite(s4)))


class TestCheckpointConversion:
    def test_stylegan2_roundtrip_via_synthetic_torch_ckpt(self):
        """Build a rosinality-layout state dict synthetically, convert, and
        check the generator consumes every tensor and runs."""
        gen, ref_vars = create_generator(32, jax.random.key(0),
                                         channel_multiplier=1, policy=FP32)
        rng = np.random.RandomState(0)
        sd = {}
        for i in range(gen.n_mlp):
            sd[f"style.{i + 1}.weight"] = rng.randn(512, 512).astype(np.float32)
            sd[f"style.{i + 1}.bias"] = rng.randn(512).astype(np.float32)
        ch4 = ref_vars["params"]["input_const"].shape[-1]
        sd["input.input"] = rng.randn(1, ch4, 4, 4).astype(np.float32)
        names = ["conv1", "to_rgb1"]
        for i in range(gen.log_size - 2):
            names += [f"convs.{2 * i}", f"convs.{2 * i + 1}", f"to_rgbs.{i}"]
        noise_i = 0
        for j, ((cin, cout, kind), t) in enumerate(zip(gen.conv_plan(), names)):
            k = 1 if kind == "rgb" else 3
            sd[f"{t}.conv.weight"] = rng.randn(1, cout, cin, k, k).astype(np.float32)
            sd[f"{t}.conv.modulation.weight"] = rng.randn(cin, 512).astype(np.float32)
            sd[f"{t}.conv.modulation.bias"] = np.ones(cin, np.float32)
            if kind == "rgb":
                sd[f"{t}.bias"] = rng.randn(1, 3, 1, 1).astype(np.float32)
            else:
                sd[f"{t}.activate.bias"] = rng.randn(cout).astype(np.float32)
                sd[f"{t}.noise.weight"] = np.zeros((), np.float32)
                noise_i += 1
        for i in range(1 + 2 * (gen.log_size - 2)):
            res = 4 * (2 ** ((i + 1) // 2))
            sd[f"noises.noise_{i}"] = rng.randn(1, 1, res, res).astype(np.float32)

        converted = convert_stylegan2_checkpoint(sd, gen)
        # every param in the target tree must be present with matching shape
        flat_ref = jax.tree_util.tree_leaves_with_path(ref_vars["params"])
        flat_new = dict(jax.tree_util.tree_leaves_with_path(converted["params"]))
        for path, leaf in flat_ref:
            assert path in flat_new, path
            assert flat_new[path].shape == leaf.shape, path
        out = jax.jit(lambda v, z: gen.apply(v, [z]).image)(
            converted, jnp.zeros((1, 512))
        )
        assert out.shape == (1, 32, 32, 3)
        assert bool(jnp.all(jnp.isfinite(out)))

    def test_vgg_positional_conversion(self):
        rng = np.random.RandomState(1)
        chans = [(3, 64), (64, 64), (64, 128), (128, 128), (128, 256),
                 (256, 256), (256, 256), (256, 512), (512, 512)]
        state = {}
        for i, (cin, cout) in enumerate(chans):
            state[f"features.{i}.weight"] = rng.randn(cout, cin, 3, 3).astype(np.float32)
            state[f"features.{i}.bias"] = rng.randn(cout).astype(np.float32)
        variables = convert_vgg16_checkpoint(state)
        vgg, _ = create_vgg16(jax.random.key(0), policy=FP32, image_size=32)
        taps = jax.jit(vgg.apply)(variables, jnp.zeros((1, 32, 32, 3)))
        assert taps[3].shape[-1] == 512

    def test_e4e_conversion_with_scanned_stages(self):
        """Synthetic e4e-layout state dict -> stacked scan/vmap params."""
        from tpufusion.io.checkpoint import convert_e4e_checkpoint
        from tpufusion.models.e4e import create_encoder

        units = (2, 2, 2, 2)
        base = 64  # real IR-SE widths: c3 == 512 == style_dim (no c3_proj)
        enc, ref_vars = create_encoder(
            jax.random.key(0), n_styles=8, image_size=32,
            base_channels=base, unit_counts=units, policy=FP32,
        )
        rng = np.random.RandomState(0)
        sd = {}
        sd["input_layer.0.weight"] = rng.randn(base, 3, 3, 3).astype(np.float32)
        for suffix, shape in (("weight", base), ("bias", base),
                              ("running_mean", base), ("running_var", base)):
            sd[f"input_layer.1.{suffix}"] = rng.rand(shape).astype(np.float32) + 0.5
        sd["input_layer.2.weight"] = np.full(base, 0.25, np.float32)

        depths = (base, 2 * base, 4 * base, 8 * base)
        cin = base
        i = 0
        for s, n in enumerate(units):
            for u in range(n):
                d = depths[s]
                pre = f"body.{i}"
                for suffix in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{pre}.res_layer.0.{suffix}"] = rng.rand(cin).astype(np.float32) + 0.5
                    sd[f"{pre}.res_layer.4.{suffix}"] = rng.rand(d).astype(np.float32) + 0.5
                sd[f"{pre}.res_layer.1.weight"] = rng.randn(d, cin, 3, 3).astype(np.float32)
                sd[f"{pre}.res_layer.2.weight"] = np.full(d, 0.25, np.float32)
                sd[f"{pre}.res_layer.3.weight"] = rng.randn(d, d, 3, 3).astype(np.float32)
                sd[f"{pre}.res_layer.5.fc1.weight"] = rng.randn(max(d // 16, 1), d, 1, 1).astype(np.float32)
                sd[f"{pre}.res_layer.5.fc2.weight"] = rng.randn(d, max(d // 16, 1), 1, 1).astype(np.float32)
                if u == 0 and cin != d:
                    # conv shortcut only on channel-changing units; same-
                    # channel stride-2 units use MaxPool (no weights) in IR-SE
                    sd[f"{pre}.shortcut_layer.0.weight"] = rng.randn(d, cin, 1, 1).astype(np.float32)
                    for suffix in ("weight", "bias", "running_mean", "running_var"):
                        sd[f"{pre}.shortcut_layer.1.{suffix}"] = rng.rand(d).astype(np.float32) + 0.5
                cin = d
                i += 1
        # FPN + heads: spatial of c3 = 32/16 = 2 -> 1 conv per head
        c3 = depths[3]
        sd["latlayer1.weight"] = rng.randn(512, depths[2], 1, 1).astype(np.float32)
        sd["latlayer1.bias"] = rng.randn(512).astype(np.float32)
        sd["latlayer2.weight"] = rng.randn(512, depths[1], 1, 1).astype(np.float32)
        sd["latlayer2.bias"] = rng.randn(512).astype(np.float32)
        n_styles = 8
        spatials = {0: 2, 1: 2, 2: 2, 3: 4, 4: 4, 5: 4, 6: 4, 7: 8}
        feats_ch = {0: c3, 1: c3, 2: c3}
        for h in range(n_styles):
            import math as _math

            n_convs = int(_math.log2(spatials[h]))
            ch_in = feats_ch.get(h, 512)
            for k in range(n_convs):
                sd[f"styles.{h}.convs.{2 * k}.weight"] = rng.randn(
                    512, ch_in if k == 0 else 512, 3, 3).astype(np.float32)
                sd[f"styles.{h}.convs.{2 * k}.bias"] = rng.randn(512).astype(np.float32)
            sd[f"styles.{h}.linear.weight"] = rng.randn(512, 512).astype(np.float32)
            sd[f"styles.{h}.linear.bias"] = rng.randn(512).astype(np.float32)
        ckpt = {"state_dict": {f"encoder.{k}": v for k, v in sd.items()},
                "latent_avg": rng.randn(n_styles, 512).astype(np.float32)}

        variables, latent_avg = convert_e4e_checkpoint(ckpt, enc)
        # structural parity with a fresh init
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref_vars["params"]))
        flat_new = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
        assert set(flat_ref) == set(flat_new)
        for path, leaf in flat_ref.items():
            assert flat_new[path].shape == leaf.shape, path
        out = jax.jit(enc.apply)(variables, jnp.zeros((1, 32, 32, 3)))
        assert out.shape == (1, n_styles, 512)
        assert latent_avg.shape == (n_styles, 512)
