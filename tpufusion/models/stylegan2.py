"""StyleGAN2 generator with the StyleFusion style-vector API — TPU-native.

Re-implements, from behaviour, the external ``stylefusion.sf_stylegan2.
SFGenerator`` / ``sf_stylegan2_hook.SFGenerator_hook`` that the reference
imports (`style_fusion_simple.py:10-11`) — a rosinality-style StyleGAN2 whose
call sites (`style_fusion_simple.py:115-153`) require:

- ``generator([z], truncation=, truncation_latent=, randomize_noise=False,
  return_style_vector=True)``  -> per-layer style vectors ``s``;
- ``generator([w_plus], input_is_latent=True, ...)``           -> from W+;
- ``generator([_], style_vector=s, randomize_noise=False)``    -> image AND
  inner feature maps (the "hook" variant);
- ``generator.mean_latent(4096)``;
- ``return_latents=True`` -> the broadcast W+ (`attack_main2.py:619-621`).

TPU-first design decisions (not a port):
- NHWC activations, bf16 compute / fp32 params via ``core.dtypes.Policy``;
- modulated conv as input-scale + output-demod (``ops.modconv``) so the batch
  shares one MXU-friendly weight;
- noise buffers are deterministic variables (reference always runs with
  ``randomize_noise=False``);
- synthesis blocks wrapped in ``jax.checkpoint`` (optional) so the white-box
  attacks can differentiate through 1024^2 synthesis without blowing HBM
  (SURVEY §7 hard part #4).

Style-vector ordering convention (pytree: tuple of (N, Cin) arrays):
    [conv1, to_rgb1, (conv_up, conv, to_rgb) per resolution 8..size]
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Sequence

import flax.linen as nn
import flax.struct
import jax
import jax.numpy as jnp

from tpufusion.core.dtypes import Policy, default_policy
from tpufusion.ops.modconv import modulated_conv2d
from tpufusion.ops.upfirdn2d import upsample_2x


def channel_map(size: int, channel_multiplier: int = 2, base: int = 512) -> dict:
    """Per-resolution channel widths (rosinality config-f table)."""
    return {
        4: base,
        8: base,
        16: base,
        32: base,
        64: 256 * channel_multiplier,
        128: 128 * channel_multiplier,
        256: 64 * channel_multiplier,
        512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }


class EqualLinear(nn.Module):
    """Linear layer with equalized learning rate (scale = lr_mul/sqrt(fan_in))."""

    features: int
    lr_mul: float = 1.0
    bias_init: float = 0.0
    activate: bool = False  # fused leaky-relu with sqrt(2) gain
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param(
            "kernel",
            lambda k, s: jax.random.normal(k, s, self.policy.param_dtype) / self.lr_mul,
            (in_f, self.features),
        )
        bias = self.param(
            "bias",
            lambda k, s: jnp.full(s, self.bias_init, self.policy.param_dtype),
            (self.features,),
        )
        scale = (1.0 / math.sqrt(in_f)) * self.lr_mul
        dt = self.policy.compute_dtype
        y = x.astype(dt) @ (kernel.astype(dt) * scale) + (bias * self.lr_mul).astype(dt)
        if self.activate:
            y = jax.nn.leaky_relu(y, 0.2) * math.sqrt(2.0)
        return y


class PixelNorm(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x * jax.lax.rsqrt(jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True) + 1e-8).astype(x.dtype)


class MappingNetwork(nn.Module):
    """z -> w: PixelNorm + n_mlp EqualLinear(lr_mul=0.01) layers."""

    style_dim: int = 512
    n_mlp: int = 8
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, z):
        x = PixelNorm()(z.astype(self.policy.compute_dtype))
        for i in range(self.n_mlp):
            x = EqualLinear(
                self.style_dim, lr_mul=0.01, activate=True, policy=self.policy, name=f"fc{i}"
            )(x)
        return x


@flax.struct.dataclass
class GeneratorOutput:
    """Full synthesis result (the reference unpacks ad-hoc tuples)."""

    image: jax.Array  # (N, size, size, 3) in [-1, 1]
    features: tuple  # inner feature maps, one per resolution (hook variant)
    latents: Optional[jax.Array] = None  # (N, n_latent, style_dim) W+
    styles: Optional[tuple] = None  # per-layer style vectors s


class Generator(nn.Module):
    """StyleGAN2 synthesis + mapping with style-vector injection/extraction."""

    size: int = 1024
    style_dim: int = 512
    n_mlp: int = 8
    channel_multiplier: int = 2
    blur_taps: Sequence[int] = (1, 3, 3, 1)
    remat: bool = False  # checkpoint each block's convs (for deep backprop)
    # selective remat: checkpoint only convs whose OUTPUT resolution is
    # >= this (e.g. 512 -> only the 512^2/1024^2 blocks, where activation
    # stashes dominate HBM traffic; the cheap low-res blocks keep their
    # residuals).  None disables; ``remat=True`` overrides (all blocks).
    remat_min_res: Optional[int] = None
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @property
    def log_size(self) -> int:
        return int(math.log2(self.size))

    @property
    def n_latent(self) -> int:
        """W+ rows: 18 @1024, 16 @512, 14 @256 (`style_fusion_simple.py:31-39`)."""
        return self.log_size * 2 - 2

    @property
    def n_styles(self) -> int:
        """Total modulated convs = conv1 + to_rgb1 + 3 per block."""
        return 2 + 3 * (self.log_size - 2)

    def setup(self):
        ch = channel_map(self.size, self.channel_multiplier)
        self.mapping = MappingNetwork(self.style_dim, self.n_mlp, policy=self.policy)

        # Per-modulated-conv affine (w -> s).  Bias init 1 (rosinality).
        dims = self.style_input_dims()
        self.affines = [
            EqualLinear(d, bias_init=1.0, policy=self.policy, name=f"affine_{i}")
            for i, d in enumerate(dims)
        ]

        self.input_const = self.param(
            "input_const",
            lambda k, s: jax.random.normal(k, s, self.policy.param_dtype),
            (1, 4, 4, ch[4]),
        )

        # Conv weights, biases, noise strengths, rgb weights/biases.
        weights = []
        for i, (cin, cout, kind) in enumerate(self.conv_plan()):
            k = 1 if kind == "rgb" else 3
            weights.append(
                self.param(
                    f"w{i}",
                    lambda key, s: jax.random.normal(key, s, self.policy.param_dtype),
                    (k, k, cin, cout),
                )
            )
        self.conv_weights = weights
        self.conv_biases = [
            self.param(
                f"b{i}",
                lambda key, s: jnp.zeros(s, self.policy.param_dtype),
                (cout,),
            )
            for i, (_, cout, _) in enumerate(self.conv_plan())
        ]
        n_noise = 1 + 2 * (self.log_size - 2)
        self.noise_strength = [
            self.param(f"ns{i}", lambda key, s: jnp.zeros(s, self.policy.param_dtype), ())
            for i in range(n_noise)
        ]
        # Deterministic noise buffers (randomize_noise=False semantics,
        # `style_fusion_simple.py:118-152`): fixed at init, a variable
        # collection so converters can overwrite them from checkpoints.
        noises = []
        res = 4
        for i in range(n_noise):
            if i > 0 and i % 2 == 1:
                res *= 2
            noises.append(
                self.variable(
                    "noise",
                    f"noise_{i}",
                    lambda r=res, i=i: jax.random.normal(
                        jax.random.key(i), (1, r, r, 1), jnp.float32
                    ),
                )
            )
        self.noises = noises

    # ---- static structure ------------------------------------------------
    def conv_plan(self):
        """(cin, cout, kind) per modulated conv, in style-vector order."""
        ch = channel_map(self.size, self.channel_multiplier)
        plan = [(ch[4], ch[4], "conv"), (ch[4], 3, "rgb")]
        res = 8
        cin = ch[4]
        while res <= self.size:
            cout = ch[res]
            plan += [(cin, cout, "up"), (cout, cout, "conv"), (cout, 3, "rgb")]
            cin = cout
            res *= 2
        return plan

    def style_input_dims(self):
        return [cin for cin, _, _ in self.conv_plan()]

    def w_index_plan(self):
        """Which W+ row feeds each modulated conv (rosinality layer wiring)."""
        idx = [0, 1]  # conv1 <- w0, to_rgb1 <- w1
        i = 1
        for _ in range(self.log_size - 2):
            idx += [i, i + 1, i + 2]
            i += 2
        return idx

    # ---- public API ------------------------------------------------------
    def mean_latent(self, n_sample: int, key: jax.Array) -> jax.Array:
        """Mean mapped w over n random z (`style_fusion_simple.py:60`)."""
        z = jax.random.normal(key, (n_sample, self.style_dim), self.policy.compute_dtype)
        return jnp.mean(self.mapping(z).astype(jnp.float32), axis=0, keepdims=True)

    def styles_from_w_plus(self, w_plus: jax.Array) -> tuple:
        """(N, n_latent, 512) W+ -> per-conv style vectors s."""
        idx = self.w_index_plan()
        return tuple(
            self.affines[i](w_plus[:, idx[i]]) for i in range(self.n_styles)
        )

    def __call__(
        self,
        styles: Optional[Sequence[jax.Array]] = None,
        *,
        input_is_latent: bool = False,
        truncation: float = 1.0,
        truncation_latent: Optional[jax.Array] = None,
        randomize_noise: bool = False,
        noise_key: Optional[jax.Array] = None,
        inject_index: Optional[int] = None,
        return_latents: bool = False,
        return_style_vector: bool = False,
        style_vector: Optional[Sequence[jax.Array]] = None,
    ):
        """Synthesis.  Mirrors SFGenerator's call surface; returns either the
        style-vector pytree (``return_style_vector=True``) or a
        ``GeneratorOutput`` with image + inner features (the hook contract,
        `style_fusion_simple.py:151-153`)."""
        if style_vector is None:
            w_plus = self._to_w_plus(
                styles, input_is_latent, truncation, truncation_latent, inject_index
            )
            s = self.styles_from_w_plus(w_plus)
        else:
            w_plus = None
            s = tuple(style_vector)

        if return_style_vector:
            return s

        image, features = self._synthesis(s, randomize_noise, noise_key)
        return GeneratorOutput(
            image=image,
            features=features,
            latents=w_plus if return_latents else None,
            styles=s,
        )

    # ---- internals -------------------------------------------------------
    def _to_w_plus(self, styles, input_is_latent, truncation, truncation_latent, inject_index):
        if not isinstance(styles, (list, tuple)):
            styles = [styles]
        ws = list(styles) if input_is_latent else [self.mapping(z) for z in styles]

        if truncation != 1.0:
            if truncation_latent is None:
                raise ValueError("truncation < 1 requires truncation_latent")
            tl = truncation_latent.astype(jnp.float32)
            ws = [
                (tl + truncation * (w.astype(jnp.float32) - tl)).astype(w.dtype)
                for w in ws
            ]

        if len(ws) == 1:
            w = ws[0]
            if w.ndim == 2:
                w_plus = jnp.repeat(w[:, None, :], self.n_latent, axis=1)
            else:
                w_plus = w
        else:  # two-style mixing
            if inject_index is None:
                inject_index = self.n_latent // 2
            w1 = jnp.repeat(ws[0][:, None, :], inject_index, axis=1)
            w2 = jnp.repeat(ws[1][:, None, :], self.n_latent - inject_index, axis=1)
            w_plus = jnp.concatenate([w1, w2], axis=1)
        return w_plus

    def _noise(self, i, shape, randomize, key):
        if randomize:
            if key is None:
                raise ValueError("randomize_noise=True requires noise_key")
            return jax.random.normal(jax.random.fold_in(key, i), shape, jnp.float32)
        buf = self.noises[i].value
        return jnp.broadcast_to(buf, (shape[0],) + buf.shape[1:])

    def _remat_at(self, out_res: int) -> bool:
        return self.remat or (self.remat_min_res is not None
                              and out_res >= self.remat_min_res)

    def _styled_conv(self, x, conv_idx, noise_idx, s, up, randomize, key):
        w = self.conv_weights[conv_idx]
        b = self.conv_biases[conv_idx]
        use_remat = self._remat_at(x.shape[1] * (2 if up else 1))

        if not up and not randomize:
            # the non-upsampling styled conv has a fully-fused Pallas form
            # (ops/styled_conv.py) — dispatched there when enabled, XLA
            # composite otherwise (measured default: see docs/DESIGN.md §3)
            from tpufusion.ops.styled_conv import styled_conv

            buf = self.noises[noise_idx].value
            ns = self.noise_strength[noise_idx]

            def body(x, s_):
                return styled_conv(x, w, s_, buf, ns, b)

            if use_remat:
                body = jax.checkpoint(body)
            return body(x, s)

        def body(x, s_):
            from tpufusion.ops.styled_conv import noise_bias_act

            y = modulated_conv2d(
                x, w, s_, demodulate=True, up=up, blur_taps=tuple(self.blur_taps)
            )
            noise = self._noise(noise_idx, y.shape[:3] + (1,), randomize, key)
            return noise_bias_act(y, noise, self.noise_strength[noise_idx], b)

        if use_remat:
            body = jax.checkpoint(body)
        return body(x, s)

    def _to_rgb(self, x, conv_idx, s, skip=None):
        w = self.conv_weights[conv_idx]
        b = self.conv_biases[conv_idx]
        y = modulated_conv2d(x, w, s, demodulate=False)
        y = y + b.astype(y.dtype)
        if skip is not None:
            y = y + upsample_2x(skip, tuple(self.blur_taps)).astype(y.dtype)
        return y

    def _synthesis(self, s, randomize_noise, noise_key):
        n = s[0].shape[0]
        dt = self.policy.compute_dtype
        x = jnp.broadcast_to(
            self.input_const.astype(dt), (n,) + self.input_const.shape[1:]
        )
        features = []
        x = self._styled_conv(x, 0, 0, s[0], False, randomize_noise, noise_key)
        features.append(x)
        skip = self._to_rgb(x, 1, s[1])

        ci, ni = 2, 1
        for _ in range(self.log_size - 2):
            x = self._styled_conv(x, ci, ni, s[ci], True, randomize_noise, noise_key)
            x = self._styled_conv(x, ci + 1, ni + 1, s[ci + 1], False, randomize_noise, noise_key)
            features.append(x)
            skip = self._to_rgb(x, ci + 2, s[ci + 2], skip)
            ci += 3
            ni += 2

        return skip.astype(jnp.float32), tuple(features)


def create_generator(
    size: int,
    key: jax.Array,
    *,
    channel_multiplier: int = 2,
    policy: Optional[Policy] = None,
    remat: bool = False,
    remat_min_res: Optional[int] = None,
):
    """Build a Generator and its variables; returns (module, variables)."""
    policy = policy or default_policy()
    gen = Generator(
        size=size, channel_multiplier=channel_multiplier, policy=policy,
        remat=remat, remat_min_res=remat_min_res,
    )
    z = jnp.zeros((1, gen.style_dim), policy.compute_dtype)
    variables = jax.jit(lambda k, z_: gen.init(k, [z_]))(key, z)
    return gen, variables
