"""PyTorch checkpoint -> params-pytree converters — SURVEY §7 hard part #2.

The reference consumes external checkpoints: rosinality StyleGAN2
``stylegan2-ffhq-config-f.pt`` (``g_ema``; loaded by the external SFGenerator,
call sites `attack_main2.py:50,200`), e4e ``e4e_%s_encode.pt``
(``state_dict`` + ``latent_avg`` + ``opts``, `utils/model_utils.py:7-35`) and
``imagenet_vgg16.pth`` with positional name mapping (`vgg.py:66-76`).

torch (CPU) is available in this image, so we use ``torch.load`` for the
pickle parsing and convert tensors to the NHWC/flax layouts of
``tpufusion.models``:

  torch conv   (out, in, kh, kw)       -> flax kernel (kh, kw, in, out)
  torch linear (out, in)               -> flax kernel (in, out)
  rosinality modconv (1, out, in, k, k)-> generator w_i (k, k, in, out)
  noise buffer (1, 1, H, W)            -> (1, H, W, 1)

EqualLinear weights are stored pre-divided by lr_mul in both frameworks, so
they transfer without rescaling.
"""

from __future__ import annotations

from typing import Mapping

import numpy as np


def load_torch_state_dict(path: str) -> dict:
    """Load a .pt/.pth pickle into a {name: np.ndarray} dict (plus non-tensor
    entries passed through)."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    return to_numpy_tree(obj)


def to_numpy_tree(obj):
    import torch

    if isinstance(obj, torch.Tensor):
        return obj.detach().cpu().numpy()
    if isinstance(obj, Mapping):
        return {k: to_numpy_tree(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return type(obj)(to_numpy_tree(v) for v in obj)
    return obj


def _conv(w):  # torch OIHW -> flax HWIO
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _linear(w):  # torch (out,in) -> flax (in,out)
    return np.transpose(np.asarray(w), (1, 0))


# Public aliases — the ONE torch->flax layout definition, reused by every
# converter (resnet/lpips/vit) so a layout fix cannot be missed in a copy.
torch_conv_kernel = _conv
torch_linear_kernel = _linear


# ---------------------------------------------------------------------------
# StyleGAN2 generator (rosinality g_ema layout)
# ---------------------------------------------------------------------------


def convert_stylegan2_checkpoint(state: Mapping, generator) -> dict:
    """rosinality ``g_ema`` state dict -> our Generator variables.

    ``generator`` is the target ``tpufusion.models.stylegan2.Generator`` (for
    the conv plan / sizes); returns a variables dict {'params':…, 'noise':…}.
    """
    sd = {k: np.asarray(v) for k, v in state.items()}
    params: dict = {}

    # mapping network: style.0 is PixelNorm (no params); style.1..n are the fcs
    mapping = {}
    for i in range(generator.n_mlp):
        mapping[f"fc{i}"] = {
            "kernel": _linear(sd[f"style.{i + 1}.weight"]),
            "bias": np.asarray(sd[f"style.{i + 1}.bias"]),
        }
    params["mapping"] = mapping

    params["input_const"] = np.transpose(sd["input.input"], (0, 2, 3, 1))

    # torch-module name for each entry of our conv plan, in style order
    names = ["conv1", "to_rgb1"]
    for i in range(generator.log_size - 2):
        names += [f"convs.{2 * i}", f"convs.{2 * i + 1}", f"to_rgbs.{i}"]

    noise_idx = 0
    for j, ((cin, cout, kind), tname) in enumerate(zip(generator.conv_plan(), names)):
        w = sd[f"{tname}.conv.weight"]  # (1, out, in, k, k)
        params[f"w{j}"] = np.transpose(w[0], (2, 3, 1, 0))
        params[f"affine_{j}"] = {
            "kernel": _linear(sd[f"{tname}.conv.modulation.weight"]),
            "bias": np.asarray(sd[f"{tname}.conv.modulation.bias"]),
        }
        if kind == "rgb":
            params[f"b{j}"] = np.asarray(sd[f"{tname}.bias"]).reshape(-1)
        else:
            params[f"b{j}"] = np.asarray(sd[f"{tname}.activate.bias"]).reshape(-1)
            params[f"ns{noise_idx}"] = np.asarray(sd[f"{tname}.noise.weight"]).reshape(())
            noise_idx += 1

    noise = {}
    n_noise = 1 + 2 * (generator.log_size - 2)
    for i in range(n_noise):
        key = f"noises.noise_{i}"
        if key in sd:
            noise[f"noise_{i}"] = np.transpose(sd[key], (0, 2, 3, 1))
    variables = {"params": params}
    if noise:
        variables["noise"] = noise
    return variables


# ---------------------------------------------------------------------------
# e4e encoder (Encoder4Editing / IR-SE-50 layout)
# ---------------------------------------------------------------------------


def _bn(sd, prefix):
    return {
        "scale": np.asarray(sd[f"{prefix}.weight"]),
        "bias": np.asarray(sd[f"{prefix}.bias"]),
        "mean": np.asarray(sd[f"{prefix}.running_mean"]),
        "var": np.asarray(sd[f"{prefix}.running_var"]),
    }


torch_bn_params = _bn  # public alias (see torch_conv_kernel)


def convert_e4e_checkpoint(ckpt: Mapping, encoder) -> tuple[dict, np.ndarray]:
    """e4e ``{state_dict, latent_avg, opts}`` -> (encoder variables,
    latent_avg).  Only ``encoder.``-prefixed keys are consumed — the decoder
    half converts via ``convert_stylegan2_checkpoint`` (the e4e decoder is the
    same rosinality generator, `utils/model_utils.py:25`)."""
    full = ckpt["state_dict"] if "state_dict" in ckpt else ckpt
    sd = {
        k[len("encoder.") :]: np.asarray(v)
        for k, v in full.items()
        if k.startswith("encoder.")
    }
    if not sd:  # already stripped
        sd = {k: np.asarray(v) for k, v in full.items()}

    p: dict = {
        "input_conv": {"kernel": _conv(sd["input_layer.0.weight"])},
        "input_bn": _bn(sd, "input_layer.1"),
        "input_prelu": {"alpha": np.asarray(sd["input_layer.2.weight"])},
        "latlayer1": {
            "kernel": _conv(sd["latlayer1.weight"]),
            "bias": np.asarray(sd["latlayer1.bias"]),
        },
        "latlayer2": {
            "kernel": _conv(sd["latlayer2.weight"]),
            "bias": np.asarray(sd["latlayer2.bias"]),
        },
    }

    def _unit(src: str) -> dict:
        unit = {
            "bn1": _bn(sd, f"{src}.res_layer.0"),
            "conv1": {"kernel": _conv(sd[f"{src}.res_layer.1.weight"])},
            "prelu": {"alpha": np.asarray(sd[f"{src}.res_layer.2.weight"])},
            "conv2": {"kernel": _conv(sd[f"{src}.res_layer.3.weight"])},
            "bn2": _bn(sd, f"{src}.res_layer.4"),
            "se": {
                "fc1": {"kernel": _linear(sd[f"{src}.res_layer.5.fc1.weight"].reshape(
                    sd[f"{src}.res_layer.5.fc1.weight"].shape[:2]))},
                "fc2": {"kernel": _linear(sd[f"{src}.res_layer.5.fc2.weight"].reshape(
                    sd[f"{src}.res_layer.5.fc2.weight"].shape[:2]))},
            },
        }
        if f"{src}.shortcut_layer.0.weight" in sd:
            unit["shortcut_conv"] = {"kernel": _conv(sd[f"{src}.shortcut_layer.0.weight"])}
            unit["shortcut_bn"] = _bn(sd, f"{src}.shortcut_layer.1")
        return unit

    def _stack(trees: list) -> dict:
        """Stack a list of identical param trees along a new leading axis
        (the nn.scan / nn.vmap stacked-params layout)."""
        import jax

        return jax.tree.map(lambda *leaves: np.stack(leaves, axis=0), *trees)

    # body.{i} -> stage{s}_unit0 + scanned stage{s}_rest (stacked units 1..)
    i = 0
    for s, n_units in enumerate(encoder.unit_counts):
        p[f"stage{s}_unit0"] = _unit(f"body.{i}")
        i += 1
        rest = [_unit(f"body.{i + u}") for u in range(n_units - 1)]
        i += n_units - 1
        if rest:
            p[f"stage{s}_rest"] = {"block": _stack(rest)}

    # style heads -> 3 vmapped groups with stacked params
    def _head(h: int) -> dict:
        head: dict = {}
        k = 0
        while f"styles.{h}.convs.{2 * k}.weight" in sd:
            head[f"conv{k}"] = {
                "kernel": _conv(sd[f"styles.{h}.convs.{2 * k}.weight"]),
                "bias": np.asarray(sd[f"styles.{h}.convs.{2 * k}.bias"]),
            }
            k += 1
        head["linear"] = {
            "kernel": _linear(sd[f"styles.{h}.linear.weight"]),
            "bias": np.asarray(sd[f"styles.{h}.linear.bias"]),
        }
        return head

    n_coarse, n_middle, n_fine = encoder.head_group_sizes()
    start = 0
    for name, count in (("heads_coarse", n_coarse), ("heads_middle", n_middle),
                        ("heads_fine", n_fine)):
        if count:
            p[name] = _stack([_head(h) for h in range(start, start + count)])
            start += count

    latent_avg = np.asarray(ckpt.get("latent_avg")) if "latent_avg" in ckpt else None
    return {"params": p}, latent_avg


# ---------------------------------------------------------------------------
# stylegan2-ada discriminator (ffhq.pkl `D`, `attack_main2.py:934-938`)
# ---------------------------------------------------------------------------


def convert_ada_discriminator(tensors: Mapping, discriminator) -> dict:
    """ada-pkl ``D`` tensor paths -> our Discriminator variables.

    ``tensors`` is the ``{dotted_path: ndarray}`` dict from
    ``io.ada_pkl.load_network_pkl_tensors(...)['D']``; paths follow the ada
    module tree (``b{res}.fromrgb/conv0/conv1/skip``, ``b4.conv/fc/out``).
    Both frameworks runtime-scale weights by 1/sqrt(fan_in), so tensors
    transfer with layout transposes only.  The b4.fc input dim is re-ordered
    from ada's NCHW flatten to our NHWC flatten.
    """
    t = {k: np.asarray(v) for k, v in tensors.items()}
    size = discriminator.size
    p: dict = {
        "from_rgb": {
            "weight": _conv(t[f"b{size}.fromrgb.weight"]),
            "bias": np.asarray(t[f"b{size}.fromrgb.bias"]).reshape(-1),
        }
    }
    res = size
    while res > 4:
        p[f"block_{res}"] = {
            "conv1": {
                "weight": _conv(t[f"b{res}.conv0.weight"]),
                "bias": np.asarray(t[f"b{res}.conv0.bias"]).reshape(-1),
            },
            "conv2": {
                "weight": _conv(t[f"b{res}.conv1.weight"]),
                "bias": np.asarray(t[f"b{res}.conv1.bias"]).reshape(-1),
            },
            "skip": {"weight": _conv(t[f"b{res}.skip.weight"])},
        }
        res //= 2

    p["final_conv"] = {
        "weight": _conv(t["b4.conv.weight"]),
        "bias": np.asarray(t["b4.conv.bias"]).reshape(-1),
    }
    fc_w = np.asarray(t["b4.fc.weight"])  # (out, C*4*4) flattened NCHW
    out_f, in_f = fc_w.shape
    ch4 = in_f // 16
    fc_w = fc_w.reshape(out_f, ch4, 4, 4).transpose(0, 2, 3, 1).reshape(out_f, -1)
    p["final_fc"] = {"kernel": _linear(fc_w),
                     "bias": np.asarray(t["b4.fc.bias"]).reshape(-1)}
    p["out"] = {"kernel": _linear(t["b4.out.weight"]),
                "bias": np.asarray(t["b4.out.bias"]).reshape(-1)}
    return {"params": p}


# ---------------------------------------------------------------------------
# VGG16 (positional mapping, `vgg.py:66-76`)
# ---------------------------------------------------------------------------

_VGG_LAYERS = [
    "conv1_1", "conv1_2", "conv2_1", "conv2_2", "conv3_1", "conv3_2",
    "conv3_3", "conv4_1", "conv4_2",
]


def convert_vgg16_checkpoint(state: Mapping) -> dict:
    """Pretrained VGG16 state dict -> our VGG16 params, by *position* (the
    reference maps param-name lists index-by-index, `vgg.py:73-74`).  Works
    for torchvision ``features.N.weight`` layouts and the reference's
    conv-named layout alike; only the 9 convs the forward uses are taken."""
    tensors = [np.asarray(v) for v in state.values()]
    params = {}
    for i, name in enumerate(_VGG_LAYERS):
        w, b = tensors[2 * i], tensors[2 * i + 1]
        params[name] = {"kernel": _conv(w), "bias": np.asarray(b)}
    return {"params": params}
