"""Classifier adapters for the classifier-transfer attacks — reference C13.

The reference attacks two external classifiers with torchattacks PGD/CW:
- FFHQ: a torchvision resnet18 gender model (`interpolation.py:1296-1302`)
  -> ``tpufusion.models.resnet`` (native flax + converter);
- cars: the ``stanford-car-vit-patch16`` HF ViT (`interpolation.py:1294,1355`)
  -> adapted here via transformers' Flax ViT.

Each adapter yields a pure ``logits_fn(images_nhwc_pm1) -> (B, K)`` suitable
for ``attacks.pgd.make_pgd`` / ``attacks.cw.make_cw``.  Inputs follow this
framework's NHWC [-1, 1] convention; resizing to the classifier's input size
happens inside the differentiated graph (the reference resizes to 224 before
attacking, `interpolation.py:1361-1365`).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

from tpufusion.core.imaging import resize_bilinear
from tpufusion.models.resnet import ResNet, convert_resnet18_checkpoint, create_resnet18


def resnet_logits_fn(model: ResNet, variables, input_size: int = 256) -> Callable:
    """Gender-classifier adapter (ffhq): returns
    ``logits(variables_, images) -> (B, 2)`` — params are an explicit first
    argument so jitted attack programs thread them as inputs (never closure
    constants).  ``variables`` here is only the default bundle callers may
    pass back in."""

    def logits(variables_, images):
        x = images
        if x.shape[1] != input_size:
            x = resize_bilinear(x, input_size, input_size)
        return model.apply(variables_, x)

    return logits


def resolve_vit_backend(pretrained_dir: Optional[str]) -> str:
    """``backend='auto'`` rule: native unless ``pretrained_dir`` holds ONLY
    flax-serialized weights (``flax_model.msgpack`` with no
    ``pytorch_model.bin``/``model.safetensors``) — those dirs loaded fine
    through the flax adapter before the native backend existed and must
    keep working."""
    if pretrained_dir:
        import os

        has_torch = any(
            os.path.exists(os.path.join(pretrained_dir, n))
            for n in ("pytorch_model.bin", "model.safetensors"))
        if not has_torch and os.path.exists(
                os.path.join(pretrained_dir, "flax_model.msgpack")):
            return "flax_hf"
    return "native"


def create_vit_classifier(
    num_labels: int,
    *,
    image_size: int = 224,
    patch_size: int = 16,
    hidden_size: int = 768,
    num_layers: int = 12,
    num_heads: int = 12,
    intermediate_size: int = 3072,
    pretrained_dir: Optional[str] = None,
    seed: int = 0,
    backend: str = "auto",
    policy=None,
):
    """Build (or load) the cars ViT classifier (vit-patch16 @224).

    ``backend='native'`` serves the model through
    ``tpufusion.models.vit.ViTClassifier`` — implemented and converter-
    cross-validated like every other model (VERDICT r3 ask #7);
    ``backend='flax_hf'`` keeps the transformers Flax adapter for loading
    HF model dirs without a torch weights file.  ``backend='auto'``
    (default) picks native unless ``pretrained_dir`` holds ONLY
    flax-serialized weights (``flax_model.msgpack``), in which case it
    falls back to the flax adapter — so previously-working flax-only HF
    dirs keep loading.  ``pretrained_dir`` points at a locally downloaded
    HF model dir (zero-egress: no hub fetches); the native backend reads
    its ``pytorch_model.bin`` / ``model.safetensors`` through
    ``convert_vit_checkpoint``.

    Returns ``(logits_fn, params)`` with
    ``logits_fn(params, images_nhwc_pm1) -> (B, num_labels)``.
    """
    if backend == "auto":
        backend = resolve_vit_backend(pretrained_dir)
    if backend == "native":
        from tpufusion.models.vit import (
            ViTClassifier,
            convert_vit_checkpoint,
            create_vit,
        )

        kwargs = dict(
            image_size=image_size, patch_size=patch_size,
            hidden_size=hidden_size, num_layers=num_layers,
            num_heads=num_heads, intermediate_size=intermediate_size,
        )
        if pretrained_dir:
            import os

            from tpufusion.io.checkpoint import load_torch_state_dict

            state = None
            for name in ("pytorch_model.bin", "model.safetensors"):
                p = os.path.join(pretrained_dir, name)
                if os.path.exists(p):
                    state = load_torch_state_dict(p)
                    break
            if state is None:
                raise FileNotFoundError(
                    f"{pretrained_dir}: no pytorch_model.bin / "
                    "model.safetensors (use backend='flax_hf' for "
                    "flax-serialized HF dirs)")
            from tpufusion.core.dtypes import default_policy

            model = ViTClassifier(num_labels=num_labels,
                                  policy=policy or default_policy(), **kwargs)
            params = convert_vit_checkpoint(state, model)
        else:
            model, params = create_vit(jax.random.key(seed), num_labels,
                                       policy=policy, **kwargs)
        size = model.image_size

        def logits_fn(params_, images):
            x = images
            if x.shape[1] != size:
                x = resize_bilinear(x, size, size)
            return model.apply(params_, x)

        return logits_fn, params

    if backend != "flax_hf":
        raise ValueError(f"unknown ViT backend {backend!r}")
    from transformers import FlaxViTForImageClassification, ViTConfig

    if pretrained_dir:
        model = FlaxViTForImageClassification.from_pretrained(pretrained_dir)
    else:
        config = ViTConfig(
            image_size=image_size, patch_size=patch_size, hidden_size=hidden_size,
            num_hidden_layers=num_layers, num_attention_heads=num_heads,
            intermediate_size=intermediate_size, num_labels=num_labels,
        )
        model = FlaxViTForImageClassification(config, seed=seed)
    params = model.params
    size = model.config.image_size

    def logits_fn(params_, images):
        x = images
        if x.shape[1] != size:
            x = resize_bilinear(x, size, size)
        # HF ViT wants NCHW pixel_values; [-1,1] matches its default
        # (ViTImageProcessor normalises with mean/std .5)
        x = jnp.transpose(x, (0, 3, 1, 2))
        return model(x, params=params_).logits

    return logits_fn, params


def load_gender_classifier(checkpoint_path: Optional[str], key=None,
                           policy=None):
    """The FFHQ gender model: torchvision resnet18 with a 2-way head
    (`interpolation.py:1296-1302`).  Random init when no checkpoint."""
    key = key if key is not None else jax.random.key(0)
    model, variables = create_resnet18(key, num_classes=2, policy=policy)
    if checkpoint_path:
        from tpufusion.io.checkpoint import load_torch_state_dict

        state = load_torch_state_dict(checkpoint_path)
        variables = convert_resnet18_checkpoint(state, model)
    return resnet_logits_fn(model, variables), variables
