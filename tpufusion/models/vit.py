"""Native ViT image classifier — the cars ("stanford-car-vit-patch16")
model the reference attacks with torchattacks PGD/CW
(`/root/reference/code/attack/interpolation.py:1294-1295,1355`).

Previously served through transformers' Flax ViT; rebuilt natively here
(VERDICT r3 ask #7) so the cars path is implemented + converter-cross-
validated like every other model in the stack.  Architecture is the
standard ViT-B/16 encoder the HF checkpoint carries: patch-conv embedding,
cls token + learned position embeddings, pre-LN transformer blocks with
exact-GELU MLPs, final LN, linear head on the cls token.

TPU-first notes: one (B, N, H) @ (H, H) matmul per projection (MXU-sized),
bf16 compute with fp32 LayerNorm/softmax accumulation via the shared
``Policy``, no dynamic shapes — the whole forward is one fused XLA program
under jit.  ``convert_vit_checkpoint`` ingests the HF torch layout
(``vit.embeddings...``, ``vit.encoder.layer.N...``, ``classifier.*``) and
is numerically cross-validated against an independent torch oracle in
``tests/torch_ref.py`` (``ViTT``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from tpufusion.core.dtypes import Policy, default_policy


class ViTBlock(nn.Module):
    hidden_size: int
    num_heads: int
    intermediate_size: int
    policy: Policy

    @nn.compact
    def __call__(self, x):
        dt = self.policy.compute_dtype
        H, nh = self.hidden_size, self.num_heads
        dh = H // nh
        # LayerNorm in fp32 (bf16 mean/var loses precision at H=768)
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="ln_before")(x)
        h = h.astype(dt)
        q = nn.Dense(H, dtype=dt, name="query")(h)
        k = nn.Dense(H, dtype=dt, name="key")(h)
        v = nn.Dense(H, dtype=dt, name="value")(h)
        B, N, _ = q.shape
        q = q.reshape(B, N, nh, dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, N, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, N, nh, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum(
            "bhnd,bhmd->bhnm", q, k,
            preferred_element_type=jnp.float32) / np.sqrt(dh)
        attn = jax.nn.softmax(logits, axis=-1).astype(dt)
        ctx = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        ctx = ctx.transpose(0, 2, 1, 3).reshape(B, N, H)
        x = x + nn.Dense(H, dtype=dt, name="attn_out")(ctx)
        h = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="ln_after")(x).astype(dt)
        h = nn.Dense(self.intermediate_size, dtype=dt, name="mlp_in")(h)
        h = jax.nn.gelu(h, approximate=False)  # HF 'gelu' is the erf form
        return x + nn.Dense(H, dtype=dt, name="mlp_out")(h)


class ViTClassifier(nn.Module):
    """``__call__(images_nhwc) -> (B, num_labels)`` logits."""

    num_labels: int
    image_size: int = 224
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    policy: Policy = dataclasses.field(default_factory=default_policy)

    @nn.compact
    def __call__(self, x):
        dt = self.policy.compute_dtype
        p = self.patch_size
        H = self.hidden_size
        x = nn.Conv(H, (p, p), strides=(p, p), padding="VALID", dtype=dt,
                    param_dtype=self.policy.param_dtype,
                    name="patch_proj")(x.astype(dt))
        B, gh, gw, _ = x.shape
        x = x.reshape(B, gh * gw, H)
        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, H),
                         jnp.float32)
        pos = self.param("pos_emb",
                         nn.initializers.truncated_normal(0.02),
                         (1, gh * gw + 1, H), jnp.float32)
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dt), (B, 1, H)), x], axis=1)
        x = x + pos.astype(dt)
        for i in range(self.num_layers):
            x = ViTBlock(H, self.num_heads, self.intermediate_size,
                         self.policy, name=f"block{i}")(x)
        x = nn.LayerNorm(epsilon=1e-12, dtype=jnp.float32,
                         name="ln_final")(x)
        return nn.Dense(self.num_labels, dtype=jnp.float32,
                        name="head")(x[:, 0])


def create_vit(key: jax.Array, num_labels: int,
               policy: Optional[Policy] = None, **kwargs):
    policy = policy or default_policy()
    model = ViTClassifier(num_labels=num_labels, policy=policy, **kwargs)
    x = jnp.zeros((1, model.image_size, model.image_size, 3),
                  policy.compute_dtype)
    variables = jax.jit(model.init)(key, x)
    return model, variables


def _dense(state, prefix):
    # the shared torch (out, in) -> flax (in, out) layout definition
    from tpufusion.io.checkpoint import torch_linear_kernel

    return dict(kernel=jnp.asarray(torch_linear_kernel(state[prefix + ".weight"])),
                bias=jnp.asarray(np.asarray(state[prefix + ".bias"])))


def _ln(state, prefix):
    return dict(scale=jnp.asarray(np.asarray(state[prefix + ".weight"])),
                bias=jnp.asarray(np.asarray(state[prefix + ".bias"])))


def convert_vit_checkpoint(state: dict, model: ViTClassifier) -> dict:
    """HF ``ViTForImageClassification`` torch state dict -> variables.

    Key layout: ``vit.embeddings.{cls_token,position_embeddings,
    patch_embeddings.projection.*}``, ``vit.encoder.layer.{i}.*``,
    ``vit.layernorm.*``, ``classifier.*``.
    """
    emb = "vit.embeddings"
    proj_w = np.asarray(state[f"{emb}.patch_embeddings.projection.weight"])
    params = {
        "cls_token": jnp.asarray(np.asarray(state[f"{emb}.cls_token"])),
        "pos_emb": jnp.asarray(
            np.asarray(state[f"{emb}.position_embeddings"])),
        # torch conv (O, I, kh, kw) -> flax (kh, kw, I, O)
        "patch_proj": dict(
            kernel=jnp.asarray(proj_w.transpose(2, 3, 1, 0)),
            bias=jnp.asarray(np.asarray(
                state[f"{emb}.patch_embeddings.projection.bias"]))),
        "ln_final": _ln(state, "vit.layernorm"),
        "head": _dense(state, "classifier"),
    }
    for i in range(model.num_layers):
        L = f"vit.encoder.layer.{i}"
        params[f"block{i}"] = {
            "ln_before": _ln(state, f"{L}.layernorm_before"),
            "query": _dense(state, f"{L}.attention.attention.query"),
            "key": _dense(state, f"{L}.attention.attention.key"),
            "value": _dense(state, f"{L}.attention.attention.value"),
            "attn_out": _dense(state, f"{L}.attention.output.dense"),
            "ln_after": _ln(state, f"{L}.layernorm_after"),
            "mlp_in": _dense(state, f"{L}.intermediate.dense"),
            "mlp_out": _dense(state, f"{L}.output.dense"),
        }
    return {"params": params}
