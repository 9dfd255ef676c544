"""Dtype policy for the whole framework.

The reference runs everything in fp32 on CUDA.  On TPU the MXU wants bf16
matmuls/convs with fp32 accumulation, so the framework threads an explicit
policy through every model: parameters are stored fp32, compute runs bf16 (on
TPU) with fp32 loss/statistics accumulation.  Tests on CPU force fp32 so
golden values are stable.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Mixed-precision policy.

    param_dtype:   storage dtype of weights.
    compute_dtype: dtype activations/weights are cast to inside layers.
    accum_dtype:   dtype for reductions (losses, statistics, demod sums).
    """

    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.float32
    accum_dtype: jnp.dtype = jnp.float32

    def cast(self, x):
        return jax.tree.map(
            lambda a: a.astype(self.compute_dtype)
            if isinstance(a, jax.Array) and jnp.issubdtype(a.dtype, jnp.floating)
            else a,
            x,
        )


def _on_tpu() -> bool:
    try:
        return jax.default_backend() in ("tpu", "axon")
    except Exception:  # pragma: no cover - backend probing should not fail
        return False


_DEFAULT: Policy | None = None


def default_policy() -> Policy:
    """fp32 params everywhere; bf16 compute on TPU, fp32 on CPU."""
    global _DEFAULT
    if _DEFAULT is None:
        if _on_tpu():
            _DEFAULT = Policy(compute_dtype=jnp.bfloat16)
        else:
            _DEFAULT = Policy()
    return _DEFAULT


def set_default_policy(policy: Policy) -> None:
    global _DEFAULT
    _DEFAULT = policy
