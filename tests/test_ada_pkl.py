"""Permissive pkl loader tests — stub-unpickling + tensor harvesting."""

import pickle

import numpy as np
import pytest

from tpufusion.io.ada_pkl import (
    collect_tensors,
    load_network_pkl_tensors,
    load_pkl_permissive,
)


class _FakeModule:
    """Simulates a pickled torch-like module with private param dicts."""

    def __init__(self):
        self._parameters = {"weight": np.ones((4, 3)), "bias": np.zeros(4)}
        self._buffers = {}
        self._modules = {"sub": None}
        self.extra = [np.full((2,), 7.0)]


def _make_pkl(tmp_path, obj, rename_module=None):
    path = tmp_path / "net.pkl"
    payload = pickle.dumps(obj)
    if rename_module:
        old, new = rename_module
        payload = payload.replace(old.encode(), new.encode())
    path.write_bytes(payload)
    return str(path)


class TestPermissiveUnpickle:
    def test_loads_unknown_classes_as_stubs(self, tmp_path):
        obj = {"D": _FakeModule(), "meta": "x"}
        # rewrite the module path so unpickling can't find the real class
        path = _make_pkl(tmp_path, obj,
                         rename_module=("test_ada_pkl", "gone_mod_pkl"))  # equal length
        loaded = load_pkl_permissive(path)
        assert "D" in loaded
        assert type(loaded["D"]).__name__ == "_FakeModule"
        assert type(loaded["D"]).__module__ == "gone_mod_pkl"

    def test_collect_tensors_paths(self):
        m = _FakeModule()
        tensors = collect_tensors({"D": m})
        assert "D.weight" in tensors and tensors["D.weight"].shape == (4, 3)
        assert "D.bias" in tensors
        assert "D.extra.0" in tensors

    def test_load_network_pkl_tensors(self, tmp_path):
        obj = {"G": _FakeModule(), "D": _FakeModule()}
        path = _make_pkl(tmp_path, obj,
                         rename_module=("test_ada_pkl", "torch_utils_"))  # equal length
        nets = load_network_pkl_tensors(path)
        assert set(nets) == {"G", "D"}
        assert nets["D"]["weight"].shape == (4, 3)

    def test_handles_cycles(self):
        a = {"x": np.ones(2)}
        a["self"] = a  # cycle
        tensors = collect_tensors(a)
        assert "x" in tensors


class TestAdaDiscriminatorConversion:
    def _synthetic_ada_d(self, size=32, ch=512):
        """ada-layout D tensor dict for our tiny Discriminator shapes."""
        rng = np.random.RandomState(3)
        t = {
            f"b{size}.fromrgb.weight": rng.randn(ch, 3, 1, 1).astype(np.float32),
            f"b{size}.fromrgb.bias": rng.randn(ch).astype(np.float32),
        }
        res = size
        while res > 4:
            t[f"b{res}.conv0.weight"] = rng.randn(ch, ch, 3, 3).astype(np.float32)
            t[f"b{res}.conv0.bias"] = rng.randn(ch).astype(np.float32)
            t[f"b{res}.conv1.weight"] = rng.randn(ch, ch, 3, 3).astype(np.float32)
            t[f"b{res}.conv1.bias"] = rng.randn(ch).astype(np.float32)
            t[f"b{res}.skip.weight"] = rng.randn(ch, ch, 1, 1).astype(np.float32)
            res //= 2
        t["b4.conv.weight"] = rng.randn(ch, ch + 1, 3, 3).astype(np.float32)
        t["b4.conv.bias"] = rng.randn(ch).astype(np.float32)
        t["b4.fc.weight"] = rng.randn(ch, ch * 16).astype(np.float32)
        t["b4.fc.bias"] = rng.randn(ch).astype(np.float32)
        t["b4.out.weight"] = rng.randn(1, ch).astype(np.float32)
        t["b4.out.bias"] = rng.randn(1).astype(np.float32)
        return t

    def test_convert_and_score(self):
        import jax
        import jax.numpy as jnp

        from tpufusion.core.dtypes import Policy
        from tpufusion.io.checkpoint import convert_ada_discriminator
        from tpufusion.models.discriminator import Discriminator, realism_scores

        d = Discriminator(size=32, channel_multiplier=1, policy=Policy())
        variables = convert_ada_discriminator(self._synthetic_ada_d(), d)
        # tree must align with a fresh init (every param consumed, same shape)
        ref = jax.jit(d.init)(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
        flat_ref = dict(jax.tree_util.tree_leaves_with_path(ref["params"]))
        flat_new = dict(jax.tree_util.tree_leaves_with_path(variables["params"]))
        assert set(flat_ref) == set(flat_new)
        for k in flat_ref:
            assert flat_ref[k].shape == np.asarray(flat_new[k]).shape, k
        imgs = jax.random.uniform(jax.random.key(1), (4, 32, 32, 3),
                                  minval=-1, maxval=1)
        scores = realism_scores(d, jax.tree.map(jnp.asarray, variables), imgs)
        assert scores.shape == (4,)
        assert bool(jnp.all(jnp.isfinite(scores)))

    def test_via_pkl_roundtrip(self, tmp_path):
        """Full path: pickle -> permissive load -> convert -> score (the CLI
        --discriminator_ckpt flow)."""
        import pickle

        import torch

        from tpufusion.io.ada_pkl import load_network_pkl_tensors

        t = {k: torch.from_numpy(v) for k, v in self._synthetic_ada_d().items()}
        path = tmp_path / "ffhq_like.pkl"
        with open(path, "wb") as f:
            pickle.dump({"D": t, "G": {}}, f)
        nets = load_network_pkl_tensors(str(path))
        assert "D" in nets
        assert f"b32.fromrgb.weight" in nets["D"]
