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
