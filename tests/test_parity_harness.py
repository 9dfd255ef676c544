"""Tests for tools/parity_check.py — the reference-image parity harness."""

import importlib.util
import json
import os
import sys

import numpy as np
import pytest


@pytest.fixture(scope="module")
def parity():
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "parity_check", os.path.join(root, "tools", "parity_check.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestParityHarness:
    def test_ci_mode_self_check(self, parity, tmp_path):
        """Export a reference-layout image set from a tiny pipeline, then
        check ourselves against it: every target within tolerance."""
        json_out = str(tmp_path / "parity.json")
        rc = parity.run(["--ci", "--out", str(tmp_path / "imgs"),
                         "--json", json_out])
        assert rc == 0
        rows = json.load(open(json_out))
        assert len(rows) == 6  # 3 targets x 2 modes
        assert all(r["status"] == "ok" for r in rows)
        # geometry sanity: the exported montages have vutils dimensions
        from PIL import Image

        img = Image.open(tmp_path / "imgs" / "arith_org_inputs_0.jpg")
        s, n = 32, 5
        assert img.size == (n * (s + 2) + 2, s + 4)
        partial = Image.open(tmp_path / "imgs" / "spatial_partial_fusion_0_all.jpg")
        assert partial.size == ((n + 1) * (s + 2) + 2, s + 4)

    def test_detects_mismatch(self, parity, tmp_path):
        """A corrupted reference fused image must FAIL the check."""
        import jax

        from tpufusion.pipeline import create_test_pipeline

        imgs = tmp_path / "imgs"
        pipeline = create_test_pipeline("church", jax.random.key(0), size=32)
        parity.export_reference_layout(pipeline, str(imgs), jax.random.key(1))
        # corrupt the arith fused target
        from PIL import Image

        bad = np.zeros((32, 32, 3), np.uint8)
        Image.fromarray(bad).save(imgs / "arith_org_fusion_0.jpg")
        rows = parity.check_mode(pipeline, str(imgs), "arith", None, 0.15)
        by_target = {r["target"]: r for r in rows}
        assert by_target["org_fusion"]["status"] == "FAIL"
        assert by_target["org_without_fusion"]["status"] == "ok"

    def test_mae_psnr_metrics(self, parity):
        a = np.zeros((4, 4, 3), np.float32)
        b = np.full((4, 4, 3), 0.2, np.float32)
        assert abs(parity.mae(a, b) - 0.1) < 1e-6
        assert parity.psnr(a, a) > 100
