"""Data (C17/C18) + IO (C20/C21) + config (C19) tests."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from tpufusion.configs import AttackRunConfig, DATASET_N_DICT, ITER_DICT
from tpufusion.data import (
    BatchLoader,
    ImageFolderDataset,
    align_face,
    list_images,
    setup_loaders,
    transform_for,
)
from tpufusion.io import (
    ArtifactStore,
    load_image,
    new_adv_dir,
    new_run_folder,
    save_image,
    save_montage,
    write_parameters,
)
from tpufusion.utils import EasyDict, Logger, StepTimer


@pytest.fixture()
def image_dir(tmp_path):
    root = tmp_path / "imgs"
    (root / "sub").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(6):
        arr = (rng.rand(40, 40, 3) * 255).astype(np.uint8)
        sub = root / "sub" if i % 2 else root
        Image.fromarray(arr).save(sub / f"img_{i}.png")
    return str(root)


class TestDataset:
    def test_recursive_scan_sorted(self, image_dir):
        paths = list_images(image_dir)
        assert len(paths) == 6
        assert paths == sorted(paths)

    def test_dataset_getitem_range(self, image_dir):
        ds = ImageFolderDataset(image_dir, transform=transform_for("ffhq", "inference"))
        x = ds[0]
        assert x.shape == (256, 256, 3)
        assert x.min() >= -1.0 and x.max() <= 1.0

    def test_missing_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ImageFolderDataset(str(tmp_path / "empty"))

    def test_batch_loader_shapes(self, image_dir):
        ds = ImageFolderDataset(image_dir, transform=transform_for("church"))
        loader = BatchLoader(ds, np.arange(len(ds)), batch_size=2, seed=1)
        batches = list(loader)
        assert len(batches) == 3
        assert batches[0].shape == (2, 256, 256, 3)

    def test_setup_loaders_split_disjoint(self, image_dir):
        ds = ImageFolderDataset(image_dir)
        train, test = setup_loaders(ds, train_size=4, test_size=2,
                                    train_batch_size=1, test_batch_size=2)
        assert set(train.indices.tolist()).isdisjoint(test.indices.tolist())
        assert len(train.indices) == 4 and len(test.indices) == 2

    def test_cars_transform_size(self, image_dir):
        ds = ImageFolderDataset(image_dir, transform=transform_for("car"))
        assert ds[0].shape == (512, 512, 3)

    def test_prefetch_surfaces_dataset_errors(self, image_dir):
        """A __getitem__ error must reach the consumer — the prefetch
        worker used to swallow it and end the epoch early with NO error."""
        ds = ImageFolderDataset(image_dir)
        boom = RuntimeError("corrupt image")
        orig = type(ds).__getitem__

        class Flaky:
            def __init__(self, inner):
                self.inner = inner

            def __len__(self):
                return len(self.inner)

            def __getitem__(self, i):
                if i == 4:
                    raise boom
                return orig(self.inner, i)

        loader = BatchLoader(Flaky(ds), np.arange(6), batch_size=2,
                             shuffle=False, prefetch=2)
        with pytest.raises(RuntimeError, match="corrupt image"):
            list(loader)

    def test_prefetch_worker_exits_on_early_break(self, image_dir):
        """A consumer that stops iterating early must not leave the
        producer thread blocked on a full queue forever."""
        import threading

        ds = ImageFolderDataset(image_dir)
        before = set(t.ident for t in threading.enumerate())
        loader = BatchLoader(ds, np.arange(6), batch_size=1,
                             shuffle=False, prefetch=1)
        for batch in loader:
            break  # abandon after the first batch
        import gc
        import time

        gc.collect()  # finalize the abandoned generator -> stop event set
        deadline = time.time() + 5.0
        while time.time() < deadline:
            leftover = [t for t in threading.enumerate()
                        if t.ident not in before and t.is_alive()]
            if not leftover:
                break
            time.sleep(0.05)
        assert not leftover, "prefetch worker still alive after early break"

    def test_setup_loaders_empty_test_split_raises(self, image_dir):
        ds = ImageFolderDataset(image_dir)
        with pytest.raises(ValueError, match="test split"):
            setup_loaders(ds, train_size=6, test_size=2)


class TestAlignment:
    def test_align_with_synthetic_landmarks(self, image_dir):
        paths = list_images(image_dir)
        # plausible 68-point layout inside a 40x40 image
        lm = np.zeros((68, 2))
        lm[36:42] = [14, 16]  # left eye
        lm[42:48] = [26, 16]  # right eye
        lm[48:60] = [20, 28]  # mouth
        lm[48] = [15, 28]
        lm[54] = [25, 28]
        out = align_face(paths[0], lm, output_size=64, transform_size=64)
        assert out.size == (64, 64)


class TestArtifacts:
    def test_new_adv_dir_numbering(self, tmp_path):
        base = str(tmp_path / "runs")
        d0 = new_adv_dir(base, "ffhq_pgd")
        d1 = new_adv_dir(base, "ffhq_pgd")
        assert os.path.basename(d0).startswith("0_")
        assert os.path.basename(d1).startswith("1_")

    def test_parameters_record(self, tmp_path):
        run = new_run_folder(str(tmp_path / "run"))
        p = write_parameters(run, {"attack": "pgd", "lr": 0.01})
        text = open(p).read()
        assert "attack pgd" in text and "lr 0.01" in text
        assert os.path.exists(os.path.splitext(p)[0] + ".json")

    def test_artifact_store_roundtrip(self, tmp_path):
        store = ArtifactStore(str(tmp_path / "art"))
        store.append("all_inputs", np.ones((2, 4)))
        store.append("all_inputs", np.zeros((3, 4)))
        written = store.flush()
        data = ArtifactStore.load(written["all_inputs"])
        assert data.shape == (5, 4)


class TestImagesIO:
    def test_save_load_roundtrip(self, tmp_path):
        img = np.random.RandomState(0).uniform(-1, 1, (1, 16, 16, 3)).astype(np.float32)
        p = save_image(img, str(tmp_path / "x.png"))
        back = load_image(p)
        assert back.shape == (1, 16, 16, 3)
        np.testing.assert_allclose(back, np.clip(img, -1, 1), atol=2 / 255 + 1e-3)

    def test_montage_grid(self, tmp_path):
        batch = np.zeros((5, 8, 8, 3), np.float32)
        p = save_montage(batch, str(tmp_path / "grid.png"), nrow=3)
        im = Image.open(p)
        assert im.size[0] > 8 * 3  # 3 cols + padding


class TestUtils:
    def test_easydict(self):
        d = EasyDict(a=1)
        d.b = 2
        assert d.a == 1 and d["b"] == 2
        with pytest.raises(AttributeError):
            _ = d.missing

    def test_logger_tee(self, tmp_path, capsys):
        log = str(tmp_path / "log.txt")
        with Logger(log):
            print("hello-tee")
        assert "hello-tee" in open(log).read()

    def test_logger_tees_stderr(self, tmp_path, capsys):
        """Crash tracebacks/warnings go to stderr — they must reach the
        log file too (the dnnlib Logger behaviour)."""
        import sys

        log = str(tmp_path / "log.txt")
        with Logger(log):
            print("to-stderr", file=sys.stderr)
        content = open(log).read()
        assert "to-stderr" in content
        assert sys.stderr is not None and not isinstance(
            sys.stderr, Logger)  # restored on close

    def test_write_parameters_json_merges(self, tmp_path):
        from tpufusion.io.artifacts import write_parameters
        import json as _json

        write_parameters(str(tmp_path), {"a": 1, "b": "x"})
        write_parameters(str(tmp_path), {"b": "y", "c": 3})
        txt = open(tmp_path / "parameters.txt").read()
        assert txt.count("b ") == 2  # append-only txt keeps both records
        rec = _json.load(open(tmp_path / "parameters.json"))
        assert rec == {"a": 1, "b": "y", "c": 3}  # sidecar merged, later wins

    def test_step_timer(self):
        t = StepTimer()
        for _ in range(3):
            t.start()
            t.stop()
        assert t.steps_per_sec() > 0


class TestConfigs:
    def test_iter_dict_reference_values(self):
        assert ITER_DICT[1024] == 100 and ITER_DICT[256] == 50
        assert DATASET_N_DICT == {"ffhq": 5, "car": 4, "church": 3}

    def test_run_postfix_schemes(self):
        cfg = AttackRunConfig(dataset_name="ffhq", lr=0.005, which_adv=[0, 1])
        assert cfg.run_postfix("white_box_target", 1024) == \
            "ffhq_white_box_target_100_0.00500_[0,1]"
        assert cfg.run_postfix("patch_white_box", 1024) == \
            "ffhq_patch_white_box_2000_50_0.100"
        assert cfg.run_postfix("dp_noise", 1024) == "ffhq_dp_noise"


class TestMiscParity:
    def test_aggregate_loss_dict(self):
        from tpufusion.utils.logging import aggregate_loss_dict

        out = aggregate_loss_dict([{"a": 1.0, "b": 2.0}, {"a": 3.0}])
        assert out == {"a": 2.0, "b": 2.0}

    def test_comparison_grid(self, tmp_path):
        from tpufusion.io.images import save_comparison_grid

        img = np.zeros((8, 8, 3), np.float32)
        p = save_comparison_grid(
            [dict(input_face=img, target_face=img, output_face=img)] * 2,
            str(tmp_path / "cmp.png"),
        )
        from PIL import Image

        assert Image.open(p).size == (24, 16)
