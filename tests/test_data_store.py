"""Data layer + feature store tests."""

import json

import numpy as np
import pytest
from PIL import Image

from summer_clip_tpu import data as D
from summer_clip_tpu.store import FeatureStore, import_torch_features


class TestCore:
    def test_fewshot_balanced(self):
        data = [D.Datum(label=i % 5, classname=f"c{i % 5}") for i in range(100)]
        rng = np.random.default_rng(0)
        out = D.generate_fewshot(data, 3, rng=rng)
        assert len(out) == 15
        labels = np.asarray([d.label for d in out])
        for c in range(5):
            assert (labels == c).sum() == 3

    def test_fewshot_repeat_small_class(self):
        data = [D.Datum(label=0)] * 2 + [D.Datum(label=1)] * 10
        out = D.generate_fewshot(data, 4, rng=np.random.default_rng(0))
        labels = np.asarray([d.label for d in out])
        assert (labels == 0).sum() == 4 and (labels == 1).sum() == 4

    def test_split_roundtrip(self, tmp_path):
        items = [D.Datum(impath=str(tmp_path / f"img/{i}.jpg"), label=i % 2, classname=f"c{i % 2}")
                 for i in range(6)]
        D.save_split(items[:3], items[3:4], items[4:], tmp_path / "split.json", tmp_path)
        tr, va, te = D.read_split(tmp_path / "split.json", tmp_path)
        assert len(tr) == 3 and len(va) == 1 and len(te) == 2
        assert tr[0].impath == items[0].impath
        assert tr[0].classname == "c0"

    def test_split_trainval(self):
        items = [D.Datum(label=i % 3) for i in range(30)]
        tr, va = D.split_trainval(items, p_val=0.2, rng=np.random.default_rng(1))
        assert len(tr) + len(va) == 30
        assert len(va) == 6  # 2 per class


class TestTransforms:
    def _img(self, w=50, h=40):
        arr = (np.random.RandomState(0).rand(h, w, 3) * 255).astype(np.uint8)
        return Image.fromarray(arr)

    def test_eval_transform_shape_and_norm(self):
        t = D.EvalTransform(32)
        out = t(self._img())
        assert out.shape == (32, 32, 3)
        assert out.dtype == np.float32

    def test_train_transform_shape(self):
        t = D.TrainTransform(32)
        out = t(self._img(), np.random.default_rng(0))
        assert out.shape == (32, 32, 3)

    def test_train_transform_deterministic_given_rng(self):
        t = D.TrainTransform(16)
        a = t(self._img(), np.random.default_rng(7))
        b = t(self._img(), np.random.default_rng(7))
        np.testing.assert_array_equal(a, b)

    def test_device_normalize_uint8_path_matches_float(self):
        """uint8 transform output + host-side replica of the device normalize
        must equal the float32 transform output exactly (same math/order)."""
        img = self._img()
        f = D.EvalTransform(32)(img)
        u = D.EvalTransform(32, device_normalize=True)(img)
        assert u.dtype == np.uint8 and u.shape == f.shape
        renorm = (u.astype(np.float32) / 255.0 - D.CLIP_MEAN) / D.CLIP_STD
        np.testing.assert_allclose(renorm, f, atol=1e-6)
        # train path: identical crop/flip decisions given the same rng
        tf = D.TrainTransform(16)(img, np.random.default_rng(3))
        tu = D.TrainTransform(16, device_normalize=True)(img, np.random.default_rng(3))
        renorm = (tu.astype(np.float32) / 255.0 - D.CLIP_MEAN) / D.CLIP_STD
        np.testing.assert_allclose(renorm, tf, atol=1e-6)

    def test_session_encodes_uint8_batch_like_float(self):
        """ClipSession normalizes uint8 batches on device; features must match
        the pre-normalized float path."""
        import jax.numpy as jnp

        from summer_clip_tpu.apps.common import create_clip_session

        session = create_clip_session("test-vit")
        rng = np.random.RandomState(0)
        raw = rng.randint(0, 256, (4, 32, 32, 3)).astype(np.uint8)
        normed = (raw.astype(np.float32) / 255.0 - D.CLIP_MEAN) / D.CLIP_STD
        f_u8 = np.asarray(session.encode_image(raw))
        f_f32 = np.asarray(session.encode_image(jnp.asarray(normed)))
        np.testing.assert_allclose(f_u8, f_f32, atol=2e-5, rtol=2e-5)


class TestSyntheticAndBatching:
    def test_synthetic_dataset(self):
        ds = D.SyntheticDataset(num_classes=3, per_class=4, image_size=16)
        assert ds.num_classes == 3
        assert len(ds.train_x) == 12
        assert ds.classnames == ["class 0", "class 1", "class 2"]

    def test_synthetic_batcher_fixed_shapes(self):
        ds = D.SyntheticDataset(num_classes=3, per_class=3, image_size=16)
        b = D.SyntheticBatcher(ds.train_x, batch_size=4, image_size=16)
        batches = list(b)
        assert len(batches) == 3  # 9 items, bs 4 -> 3 batches
        for batch in batches:
            assert batch.images.shape == (4, 16, 16, 3)
            assert batch.labels.shape == (4,)
        assert batches[-1].mask.sum() == 1  # 9 = 4+4+1

    def test_image_batcher_label_only(self):
        ds = D.SyntheticDataset(num_classes=2, per_class=5)
        batcher = D.ImageBatcher(ds.train_x, batch_size=4, load_images=False)
        batches = list(batcher)
        assert all(b.images is None for b in batches)
        labels = np.concatenate([b.labels[b.mask] for b in batches])
        np.testing.assert_array_equal(labels, D.labels_of(ds.train_x))

    def test_image_batcher_real_files(self, tmp_path):
        paths = []
        for i in range(5):
            p = tmp_path / f"{i}.png"
            Image.fromarray((np.full((20, 24, 3), i * 40)).astype(np.uint8)).save(p)
            paths.append(p)
        data = [D.Datum(impath=str(p), label=i % 2) for i, p in enumerate(paths)]
        batcher = D.ImageBatcher(data, batch_size=2, transform=D.EvalTransform(16))
        batches = list(batcher)
        assert len(batches) == 3
        assert batches[0].images.shape == (2, 16, 16, 3)
        assert batches[-1].mask.tolist() == [True, False]

    def test_k_tfm_multiview(self):
        """k_tfm > 1 yields (B, K, H, W, 3) stacked views with independent
        augmentation randomness (reference DatasetWrapper k_tfm,
        tip_adapter/datasets/utils.py:315-341)."""
        from summer_clip_tpu.data.transforms import TrainTransform

        ds = D.SyntheticDataset(num_classes=2, per_class=4, image_size=16)
        view = D.DatasetView("synthetic", "train", "", shots=-1, input_size=16,
                             is_train=True, k_tfm=3)
        assert view.k_tfm == 3
        b = list(view.batcher(batch_size=4))[0]
        assert b.images.shape == (4, 3, 16, 16, 3)

        # real-file path: distinct views from the stochastic transform
        del ds

    def test_k_tfm_eval_forced_single(self):
        view = D.DatasetView("synthetic", "test", "", shots=-1, input_size=16,
                             is_train=False, k_tfm=4)
        assert view.k_tfm == 1  # only allowed during training (utils.py:322)

    def test_k_tfm_views_differ_on_real_image(self, tmp_path):
        from summer_clip_tpu.data.transforms import TrainTransform

        p = tmp_path / "img.png"
        Image.fromarray(np.random.RandomState(0).randint(
            0, 255, (64, 48, 3), np.uint8)).save(p)
        data = [D.Datum(impath=str(p), label=0)]
        batcher = D.ImageBatcher(data, batch_size=1,
                                 transform=TrainTransform(16), k_tfm=2)
        b = list(batcher)[0]
        assert b.images.shape == (1, 2, 16, 16, 3)
        assert not np.array_equal(b.images[0, 0], b.images[0, 1])

    def test_registry_has_11_datasets(self):
        expected = {"caltech101", "oxford_pets", "food101", "oxford_flowers", "dtd",
                    "sun397", "ucf101", "stanford_cars", "eurosat", "fgvc", "imagenet"}
        assert expected.issubset(set(D.DATASET_REGISTRY))

    def test_imagenet_label_mapping_hardened(self, tmp_path, monkeypatch):
        """Positional wnid->classname mapping must fail loudly on a count
        mismatch instead of silently shifting labels (VERDICT r2 #7;
        reference pins 1000 names, tip_adapter/datasets/imagenet.py:11-175)."""
        from summer_clip_tpu.data import datasets as ds_mod

        names = ["tabby", "husky", "jay"]
        monkeypatch.setattr(ds_mod, "_imagenet_assets",
                            lambda: (names, ["a photo of a {}."]))
        base = tmp_path / "imagenet"
        for split in ("train", "val"):
            for wnid in ("n01", "n02", "n03"):
                d = base / split / wnid
                d.mkdir(parents=True)
                (d / "x.JPEG").write_bytes(b"")

        ds = ds_mod.ImageNetDataset(str(tmp_path), num_shots=-1)
        assert [d.classname for d in ds.test[:3]] == ["tabby", "husky", "jay"]
        assert sorted({d.label for d in ds.train_x}) == [0, 1, 2]

        # missing class dir in val -> loud failure, not shifted labels
        import shutil
        shutil.rmtree(base / "val" / "n02")
        with pytest.raises(ValueError, match="class dirs"):
            ds_mod.ImageNetDataset(str(tmp_path), num_shots=-1)

        # restore count but with a DIFFERENT wnid -> train/val disagree
        (base / "val" / "n04" / ".keep").parent.mkdir(parents=True)
        (base / "val" / "n04" / "x.JPEG").write_bytes(b"")
        with pytest.raises(ValueError, match="differ"):
            ds_mod.ImageNetDataset(str(tmp_path), num_shots=-1)

    def test_extract_archive_tar_and_zip(self, tmp_path):
        """Archive extraction half of the download hook (reference
        datasets/utils.py:188-209; the gdown fetch itself needs network)."""
        import tarfile
        import zipfile

        from summer_clip_tpu.data.core import DatasetBase

        src = tmp_path / "payload.txt"
        src.write_text("hello")
        tar_p = tmp_path / "t" / "a.tar"
        tar_p.parent.mkdir()
        with tarfile.open(tar_p, "w") as tar:
            tar.add(src, arcname="payload.txt")
        DatasetBase.extract_archive(tar_p)
        assert (tmp_path / "t" / "payload.txt").read_text() == "hello"

        zip_p = tmp_path / "z" / "a.zip"
        zip_p.parent.mkdir()
        with zipfile.ZipFile(zip_p, "w") as zf:
            zf.write(src, "payload.txt")
        DatasetBase.extract_archive(zip_p)
        assert (tmp_path / "z" / "payload.txt").read_text() == "hello"

        bad = tmp_path / "bad.bin"
        bad.write_bytes(b"not an archive")
        with pytest.raises(ValueError):
            DatasetBase.extract_archive(bad)

    def test_dataset_view_synthetic(self):
        v = D.DatasetView("synthetic", "test", "", shots=-1, input_size=16)
        assert len(v) > 0
        assert v.classes[0] == "class 0"
        assert v.template == ["a photo of a {}."]


class TestFeatureStore:
    def test_save_load_roundtrip(self, tmp_path):
        store = FeatureStore(tmp_path / "store")
        feats = np.random.RandomState(0).rand(10, 8).astype(np.float32)
        labels = np.arange(10, dtype=np.int32)
        store.save("ds_train-RN50", features=feats, labels=labels, meta={"model": "RN50"})
        assert "ds_train-RN50" in store
        got = store.load("ds_train-RN50")
        np.testing.assert_array_equal(np.asarray(got), feats)
        allarr = store.load_all("ds_train-RN50")
        np.testing.assert_array_equal(np.asarray(allarr["labels"]), labels)
        assert store.meta("ds_train-RN50")["meta"]["model"] == "RN50"

    def test_catalog_is_json(self, tmp_path):
        store = FeatureStore(tmp_path)
        store.save("k", features=np.zeros((2, 2)))
        cat = json.loads((tmp_path / "catalog.json").read_text())
        assert "k" in cat
        assert cat["k"]["arrays"]["features"]["shape"] == [2, 2]

    def test_import_torch_features_transposes(self, tmp_path):
        import torch

        t = torch.arange(12, dtype=torch.float32).reshape(3, 4)  # (emb_dim=3, N=4)
        p = tmp_path / "f.pt"
        torch.save(t, p)
        arr = import_torch_features(p)
        assert arr.shape == (4, 3)
        np.testing.assert_allclose(arr, t.numpy().T)


class TestArrayDatasets:
    def _make_cifar10(self, root):
        import pickle
        base = root / "cifar-10-batches-py"
        base.mkdir(parents=True)
        rng = np.random.RandomState(0)
        for name, n in [(f"data_batch_{i}", 20) for i in range(1, 6)] + [("test_batch", 30)]:
            data = {
                b"data": (rng.rand(n, 3072) * 255).astype(np.uint8),
                b"labels": list(rng.randint(0, 10, n)),
            }
            with open(base / name, "wb") as f:
                pickle.dump(data, f)
        with open(base / "batches.meta", "wb") as f:
            pickle.dump({b"label_names": [f"class{i}".encode() for i in range(10)]}, f)
        return root

    def test_cifar10_loader(self, tmp_path):
        self._make_cifar10(tmp_path)
        ds = D.build_dataset("cifar10", str(tmp_path), -1)
        assert len(ds.train_x) == 100 and len(ds.test) == 30
        assert ds.classnames[0] == "class0"
        # batcher resolves array:// paths through the transform
        from summer_clip_tpu.data.transforms import EvalTransform
        b = D.ImageBatcher(ds.test, batch_size=8, transform=EvalTransform(16), use_native=False)
        batch = next(iter(b))
        assert batch.images.shape == (8, 16, 16, 3)

    def test_cifar10_fewshot(self, tmp_path):
        self._make_cifar10(tmp_path)
        ds = D.build_dataset("cifar10", str(tmp_path), 2, rng=np.random.default_rng(0))
        labels = np.asarray([d.label for d in ds.train_x])
        assert all((labels == c).sum() <= 2 for c in range(10))

    def test_mnist_loader(self, tmp_path):
        import gzip, struct
        base = tmp_path / "MNIST" / "raw"
        base.mkdir(parents=True)
        rng = np.random.RandomState(0)

        def write_idx(path, arr):
            arr = np.asarray(arr, np.uint8)
            header = struct.pack(">I", (0x08 << 8) | arr.ndim)[:4]
            header = struct.pack(">HBB", 0, 8, arr.ndim)
            dims = b"".join(struct.pack(">I", d) for d in arr.shape)
            with gzip.open(path, "wb") as f:
                f.write(header + dims + arr.tobytes())

        write_idx(base / "train-images-idx3-ubyte.gz", (rng.rand(40, 28, 28) * 255))
        write_idx(base / "train-labels-idx1-ubyte.gz", rng.randint(0, 10, 40))
        write_idx(base / "t10k-images-idx3-ubyte.gz", (rng.rand(12, 28, 28) * 255))
        write_idx(base / "t10k-labels-idx1-ubyte.gz", rng.randint(0, 10, 12))
        ds = D.build_dataset("mnist", str(tmp_path), -1)
        assert len(ds.train_x) == 40 and len(ds.test) == 12
        img = D.build_dataset("mnist", str(tmp_path), -1).train_x[0]
        from summer_clip_tpu.data.array_datasets import resolve_array_image
        arr = resolve_array_image(img.impath)
        assert arr.shape == (28, 28, 3)


class TestPrefetch:
    def test_prefetch_to_device_order(self):
        from summer_clip_tpu.data.loader import prefetch_to_device

        batches = [{"x": np.full((2,), i, np.float32)} for i in range(5)]
        out = list(prefetch_to_device(iter(batches), size=2))
        assert len(out) == 5
        for i, b in enumerate(out):
            np.testing.assert_array_equal(np.asarray(b["x"]), np.full((2,), i))


class TestFeaturesIO:
    def test_resolve_from_store_key_and_paths(self, tmp_path):
        import torch

        from summer_clip_tpu.apps.features_io import resolve_array

        store = FeatureStore(tmp_path / "s")
        feats = np.random.RandomState(0).rand(6, 4).astype(np.float32)
        store.save("k", features=feats)
        got = resolve_array(store, "k", None, "features")
        np.testing.assert_array_equal(np.asarray(got), feats)

        # .npy path
        p = tmp_path / "f.npy"
        np.save(p, feats)
        np.testing.assert_array_equal(np.asarray(resolve_array(None, None, str(p))), feats)

        # reference-made .pt: features transpose, outs stay (N, C)
        t = torch.from_numpy(feats.T.copy())  # (emb_dim, N) reference layout
        pt = tmp_path / "f.pt"
        torch.save(t, pt)
        np.testing.assert_allclose(np.asarray(resolve_array(None, None, str(pt), "features")), feats)
        outs = torch.from_numpy(feats.copy())  # (N, C) layout
        pt2 = tmp_path / "o.pt"
        torch.save(outs, pt2)
        np.testing.assert_allclose(np.asarray(resolve_array(None, None, str(pt2), "outs")), feats)

    def test_missing_both_raises(self):
        import pytest as _pytest

        from summer_clip_tpu.apps.features_io import resolve_array

        with _pytest.raises(AssertionError):
            resolve_array(None, None, None)
