"""Native C++ preprocessing tests (skipped when the toolchain is absent)."""

import numpy as np
import pytest
from PIL import Image

from summer_clip_tpu import native
from summer_clip_tpu.data.core import Datum
from summer_clip_tpu.data.loader import ImageBatcher
from summer_clip_tpu.data.transforms import EvalTransform, load_image

pytestmark = pytest.mark.skipif(not native.is_available(),
                                reason="native preprocess library unavailable")


@pytest.fixture(scope="module")
def jpegs(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("jpegs")
    rng = np.random.RandomState(0)
    paths = []
    for i, (h, w) in enumerate([(320, 480), (480, 320), (224, 224), (100, 400)]):
        arr = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        p = tmp / f"{i}.jpg"
        Image.fromarray(arr).save(p, quality=95)
        paths.append(str(p))
    return paths


class TestNativePreprocess:
    def test_batch_matches_pil(self, jpegs):
        imgs, ok = native.preprocess_batch(jpegs, 64, num_threads=2)
        assert ok.all()
        t = EvalTransform(64)
        for i, p in enumerate(jpegs):
            ref = t(load_image(p))
            assert np.abs(imgs[i] - ref).mean() < 0.03, f"image {i} diverges from PIL"

    def test_fast_mode_close_to_slow(self, tmp_path_factory):
        """fast=True (1x DCT-scale margin) must stay near the slow path on
        natural-statistics content and produce valid rows."""
        tmp = tmp_path_factory.mktemp("jpegs_fast")
        rng = np.random.RandomState(1)
        coarse = (rng.rand(30, 40, 3) * 255).astype(np.uint8)
        arr = np.asarray(Image.fromarray(coarse).resize((640, 480),
                                                        Image.BILINEAR))
        p = tmp / "smooth.jpg"
        Image.fromarray(arr).save(p, quality=92)
        slow, ok1 = native.preprocess_batch([str(p)], 224)
        fast, ok2 = native.preprocess_batch([str(p)], 224, fast=True)
        assert ok1.all() and ok2.all()
        # normalized units (CLIP std ~0.27): 0.05 ~= 1.3% pixel error
        assert np.abs(fast - slow).mean() < 0.05
        # and fast must actually take the scaled-decode branch: outputs
        # differ (a bitwise match would mean the margin logic regressed)
        assert np.abs(fast - slow).max() > 0.0

    def test_bad_file_flags_failure(self, jpegs, tmp_path):
        bad = tmp_path / "bad.jpg"
        bad.write_bytes(b"not a jpeg")
        imgs, ok = native.preprocess_batch([jpegs[0], str(bad)], 32)
        assert ok.tolist() == [True, False]
        assert np.abs(imgs[1]).max() == 0.0

    def test_fallback_row_normalized_under_device_normalize(self, jpegs, monkeypatch):
        """A PIL-fallback row inside a native batch must be host-normalized
        even when the transform ships raw uint8 (device_normalize=True) —
        regression for silent 0-255-into-float32 corruption."""
        real = native.preprocess_batch

        def native_fails_row1(paths, out_size, num_threads=0, out=None,
                              fast=False):
            imgs, ok = real(paths, out_size, num_threads=num_threads, out=out,
                            fast=fast)
            ok = ok.copy()
            ok[1] = False
            imgs[1] = 0.0
            return imgs, ok

        monkeypatch.setattr(native, "preprocess_batch", native_fails_row1)
        data = [Datum(impath=p, label=i % 2) for i, p in enumerate(jpegs[:2])]
        b = ImageBatcher(data, batch_size=2,
                         transform=EvalTransform(32, device_normalize=True),
                         use_native=True)
        batch = list(b)[0]
        assert batch.images.dtype == np.float32
        # the fallback row must match the host-normalized PIL reference,
        # not raw 0-255 bytes
        ref = EvalTransform(32)(load_image(str(jpegs[1])))
        assert np.abs(batch.images[1] - ref).mean() < 0.03
        assert np.abs(batch.images[1]).max() < 4.0
        data = [Datum(impath=p, label=i % 2) for i, p in enumerate(jpegs)]
        b = ImageBatcher(data, batch_size=2, transform=EvalTransform(32))
        assert b.use_native
        batches = list(b)
        assert batches[0].images.shape == (2, 32, 32, 3)
        # and matches the PIL path
        b2 = ImageBatcher(data, batch_size=2, transform=EvalTransform(32), use_native=False)
        pil_first = list(b2)[0].images
        assert np.abs(batches[0].images - pil_first).mean() < 0.03
