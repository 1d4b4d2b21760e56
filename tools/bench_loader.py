"""Host input-pipeline throughput: native C++ decode vs PIL threads.

The feature-extraction pipeline (apps/save_features.py) is fed by
``data/loader.py``'s threaded batcher; on a chip doing 10.6k img/s the host
must decode+preprocess at least that fast or extraction becomes
input-bound. This measures, on THIS host's CPUs:

- the native libjpeg path (``native/clip_preprocess.cpp``: decode + bicubic
  resize + center crop + normalize, OpenMP threads),
- the PIL/numpy fallback (EvalTransform on a thread pool),
- the end-to-end ``ImageBatcher`` iteration rate for both.

Run anywhere: ``python tools/bench_loader.py [n_images] [size]``.
"""

from __future__ import annotations

import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def make_jpegs(n: int, hw=(480, 640)) -> list:
    from PIL import Image

    d = Path(tempfile.mkdtemp(prefix="bench_jpeg_"))
    rng = np.random.RandomState(0)
    paths = []
    # natural-statistics content (low-frequency): white noise is the worst
    # case for both JPEG entropy size and DCT-scaled decode quality, and
    # photos are not white noise — upsample coarse noise instead
    coarse = rng.randint(0, 255, (hw[0] // 16, hw[1] // 16, 3), np.uint8)
    base = np.asarray(Image.fromarray(coarse).resize(
        (hw[1], hw[0]), Image.BILINEAR), np.uint8)
    for i in range(n):
        p = d / f"{i}.jpg"
        # vary content slightly so decode work is real, but reuse the base
        # to keep setup fast
        arr = np.roll(base, i * 7, axis=1)
        Image.fromarray(arr).save(p, quality=90)
        paths.append(str(p))
    return paths


def main(n: int = 512, size: int = 224) -> None:
    from summer_clip_tpu.data.core import Datum
    from summer_clip_tpu.data.loader import ImageBatcher
    from summer_clip_tpu.data.transforms import EvalTransform
    from summer_clip_tpu.native import ensure_built, is_available, preprocess_batch

    paths = make_jpegs(n)
    print(f"{n} jpegs of 480x640 -> {size}px", flush=True)

    ensure_built()
    if is_available():
        for threads in (8, 16, 32):
            preprocess_batch(paths[:32], size, num_threads=threads)  # warm
            t0 = time.perf_counter()
            imgs, ok = preprocess_batch(paths, size, num_threads=threads)
            dt = time.perf_counter() - t0
            assert ok.all()
            print(f"native decode+preprocess ({threads} threads): "
                  f"{n / dt:,.0f} img/s", flush=True)
        # fast DCT-scale mode: decode at the smallest scale whose short side
        # still covers the target (1x margin instead of 2x) — throughput +
        # quality delta vs the PIL-parity slow path
        slow, _ = preprocess_batch(paths, size, num_threads=16)
        preprocess_batch(paths[:32], size, num_threads=16, fast=True)  # warm
        t0 = time.perf_counter()
        fast_imgs, ok = preprocess_batch(paths, size, num_threads=16, fast=True)
        dt = time.perf_counter() - t0
        assert ok.all()
        diff = np.abs(fast_imgs - slow).mean()
        print(f"native FAST decode (16 threads, 1x DCT margin): "
              f"{n / dt:,.0f} img/s (mean |diff| vs slow path: {diff:.4f})",
              flush=True)
    else:
        print("native path unavailable (g++/libjpeg missing)", flush=True)

    tfm = EvalTransform(size)
    import concurrent.futures as cf

    from summer_clip_tpu.data.transforms import load_image

    with cf.ThreadPoolExecutor(max_workers=16) as pool:
        list(pool.map(lambda p: tfm(load_image(p)), paths[:32]))  # warm
        t0 = time.perf_counter()
        list(pool.map(lambda p: tfm(load_image(p)), paths))
        dt = time.perf_counter() - t0
    print(f"PIL decode+preprocess (16 threads): {n / dt:,.0f} img/s", flush=True)

    data = [Datum(impath=p, label=0) for p in paths]
    for use_native in ((True, False) if is_available() else (False,)):
        b = ImageBatcher(data, batch_size=128, transform=tfm, use_native=use_native)
        for _ in b:  # warm (thread pools, page cache)
            pass
        t0 = time.perf_counter()
        count = sum(int(batch.mask.sum()) for batch in b)
        dt = time.perf_counter() - t0
        print(f"ImageBatcher end-to-end (native={use_native}): "
              f"{count / dt:,.0f} img/s", flush=True)


if __name__ == "__main__":
    args = [int(a) for a in sys.argv[1:]]
    main(*args)
