"""Native image pipeline: builds with g++, matches the PIL path numerically,
and is the faster option for batch preprocessing."""

import time

import numpy as np
import pytest

from cambrian_tpu.data import native_image
from cambrian_tpu.mm_utils import ImageProcessor, expand2square

PIL = pytest.importorskip("PIL.Image")

RNG = np.random.default_rng(33)


@pytest.fixture(scope="module")
def lib():
    lib = native_image.load_library()
    if lib is None:
        pytest.skip("g++ unavailable")
    return lib


def _pil_reference(arr, target, mean, std, resample):
    img = PIL.fromarray(arr)
    fill = tuple(int(m * 255) for m in mean)
    sq = expand2square(img, fill).resize((target, target), resample)
    out = np.asarray(sq, dtype=np.float32) / 255.0
    out = (out - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)
    return out.transpose(2, 0, 1)


@pytest.mark.parametrize("resample,pil_mode", [
    (native_image.RESAMPLE_BICUBIC, 3),
    (native_image.RESAMPLE_BILINEAR, 2),
])
@pytest.mark.parametrize("shape", [(48, 96), (96, 48), (64, 64), (31, 77)])
def test_matches_pil(lib, resample, pil_mode, shape):
    mean = (0.48145466, 0.4578275, 0.40821073)
    std = (0.26862954, 0.26130258, 0.27577711)
    arr = RNG.integers(0, 256, (*shape, 3), dtype=np.uint8)
    target = 56

    ours = native_image.preprocess_batch([arr], target, mean, std, resample)[0]
    ref = _pil_reference(arr, target, mean, std, pil_mode)
    # PIL uses fixed-point coefficients and u8 rounding per pass; ours is
    # float with one final u8 round. Differences are at most ~2 u8 steps.
    diff = np.abs(ours - ref)
    u8_step = (1.0 / 255.0) / min(std)
    assert diff.mean() < 0.5 * u8_step, diff.mean()
    assert diff.max() < 4 * u8_step, diff.max()


def test_batch_multithreaded(lib):
    mean, std = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
    images = [RNG.integers(0, 256, (64 + i, 80, 3), dtype=np.uint8)
              for i in range(8)]
    out = native_image.preprocess_batch(images, 32, mean, std, num_threads=4)
    assert out.shape == (8, 3, 32, 32)
    # per-image results identical to single-threaded
    out1 = native_image.preprocess_batch(images, 32, mean, std, num_threads=1)
    np.testing.assert_array_equal(out, out1)


def test_faster_than_pil_for_batches(lib):
    mean, std = (0.5, 0.5, 0.5), (0.5, 0.5, 0.5)
    images = [RNG.integers(0, 256, (512, 768, 3), dtype=np.uint8)
              for _ in range(16)]
    proc = ImageProcessor(size=336)

    native_image.preprocess_batch(images[:1], 336, mean, std)  # warm

    def _best(fn, reps=3):
        # min-of-reps: co-tenant CPU load only ever inflates a rep, so the
        # minimum is the least-contended measurement of each path
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            fn()
            times.append(time.perf_counter() - t0)
        return min(times)

    t_native = _best(lambda: native_image.preprocess_batch(images, 336, mean, std))

    def pil_path():
        for arr in images:
            img = PIL.fromarray(arr)
            fill = tuple(int(m * 255) for m in mean)
            proc.preprocess(expand2square(img, fill).resize((336, 336)))

    t_pil = _best(pil_path)

    # soft check: don't fail CI on noisy machines, but record the ratio
    print(f"native {t_native*1000:.1f}ms vs PIL {t_pil*1000:.1f}ms "
          f"({t_pil/max(t_native,1e-9):.2f}x)")
    assert t_native < t_pil * 2.0, "native path should not be dramatically slower"
