import numpy as np
import pytest

from batch_geocode_spark import codecs


def _img(h=48, w=64, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (yy * 3)[:, :, None] * np.asarray([1, 0, 0]) + (xx * 2)[:, :, None] * np.asarray(
        [0, 1, 0]
    )
    return np.clip(base + rng.integers(0, 40, (h, w, 3)), 0, 255).astype(np.uint8)


def test_ppm_lossless():
    img = _img()
    assert np.array_equal(codecs.decode_ppm(codecs.encode_ppm(img)), img)


@pytest.mark.parametrize("h,w", [(16, 16), (24, 32), (48, 64), (17, 23)])
def test_dctq_psnr_floor(h, w):
    img = _img(h, w, seed=h * w)
    dec = codecs.decode_dctq(codecs.encode_dctq(img))
    assert dec.shape == img.shape
    assert codecs.psnr(img, dec) >= 40.0  # input_hint invariant


def test_average_hash_stable_and_robust():
    img = _img()
    h1 = codecs.average_hash(img)
    assert h1 == codecs.average_hash(img.copy())
    # lossy roundtrip should not change the perceptual hash much
    dec = codecs.decode_dctq(codecs.encode_dctq(img))
    h2 = codecs.average_hash(dec)
    assert bin((h1 ^ h2) & (2**64 - 1)).count("1") <= 4
    assert -(2**63) <= h1 < 2**63


def test_resize_nearest():
    img = _img(32, 32)
    out = codecs.resize_nearest(img, 8, 16)
    assert out.shape == (8, 16, 3)


def test_pgm16_roundtrip_lossless():
    from batch_geocode_spark.codecs import decode_pgm16, encode_pgm16

    rng = np.random.default_rng(3)
    grid = rng.integers(0, 60000, size=(16, 16)).astype(np.int64)
    assert (decode_pgm16(encode_pgm16(grid)) == grid).all()
    # clipping above maxval
    hot = grid.copy()
    hot[0, 0] = 10**9
    assert decode_pgm16(encode_pgm16(hot))[0, 0] == 65535
