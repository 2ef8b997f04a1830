import numpy as np

def test_decode_ppm_roundtrip():
    from vyperdatum_ray.pipelines.multimodal import decode_ppm

    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (7, 5, 3), dtype=np.uint8)
    buf = b"P6\n# a comment\n5 7\n255\n" + img.tobytes()
    out = decode_ppm(buf)
    np.testing.assert_array_equal(out, img)
    # malformed payloads refuse instead of garbage
    assert decode_ppm(b"") is None
    assert decode_ppm(b"nonsense") is None
    assert decode_ppm(b"P6\n5 7\n255\n" + img.tobytes()[:10]) is None
    assert decode_ppm(b"P6\n5 7\n65535\n" + img.tobytes()) is None


def test_resize_bilinear_properties():
    from vyperdatum_ray.pipelines.multimodal import resize_bilinear

    const = np.full((9, 13, 3), 137, dtype=np.uint8)
    out = resize_bilinear(const, 4, 4)
    np.testing.assert_allclose(out, 137.0)
    # identity resize reproduces the image
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (6, 6, 3), dtype=np.uint8)
    np.testing.assert_allclose(resize_bilinear(img, 6, 6), img.astype(float))
    # horizontal gradient stays monotone after downsample
    grad = np.tile(np.arange(0, 240, 10, dtype=np.uint8)[None, :, None], (8, 1, 3))
    small = resize_bilinear(grad, 2, 6)
    assert (np.diff(small[0, :, 0]) > 0).all()


def test_fake_decoder_prefers_real_ppm_path():
    from vyperdatum_ray.pipelines.multimodal import FEATURE_DIM, FakeDecoder

    img = np.full((4, 4, 3), 200, dtype=np.uint8)
    ppm = b"P6\n4 4\n255\n" + img.tobytes()
    feats = FakeDecoder.decode([ppm, b"\x01\x02\x03"])
    np.testing.assert_allclose(feats[0], 200.0 / 255.0)  # real decode path
    assert feats.shape == (2, FEATURE_DIM)
