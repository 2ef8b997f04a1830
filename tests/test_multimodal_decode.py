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


def test_image_neardup_banded_equals_bruteforce(ray_session):
    """The 8x8-bit banding guarantees exact recall below hamming 8 by
    pigeonhole — so the banded pipeline's pairs must EQUAL the brute-
    force thresholded set over the engine's own hashes; and on the
    synthetic groups (noisy copies share contiguous img_ids) every pair
    is within-group."""
    import numpy as np
    import pyarrow.parquet as pq
    from vyperdatum_ray.fixtures import ensure_image_fixtures
    from vyperdatum_ray.pipelines.multimodal import (decode_ppm, dhash64,
                                                     hamming64,
                                                     q_image_neardup)

    out = q_image_neardup("/root/testdata/sf0.01").to_pandas()
    got = set(zip(out["id_a"], out["id_b"]))

    t = pq.read_table(ensure_image_fixtures("/root/testdata/sf0.01"))
    ids = t.column("img_id").to_numpy(zero_copy_only=False)
    hs = np.array([dhash64(decode_ppm(b)) for b in t.column("payload").to_pylist()],
                  dtype=np.uint64)
    ai, bj = np.triu_indices(len(ids), k=1)
    hd = hamming64(hs[ai], hs[bj])
    want = set(zip(ids[ai[hd <= 6]], ids[bj[hd <= 6]]))
    assert got == want
    assert len(got) > 10  # the noisy copies really do pair up
    assert (out["id_b"] - out["id_a"]).max() <= 4  # within-group only
    # hamming column matches recomputation
    m = dict(zip(zip(ids[ai], ids[bj]), hd))
    assert all(m[(a, b)] == h for a, b, h in
               zip(out["id_a"], out["id_b"], out["hamming"]))
