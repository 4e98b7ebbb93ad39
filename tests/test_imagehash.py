"""Perceptual average-hash (kernel/imagehash.py + image_ahash_groups)."""

import numpy as np

from wpextract_spark.kernel.imagehash import average_hash


def _img(arr: np.ndarray) -> tuple[int, int, int, bytes]:
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    return w, h, ch, arr.astype(np.uint8).tobytes()


def test_hash_is_64_bits_and_deterministic():
    rng = np.random.RandomState(0)
    img = rng.randint(0, 256, (33, 47))
    a = average_hash(*_img(img))
    assert len(a) == 64 and set(a) <= {"0", "1"}
    assert a == average_hash(*_img(img))


def test_identical_content_different_size_same_hash():
    """The hash is downsample-invariant for nearest-neighbor upscales."""
    base = np.arange(64).reshape(8, 8) * 4
    big = np.kron(base, np.ones((6, 6), dtype=int))  # 48x48 nearest upscale
    assert average_hash(*_img(base)) == average_hash(*_img(big))


def test_brightness_structure_drives_bits():
    img = np.zeros((16, 16), dtype=int)
    img[:8, :] = 255  # top half bright
    a = average_hash(*_img(img))
    assert a[:32] == "1" * 32 and a[32:] == "0" * 32


def test_multichannel_luminance_mean():
    rgb = np.zeros((8, 8, 3), dtype=int)
    rgb[:, 4:, :] = 240  # right half bright in every channel
    a = average_hash(*_img(rgb))
    assert a == ("0000" + "1111") * 8


def test_garbage_quarantines():
    assert average_hash(8, 8, 1, b"\x00" * 5) is None  # wrong buffer size
    assert average_hash(0, 8, 1, b"") is None


def test_spark_groups_count_exact_twins(spark):
    from pyspark.sql import functions as F

    from wpextract_spark.operators.multimodal import image_ahash_groups
    from wpextract_spark.sources.imagegen import build_gradient_image

    # ids 0 and 100 share (w, h): twins iff their wrap patterns agree;
    # build a deterministic twin instead: same id payload twice.
    payload = build_gradient_image(5)[3]
    rows = [(1, "png", payload), (2, "png", payload), (3, "png", build_gradient_image(6)[3]),
            (4, "png", b"not an image")]
    media = spark.createDataFrame(rows, "media_id long, kind string, payload binary")
    got = {r["media_id"]: r for r in image_ahash_groups(media).collect()}
    assert got[1]["ahash"] == got[2]["ahash"] and got[1]["n_same"] == 2
    assert got[3]["n_same"] == 1
    assert got[4]["ahash"] is None and got[4]["n_same"] is None
