"""Native C++ components: exact BPE parity vs the Python tokenizer and
JPEG decode+resize parity vs cv2."""

import random
import string

import numpy as np
import pytest

from aihab_clip_tpu import native


@pytest.fixture(scope="module", autouse=True)
def _require_native():
    if not native.native_bpe_available():
        pytest.skip("native libs not built")


def test_native_bpe_matches_python_on_prompts():
    from aihab_clip_tpu.templates import gen_prompts
    from aihab_clip_tpu.tokenizer.bpe import ClipBPETokenizer, clean_text

    py_tok = ClipBPETokenizer(use_native=False)
    for use_h in (False, True):
        for use_d in (False, True):
            prompts, _ = gen_prompts(use_hierarchy=use_h, use_descriptive=use_d)
            for p in prompts:
                cleaned = clean_text(p).lower()
                ids_native = native.native_bpe_encode(cleaned)
                assert ids_native is not None
                assert ids_native == py_tok.encode(p), p


def test_native_bpe_matches_python_random_ascii():
    from aihab_clip_tpu.tokenizer.bpe import ClipBPETokenizer, clean_text

    py_tok = ClipBPETokenizer(use_native=False)
    rng = random.Random(0)
    alphabet = string.ascii_letters + string.digits + " .,!?'\"-():/%"
    for _ in range(200):
        text = "".join(rng.choice(alphabet)
                       for _ in range(rng.randint(1, 60)))
        cleaned = clean_text(text).lower()
        ids_native = native.native_bpe_encode(cleaned)
        assert ids_native is not None
        assert ids_native == py_tok.encode(text), repr(text)


def test_native_bpe_contractions():
    from aihab_clip_tpu.tokenizer.bpe import ClipBPETokenizer

    py_tok = ClipBPETokenizer(use_native=False)
    for text in ["it's a dog", "they're well", "i'll we've he'd isn't",
                 "'side quotes' and 'll edge", "o'clock!!'s mixed"]:
        assert native.native_bpe_encode(text) == py_tok.encode(text), text


def test_native_bpe_rejects_non_ascii():
    assert native.native_bpe_encode("café") is None


def test_default_tokenizer_uses_native_transparently():
    from aihab_clip_tpu.tokenizer import get_tokenizer
    from aihab_clip_tpu.tokenizer.bpe import ClipBPETokenizer

    tok = get_tokenizer()
    py_tok = ClipBPETokenizer(use_native=False)
    assert tok.encode("a habitat photo of Improved Grassland.") == \
        py_tok.encode("a habitat photo of Improved Grassland.")


def test_native_bulk_decode_matches_cv2(tmp_path, rng):
    if not native.native_image_available():
        pytest.skip("image pipeline lib not built")
    import cv2

    paths = []
    originals = []
    for i in range(6):
        img = rng.integers(0, 256, size=(57 + i, 91, 3), dtype=np.uint8)
        p = tmp_path / f"img_{i}.jpg"
        cv2.imwrite(str(p), img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
        paths.append(str(p))
        originals.append(img)

    out, ok = native.native_bulk_decode_resize(paths, 32)
    assert ok.all()
    assert out.shape == (6, 32, 32, 3)

    for i, p in enumerate(paths):
        ref = cv2.resize(cv2.imread(p), (32, 32))[:, :, ::-1]  # BGR->RGB
        diff = np.abs(out[i].astype(int) - ref.astype(int))
        # decode (IDCT) and rounding differences stay tiny
        assert diff.mean() < 2.0
        assert np.percentile(diff, 99) <= 12


def test_native_bulk_decode_prescale(tmp_path, rng):
    """DCT-domain scaled decode: no-op below the threshold, bounded drift
    and identical shapes above it."""
    if not native.native_image_available():
        pytest.skip("image pipeline lib not built")
    import cv2

    # small source (< prescale_min): m stays 8/8 -> bit-identical output
    small = rng.integers(0, 256, size=(60, 80, 3), dtype=np.uint8)
    sp = tmp_path / "small.jpg"
    cv2.imwrite(str(sp), small[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
    full, ok1 = native.native_bulk_decode_resize([str(sp)], 32)
    pre, ok2 = native.native_bulk_decode_resize([str(sp)], 32,
                                                prescale_min=64)
    assert ok1.all() and ok2.all()
    np.testing.assert_array_equal(full, pre)

    # large smooth source (>> prescale_min): scaled decode kicks in; the
    # resized outputs must agree except in detail the downsample discards
    yy, xx = np.mgrid[0:540, 0:720]
    img = np.stack([128 + 60 * np.sin(xx / 40), 128 + 50 * np.cos(yy / 30),
                    np.full_like(xx, 90, dtype=np.float64)], -1)
    img = np.clip(img, 0, 255).astype(np.uint8)
    lp = tmp_path / "large.jpg"
    cv2.imwrite(str(lp), img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 92])
    full, ok1 = native.native_bulk_decode_resize([str(lp)], 64)
    pre, ok2 = native.native_bulk_decode_resize([str(lp)], 64,
                                                prescale_min=128)
    assert ok1.all() and ok2.all()
    assert pre.shape == full.shape
    diff = np.abs(pre[0].astype(int) - full[0].astype(int))
    assert diff.mean() < 2.0
    assert np.percentile(diff, 99) <= 12


def test_native_bulk_decode_bad_file(tmp_path):
    if not native.native_image_available():
        pytest.skip("image pipeline lib not built")
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg")
    out, ok = native.native_bulk_decode_resize([str(bad)], 16)
    assert not ok[0]
    assert (out[0] == 0).all()


def test_native_mem_decode_matches_file_decode(tmp_path, rng):
    """The memory-source decode (serving hot path) is byte-identical to
    the file-path decode of the same JPEG bytes."""
    if not native.native_mem_decode_available():
        pytest.skip("mem-decode entry not built")
    import cv2

    img = rng.integers(0, 256, size=(77, 103, 3), dtype=np.uint8)
    p = tmp_path / "img.jpg"
    cv2.imwrite(str(p), img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 92])
    blob = p.read_bytes()

    from_file, ok = native.native_bulk_decode_resize([str(p)], 48)
    assert ok.all()
    from_mem = native.native_decode_resize_mem(blob, 48)
    assert from_mem is not None
    np.testing.assert_array_equal(from_mem, from_file[0])

    # prescale threads through identically
    f2, _ = native.native_bulk_decode_resize([str(p)], 48, prescale_min=96)
    m2 = native.native_decode_resize_mem(blob, 48, prescale_min=96)
    np.testing.assert_array_equal(m2, f2[0])

    # non-JPEG bytes: None (caller falls back), not a crash
    assert native.native_decode_resize_mem(b"PNG...not-jpeg", 48) is None
    assert native.native_decode_resize_mem(b"\xff\xd8\xff corrupt", 48) is None


def test_native_bulk_mem_decode(tmp_path, rng):
    """Batched memory decode: framing by offsets, per-image ok mask."""
    if not native.native_mem_decode_available():
        pytest.skip("mem-decode entry not built")
    import cv2

    blobs, imgs = [], []
    for i in range(5):
        img = rng.integers(0, 256, size=(50 + 7 * i, 66, 3), dtype=np.uint8)
        p = tmp_path / f"m{i}.jpg"
        cv2.imwrite(str(p), img[:, :, ::-1], [cv2.IMWRITE_JPEG_QUALITY, 90])
        blobs.append(p.read_bytes())
        imgs.append(img)

    out, ok = native.native_bulk_decode_resize_mem(blobs, 32)
    assert ok.all() and out.shape == (5, 32, 32, 3)
    for i, b in enumerate(blobs):
        single = native.native_decode_resize_mem(b, 32)
        np.testing.assert_array_equal(out[i], single)

    # a corrupt middle blob fails alone (others still decode) — the bulk
    # entry is only invoked when every blob is JPEG-magic-framed
    corrupt = blobs[0][:40]  # magic ok, truncated body
    out2, ok2 = native.native_bulk_decode_resize_mem(
        [blobs[0], corrupt, blobs[2]], 32)
    assert ok2.tolist() == [True, False, True]
    assert (out2[1] == 0).all()
    np.testing.assert_array_equal(out2[0], out[0])

    # mixed formats -> None (caller falls back per blob)
    assert native.native_bulk_decode_resize_mem(
        [blobs[0], b"not jpeg"], 32) is None
