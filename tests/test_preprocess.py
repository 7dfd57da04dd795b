import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from aihab_clip_tpu.ops.preprocess import (
    CLIP_MEAN,
    CLIP_STD,
    affine_warp,
    bottom_square_crop,
    center_crop,
    eval_transform,
    normalize,
    train_transform,
)


def _rand_u8(rng, b=2, h=96, w=96):
    return rng.integers(0, 256, size=(b, h, w, 3), dtype=np.uint8)


def test_normalize_values(rng):
    img = _rand_u8(rng, b=1, h=4, w=4)
    out = np.asarray(normalize(jnp.asarray(img)))
    expected = (img.astype(np.float32) / 255.0 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    np.testing.assert_allclose(out, expected, atol=1e-6)


def test_eval_transform_matches_pil(rng):
    """Deterministic eval path vs PIL: resize(shorter side, BICUBIC) +
    center crop. This is the parity-critical test transform."""
    img = _rand_u8(rng, b=1, h=96, w=96)[0]
    res = 64

    pil = Image.fromarray(img).resize((res, res), Image.BICUBIC)
    pil_arr = np.asarray(pil).astype(np.float32)

    ours = np.asarray(eval_transform(jnp.asarray(img[None]), res))[0]
    # un-normalize for comparison in pixel units
    ours_px = (ours * np.array(CLIP_STD) + np.array(CLIP_MEAN)) * 255.0

    err = np.abs(ours_px - pil_arr)
    assert err.mean() < 1.0      # average sub-LSB agreement
    assert np.percentile(err, 99) < 4.0


def test_eval_transform_non_square(rng):
    img = _rand_u8(rng, b=2, h=80, w=120)
    out = np.asarray(eval_transform(jnp.asarray(img), 64))
    assert out.shape == (2, 64, 64, 3)


def _pil_reference_chain(img: np.ndarray, res: int) -> np.ndarray:
    """torchvision Resize(res, BICUBIC) + CenterCrop(res) emulated with
    PIL: shorter side -> res with the long side TRUNCATED
    (int(res * long / short)), then the banker's-rounded crop offset
    (crop_top = int(round((H - res) / 2.0)), torchvision
    _geometry.center_crop).  Reference semantics:
    /root/reference/clip/clip.py:74-81."""
    h, w = img.shape[:2]
    if h <= w:
        nh, nw = res, int(res * w / h)
    else:
        nh, nw = int(res * h / w), res
    arr = np.asarray(
        Image.fromarray(img).resize((nw, nh), Image.BICUBIC),
        dtype=np.float32)
    top = int(round((nh - res) / 2.0))
    left = int(round((nw - res) / 2.0))
    return arr[top:top + res, left:left + res]


@pytest.mark.parametrize("h,w,res", [
    (80, 120, 64),      # landscape, even crop diff
    (585, 439, 224),    # portrait CS-camera aspect at full eval size
    (64, 131, 64),      # odd crop diff (67), round()==floor (33)
    (64, 133, 64),      # odd crop diff (69) with odd half: round(34.5)=34
])
def test_eval_transform_non_square_values(rng, h, w, res):
    """VALUE-level PIL parity on non-square inputs — the shorter-side
    resize + center-crop geometry matters here (the square golden above
    degenerates to a plain resize).  Serving/predict feed arbitrary
    aspect ratios through this exact path (VERDICT r3 item 6)."""
    img = _rand_u8(rng, b=1, h=h, w=w)[0]
    ref = _pil_reference_chain(img, res)

    ours = np.asarray(eval_transform(jnp.asarray(img[None]), res))[0]
    ours_px = (ours * np.array(CLIP_STD) + np.array(CLIP_MEAN)) * 255.0

    err = np.abs(ours_px - ref)
    assert err.mean() < 1.0, f"mean {err.mean():.2f}"
    assert np.percentile(err, 99) < 4.0


def test_serving_decode_eval_golden():
    """Serving/predict-path golden: JPEG bytes -> decode (native
    memory-source decoder or the cv2 fallback, both bound to the
    reference's cv2.imdecode + square cv2.resize contract,
    /root/reference/data/dataset.py:117-120) -> eval_transform, checked
    value-level against the cv2 reference decode + an f64 AA-bicubic
    resize + normalize chain."""
    cv2 = pytest.importorskip("cv2")
    from aihab_clip_tpu.native import native_decode_resize_mem
    from aihab_clip_tpu.ops.preprocess import _eval_weight_mats

    # smooth photo-like non-square source (pure noise is adversarial to
    # JPEG and would measure codec error, not pipeline error)
    hh, ww = 585, 439
    yy, xx = np.mgrid[0:hh, 0:ww].astype(np.float32)
    img = np.stack([
        127 + 90 * np.sin(yy / 37.0) * np.cos(xx / 23.0),
        127 + 80 * np.cos(yy / 53.0 + 1.0),
        127 + 70 * np.sin(xx / 41.0 + 2.0),
    ], axis=-1).clip(0, 255).astype(np.uint8)
    ok, buf = cv2.imencode(
        ".jpg", img[..., ::-1], [cv2.IMWRITE_JPEG_QUALITY, 95])
    assert ok
    data = buf.tobytes()
    decode_dim, res = 439, 224

    # the serving engine's decode contract (serving.py decode_bytes):
    # native memory-source decoder with DCT prescale, cv2 fallback
    dec = native_decode_resize_mem(data, decode_dim,
                                   prescale_min=2 * decode_dim)
    if dec is None:
        bgr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        dec = cv2.cvtColor(cv2.resize(bgr, (decode_dim, decode_dim)),
                           cv2.COLOR_BGR2RGB)

    # reference decode: cv2 + square resize (the bulk-loader semantics);
    # at this source size the prescale rule decodes full-res, so the
    # native decode must agree with cv2 almost everywhere
    bgr = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
    ref_dec = cv2.cvtColor(cv2.resize(bgr, (decode_dim, decode_dim)),
                           cv2.COLOR_BGR2RGB)
    dec_err = np.abs(dec.astype(np.int32) - ref_dec.astype(np.int32))
    assert dec_err.mean() < 1.0, f"decode mean |d| {dec_err.mean():.2f}"

    # eval_transform on the decoded square vs the f64 reference chain
    ours = np.asarray(eval_transform(jnp.asarray(dec[None]), res))[0]
    rh, rw = _eval_weight_mats(decode_dim, decode_dim, res)
    ref = np.einsum("oh,hwc->owc", rh.astype(np.float64),
                    dec.astype(np.float64))
    ref = np.einsum("pw,owc->opc", rw.astype(np.float64), ref)
    ref = (ref / 255.0 - np.array(CLIP_MEAN)) / np.array(CLIP_STD)
    err = np.abs(ours - ref)
    assert err.max() < 0.01, f"eval max |d| {err.max():.4f}"  # ~0.3 px


def test_normalize_stats_per_family(rng):
    """SigLIP pipelines must normalize with 0.5/0.5, CLIP with CLIP stats;
    the transforms must honor the (mean, std) arguments."""
    from aihab_clip_tpu.models.clip import CLIP_ARCHS
    from aihab_clip_tpu.models.siglip import SIGLIP_ARCHS
    from aihab_clip_tpu.ops.preprocess import (
        CLIP_MEAN,
        CLIP_STD,
        normalize_stats_for,
    )

    assert normalize_stats_for(CLIP_ARCHS["Tiny"]) == (CLIP_MEAN, CLIP_STD)
    sm, ss = normalize_stats_for(SIGLIP_ARCHS["SigLIP-Tiny"])
    assert sm == (0.5, 0.5, 0.5) and ss == (0.5, 0.5, 0.5)

    img = _rand_u8(rng, b=1, h=64, w=64)
    a = np.asarray(eval_transform(jnp.asarray(img), 32, mean=sm, std=ss))
    b = np.asarray(eval_transform(jnp.asarray(img), 32))
    # (x/255 - 0.5)/0.5 differs from CLIP stats everywhere nonconstant
    assert not np.allclose(a, b)
    # invert the 0.5/0.5 normalization: recovered pixels in [0, 1]
    px = a * 0.5 + 0.5
    assert px.min() >= -0.01 and px.max() <= 1.01


def test_eval_resize_size_truncates_like_torchvision():
    """torchvision Resize(size:int) TRUNCATES the long side
    (int(size * long / short)); round() would shift the center-crop window
    one source row for many sizes (e.g. 305x256 @224 -> long 266, not
    267)."""
    from aihab_clip_tpu.ops.preprocess import _eval_weight_mats

    for (h, w, res), (eh, ew) in [
        ((305, 256, 224), (266, 224)),   # 224*305/256 = 266.875 -> 266
        ((640, 480, 224), (298, 224)),   # 224*640/480 = 298.67 -> 298
        ((256, 305, 224), (224, 266)),
        ((96, 96, 64), (64, 64)),
    ]:
        rh, rw = _eval_weight_mats(h, w, res)
        # crop rows are a slice of the full resize matrix; recover the
        # pre-crop long side from the weight matrices' source dims and
        # the crop offset math by rebuilding them directly
        from aihab_clip_tpu.ops.preprocess import _resize_weight_mat
        np.testing.assert_allclose(
            rh, _resize_weight_mat(h, eh)[(eh - res) // 2:
                                          (eh - res) // 2 + res])
        np.testing.assert_allclose(
            rw, _resize_weight_mat(w, ew)[(ew - res) // 2:
                                          (ew - res) // 2 + res])


def test_center_and_bottom_crop(rng):
    img = _rand_u8(rng, b=1, h=96, w=96)
    c = np.asarray(center_crop(jnp.asarray(img), 64))
    np.testing.assert_array_equal(c[0], img[0, 16:80, 16:80])
    bq = np.asarray(bottom_square_crop(jnp.asarray(img), 64))
    np.testing.assert_array_equal(bq[0], img[0, 32:, 16:80])


def test_affine_warp_identity(rng):
    img = _rand_u8(rng, b=1, h=32, w=32)
    ident = jnp.asarray([[[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]])
    out = np.asarray(affine_warp(jnp.asarray(img), ident, 32))
    np.testing.assert_allclose(out[0], img[0].astype(np.float32), atol=1e-3)


def test_affine_warp_scale_matches_crop(rng):
    """Warp with a pure crop matrix == slicing (integer crop, unit scale)."""
    img = _rand_u8(rng, b=1, h=64, w=64)
    # crop box (top=8, left=16, 32x32) at output size 32 -> scale 1
    mat = jnp.asarray([[[1.0, 0.0, 16.0], [0.0, 1.0, 8.0]]])
    out = np.asarray(affine_warp(jnp.asarray(img), mat, 32))
    np.testing.assert_allclose(out[0], img[0, 8:40, 16:48].astype(np.float32),
                               atol=1e-3)


def test_train_transform_shapes_and_range(rng):
    img = _rand_u8(rng, b=4, h=96, w=96)
    key = jax.random.key(0)
    out = np.asarray(train_transform(jnp.asarray(img), key, 64,
                                     crop_mode="random", flip=True,
                                     rotation=True))
    assert out.shape == (4, 64, 64, 3)
    # normalized range sanity: pixel values in [0,255] map within a few stds
    assert np.isfinite(out).all()
    assert out.min() > -3.0 and out.max() < 3.0


def test_train_transform_deterministic_per_key(rng):
    img = jnp.asarray(_rand_u8(rng, b=2, h=96, w=96))
    key = jax.random.key(7)
    a = np.asarray(train_transform(img, key, 64, crop_mode="random"))
    b = np.asarray(train_transform(img, key, 64, crop_mode="random"))
    c = np.asarray(train_transform(img, jax.random.key(8), 64, crop_mode="random"))
    np.testing.assert_array_equal(a, b)
    assert np.abs(a - c).max() > 1e-3  # different key -> different crops


def test_train_transform_center_mode_matches_eval_shape(rng):
    img = jnp.asarray(_rand_u8(rng, b=2, h=96, w=96))
    out = np.asarray(train_transform(img, jax.random.key(0), 64,
                                     crop_mode="center"))
    assert out.shape == (2, 64, 64, 3)


def test_flip_distribution(rng):
    """With flip=True roughly half the images are mirrored."""
    img = np.zeros((64, 32, 32, 3), np.uint8)
    img[:, :, :16, :] = 255  # left half white
    out = np.asarray(train_transform(jnp.asarray(img), jax.random.key(3), 32,
                                     crop_mode="center", flip=True))
    # decide flipped-ness by comparing left/right mean brightness
    left = out[:, :, :16, :].mean(axis=(1, 2, 3))
    right = out[:, :, 16:, :].mean(axis=(1, 2, 3))
    flipped = (right > left).sum()
    assert 10 < flipped < 54


def test_rotation_fills_corners_with_zero(rng):
    img = np.full((8, 64, 64, 3), 255, np.uint8)
    out = np.asarray(train_transform(jnp.asarray(img), jax.random.key(1), 64,
                                     crop_mode="center", rotation=True))
    # un-normalize; rotated corners must contain zero-filled pixels for
    # at least some images (uniform(-30,30) is rarely ~0 for all 8)
    px = (out * np.array(CLIP_STD) + np.array(CLIP_MEAN)) * 255.0
    corner_min = px[:, 0, 0, :].min()
    assert corner_min < 50.0


def test_random_crop_zoom_in_only(rng):
    """RandomResizedCrop(scale<=1) never samples outside the image: output
    of a constant image stays constant."""
    img = np.full((4, 96, 96, 3), 128, np.uint8)
    out = np.asarray(train_transform(jnp.asarray(img), jax.random.key(5), 64,
                                     crop_mode="random"))
    px = (out * np.array(CLIP_STD) + np.array(CLIP_MEAN)) * 255.0
    np.testing.assert_allclose(px, 128.0, atol=1.0)
