"""Resampler parity vs torch F.interpolate and end-to-end transform parity
vs torch compositions of the reference processor stacks."""
import numpy as np
import pytest

import jax.numpy as jnp

from missm_tpu.ops.resize import (
    center_crop, resize2d, resize_matrix, short_side_resize_shape,
)
from missm_tpu.ops.image_transforms import (
    OPENAI_MEAN, OPENAI_STD, depth_transform, image_transform,
    video_transform,
)

torch = pytest.importorskip("torch")
import torch.nn.functional as F


@pytest.mark.parametrize("inshape,outshape", [((32, 48), (17, 23)),
                                              ((17, 23), (32, 48)),
                                              ((224, 301), (224, 224))])
def test_bicubic_antialias_parity(rng, inshape, outshape):
    img = rng.standard_normal((2, 3) + inshape).astype(np.float32)
    ref = F.interpolate(torch.tensor(img), size=outshape, mode="bicubic",
                        antialias=True, align_corners=False).numpy()
    got = np.asarray(resize2d(jnp.asarray(img), outshape, "bicubic",
                              antialias=True))
    np.testing.assert_allclose(got, ref, atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("inshape,outshape", [((33, 47), (224, 224)),
                                              ((240, 320), (224, 299))])
def test_bilinear_noaa_parity(rng, inshape, outshape):
    img = rng.standard_normal((1, 3) + inshape).astype(np.float32)
    ref = F.interpolate(torch.tensor(img), size=outshape, mode="bilinear",
                        antialias=False, align_corners=False).numpy()
    got = np.asarray(resize2d(jnp.asarray(img), outshape, "bilinear",
                              antialias=False))
    # f32 accumulation-order noise between the matmul and gather formulations
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=2e-3)


def test_bicubic_upsample_parity(rng):
    img = rng.standard_normal((1, 1, 7, 7)).astype(np.float32)
    ref = F.interpolate(torch.tensor(img), size=(16, 16), mode="bicubic",
                        antialias=True, align_corners=False).numpy()
    got = np.asarray(resize2d(jnp.asarray(img), (16, 16), "bicubic", True))
    np.testing.assert_allclose(got, ref, atol=3e-5, rtol=1e-4)


def _torch_image_ref(img_hwc):
    """torchvision-equivalent: ToTensor -> Resize(224, bicubic, antialias) ->
    CenterCrop(224) -> Normalize."""
    x = torch.tensor(img_hwc).permute(2, 0, 1).float() / 255.0
    h, w = x.shape[-2:]
    oh, ow = short_side_resize_shape(h, w, 224)
    x = F.interpolate(x[None], size=(oh, ow), mode="bicubic",
                      antialias=True, align_corners=False)[0]
    top = int(round((oh - 224) / 2.0))
    left = int(round((ow - 224) / 2.0))
    x = x[:, top:top + 224, left:left + 224]
    mean = torch.tensor(OPENAI_MEAN).view(3, 1, 1)
    std = torch.tensor(OPENAI_STD).view(3, 1, 1)
    return ((x - mean) / std).numpy()


def test_image_transform_parity(rng):
    img = rng.integers(0, 256, size=(240, 320, 3), dtype=np.uint8)
    got = np.asarray(image_transform(jnp.asarray(img)))
    ref = _torch_image_ref(img)
    assert got.shape == (3, 224, 224)
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=2e-3)


def test_video_transform_parity(rng):
    frames = rng.integers(0, 256, size=(4, 120, 160, 3), dtype=np.uint8)
    got = np.asarray(video_transform(jnp.asarray(frames), flip=False))
    assert got.shape == (3, 4, 224, 224)
    # torch reference: /255 -> normalize -> bilinear short-side -> crop
    x = torch.tensor(frames).permute(3, 0, 1, 2).float() / 255.0
    mean = torch.tensor(OPENAI_MEAN).view(3, 1, 1, 1)
    std = torch.tensor(OPENAI_STD).view(3, 1, 1, 1)
    x = (x - mean) / std
    oh, ow = short_side_resize_shape(120, 160, 224)
    x = F.interpolate(x.permute(1, 0, 2, 3), size=(oh, ow), mode="bilinear",
                      align_corners=False).permute(1, 0, 2, 3)
    top = int(round((oh - 224) / 2.0))
    left = int(round((ow - 224) / 2.0))
    ref = x[..., top:top + 224, left:left + 224].numpy()
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=2e-3)


def test_video_flip():
    frames = np.zeros((1, 224, 224, 3), np.uint8)
    frames[0, :, :10] = 255
    a = np.asarray(video_transform(jnp.asarray(frames), flip=False))
    b = np.asarray(video_transform(jnp.asarray(frames), flip=True))
    np.testing.assert_allclose(a, b[..., ::-1], atol=1e-6)


def test_depth_transform_parity(rng):
    """DepthNorm -> Resize(224, bicubic AA) -> CenterCrop -> Normalize
    (reference depth/processing_depth.py:44-56)."""
    depth = rng.integers(0, 20000, size=(240, 320)).astype(np.float32)
    got = np.asarray(depth_transform(jnp.asarray(depth)))
    assert got.shape == (3, 224, 224)
    d = torch.tensor(depth) / 1000.0
    d = d.clamp(min=0.01).clamp(max=10.0) / 10.0
    x = d[None, None].repeat(1, 3, 1, 1)
    oh, ow = short_side_resize_shape(240, 320, 224)
    x = F.interpolate(x, size=(oh, ow), mode="bicubic", antialias=True,
                      align_corners=False)[0]
    top = int(round((oh - 224) / 2.0))
    left = int(round((ow - 224) / 2.0))
    x = x[:, top:top + 224, left:left + 224]
    mean = torch.tensor(OPENAI_MEAN).view(3, 1, 1)
    std = torch.tensor(OPENAI_STD).view(3, 1, 1)
    ref = ((x - mean) / std).numpy()
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=2e-3)


def test_resize_matrix_rows_sum_to_one():
    m = resize_matrix(300, 224, "bicubic", True)
    np.testing.assert_allclose(m.sum(1), np.ones(224), atol=1e-6)
    m2 = resize_matrix(100, 224, "bilinear", False)
    np.testing.assert_allclose(m2.sum(1), np.ones(224), atol=1e-6)


def test_short_side_resize_shape_truncates_long_side():
    """torchvision Resize(int) computes int(size*long/short) (truncation)
    and pytorchvideo ShortSideScale floors — NOT round(). Independent
    arithmetic pin (the parity tests above build their torch reference
    through the same helper, so they cannot catch a rounding drift):
    240x320 at size 224 -> 224*320/240 = 298.67 -> 298."""
    from missm_tpu.ops.resize import short_side_resize_shape

    assert short_side_resize_shape(240, 320, 224) == (224, 298)
    assert short_side_resize_shape(320, 240, 224) == (298, 224)
    assert short_side_resize_shape(224, 224, 224) == (224, 224)
    # torchvision reference, when available, must agree
    try:
        from torchvision.transforms.functional import resize
        import torch
        img = torch.zeros(3, 240, 320)
        assert tuple(resize(img, 224, antialias=True).shape[-2:]) == (224, 298)
    except ImportError:
        pass
