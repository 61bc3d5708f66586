"""Fused image preprocessing: resize -> center-crop -> rescale -> normalize.

The reference runs CLIP image processors on CPU per example inside the
collator (PIL + numpy; ``src/data/llava_data.py:160-166``,
``src/data/vilt_data.py:405-408``) -- a classic input-pipeline bottleneck.
Here the whole pipeline is a single jittable function over a uint8 batch, so
it can run on-device (fused by XLA into a few kernels, overlapping the
previous step) or vectorized on host via numpy as a fallback. CLIP
normalization constants are the published OpenAI values.
"""

import jax
import jax.numpy as jnp
import numpy as np

CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def resize_bilinear(images: jax.Array, out_h: int, out_w: int) -> jax.Array:
    """Batched bilinear resize, NHWC."""
    b, h, w, c = images.shape
    return jax.image.resize(images, (b, out_h, out_w, c), method="bilinear")


def preprocess_images(
    images: jax.Array,  # [B, H, W, 3] uint8 or float in [0, 255]
    size: int,
    mean=CLIP_MEAN,
    std=CLIP_STD,
    crop: bool = True,
) -> jax.Array:
    """CLIP-style preprocessing as one fused jittable op.

    Shortest side scales to ``size`` then center-crops to (size, size)
    (matching CLIPImageProcessor resize+center_crop), rescales 1/255, and
    normalizes. Returns float32 NHWC.
    """
    x = images.astype(jnp.float32)
    b, h, w, c = x.shape
    # scale shortest side to `size` (static shapes: compute the resized dims
    # from the static input shape)
    if crop:
        scale = size / min(h, w)
        rh, rw = max(size, int(round(h * scale))), max(size, int(round(w * scale)))
        x = resize_bilinear(x, rh, rw)
        top, left = (rh - size) // 2, (rw - size) // 2
        x = jax.lax.dynamic_slice(x, (0, top, left, 0), (b, size, size, c))
    else:
        x = resize_bilinear(x, size, size)
    x = x / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def preprocess_images_host(images: list, size: int, mean=CLIP_MEAN, std=CLIP_STD) -> np.ndarray:
    """Host-side fallback over PIL images / arrays of varying sizes: resize
    each to (size, size) then normalize the stacked batch vectorized."""
    out = np.empty((len(images), size, size, 3), np.float32)
    for i, im in enumerate(images):
        arr = _to_array(im, size)
        out[i] = arr
    out /= 255.0
    out -= np.asarray(mean, np.float32)
    out /= np.asarray(std, np.float32)
    return out


def _to_array(im, size: int) -> np.ndarray:
    if hasattr(im, "convert"):  # PIL image
        im = im.convert("RGB")
        if im.size != (size, size):
            im = im.resize((size, size))
        return np.asarray(im, np.float32)
    arr = np.asarray(im, np.float32)
    if arr.ndim == 2:
        arr = np.stack([arr] * 3, axis=-1)
    if arr.shape[:2] != (size, size):
        arr = np.asarray(jax.image.resize(jnp.asarray(arr), (size, size, arr.shape[-1]), "bilinear"))
    if arr.shape[-1] == 1:
        arr = np.repeat(arr, 3, axis=-1)
    return arr


def patchify(images: jax.Array, patch: int) -> jax.Array:
    """[B, H, W, C] -> [B, (H/p)*(W/p), p*p*C] as a pure reshape/transpose
    (lands the patch embedding on the MXU as one matmul)."""
    b, h, w, c = images.shape
    gh, gw = h // patch, w // patch
    x = images.reshape(b, gh, patch, gw, patch, c).transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, gh * gw, patch * patch * c)
