"""SigLIP-so400m-style vision transformer with variable-resolution patch masks.

Behavioral parity targets: reference aria/model/vision_encoder.py:31-152 (which
wraps HF's Idefics2VisionTransformer with the post-layernorm removed) — a NaViT
patch-masked ViT: images arrive square (490/980) but padded bottom/right, with a
pixel mask marking real content.

TPU-first choices:
- Patch embedding is a reshape + one big matmul (a stride-14 valid conv is
  exactly that), not a conv — keeps everything on the MXU.
- Bucketized fractional position ids are computed vectorized over the whole
  batch (the HF version loops per sample).
- Layers are stacked and scanned.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import Array

from aria_tpu.config import VisionConfig
from aria_tpu.ops.activations import gelu_tanh
from aria_tpu.ops.attention import sdpa
from aria_tpu.ops.norms import layer_norm
from aria_tpu.ops.quant import linear as qlinear


class VisionOutput(NamedTuple):
    features: Array  # [N, P, D] patch features (no post-layernorm)
    patch_mask: Array  # [N, P] bool, True = real patch
    kv_ignore_mask: Array  # [N, P] bool, True = PADDING (for the projector)


def init_vit_params(rng: jax.Array, cfg: VisionConfig, dtype=jnp.bfloat16) -> dict:
    keys = iter(jax.random.split(rng, 12))

    def dense(key, shape, fan_in):
        return (jax.random.normal(key, shape, jnp.float32) * (fan_in**-0.5)).astype(dtype)

    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size
    patch_dim = cfg.num_channels * cfg.patch_size * cfg.patch_size
    P = cfg.patches_per_side**2
    return {
        "patch_embed_w": dense(next(keys), (patch_dim, D), patch_dim),
        "patch_embed_b": jnp.zeros((D,), dtype),
        "pos_embed": dense(next(keys), (P, D), D),
        "layers": {
            "ln1_w": jnp.ones((L, D), dtype),
            "ln1_b": jnp.zeros((L, D), dtype),
            "ln2_w": jnp.ones((L, D), dtype),
            "ln2_b": jnp.zeros((L, D), dtype),
            "wq": dense(next(keys), (L, D, D), D),
            "bq": jnp.zeros((L, D), dtype),
            "wk": dense(next(keys), (L, D, D), D),
            "bk": jnp.zeros((L, D), dtype),
            "wv": dense(next(keys), (L, D, D), D),
            "bv": jnp.zeros((L, D), dtype),
            "wo": dense(next(keys), (L, D, D), D),
            "bo": jnp.zeros((L, D), dtype),
            "fc1_w": dense(next(keys), (L, D, F), D),
            "fc1_b": jnp.zeros((L, F), dtype),
            "fc2_w": dense(next(keys), (L, F, D), F),
            "fc2_b": jnp.zeros((L, D), dtype),
        },
    }


def patch_attention_mask(pixel_mask: Array, patch_size: int) -> Array:
    """[N, H, W] bool pixel mask -> [N, nh, nw] bool patch mask.

    A patch is valid iff any of its pixels is valid (reference
    vision_encoder.py:132-145's unfold+sum>0).
    """
    N, H, W = pixel_mask.shape
    nh, nw = H // patch_size, W // patch_size
    grid = pixel_mask.reshape(N, nh, patch_size, nw, patch_size)
    return jnp.sum(grid, axis=(2, 4)) > 0


def _position_ids(patch_mask_2d: Array, patches_per_side: int) -> Array:
    """Vectorized NaViT bucketized position ids.

    Equivalent to HF Idefics2VisionEmbeddings: for each sample, the number of
    valid patch rows/cols is read from the mask's first column/row (valid
    regions are top-left rectangles), fractional coordinates are bucketized
    into ``patches_per_side`` buckets, and padding patches get id 0.
    """
    N, nh, nw = patch_mask_2d.shape
    n = patches_per_side
    nb_h = jnp.sum(patch_mask_2d[:, :, 0].astype(jnp.int32), axis=1)  # [N]
    nb_w = jnp.sum(patch_mask_2d[:, 0, :].astype(jnp.int32), axis=1)  # [N]

    rows = jnp.arange(nh, dtype=jnp.float32)
    cols = jnp.arange(nw, dtype=jnp.float32)
    # bucket = floor(i / nb * (1 - 1e-6) * n) — identical to bucketize over
    # uniform boundaries k/n with right=True.
    frac_h = rows[None, :] / jnp.maximum(nb_h[:, None], 1) * (1 - 1e-6)
    frac_w = cols[None, :] / jnp.maximum(nb_w[:, None], 1) * (1 - 1e-6)
    bucket_h = jnp.floor(frac_h * n).astype(jnp.int32)  # [N, nh]
    bucket_w = jnp.floor(frac_w * n).astype(jnp.int32)  # [N, nw]

    pos = bucket_h[:, :, None] * n + bucket_w[:, None, :]  # [N, nh, nw]
    pos = jnp.where(patch_mask_2d, pos, 0)
    return pos.reshape(N, nh * nw)


def _extract_patches(pixel_values: Array, patch_size: int) -> Array:
    """[N, C, H, W] -> [N, nh*nw, C*ps*ps], flattened in torch-conv weight order."""
    N, C, H, W = pixel_values.shape
    nh, nw = H // patch_size, W // patch_size
    x = pixel_values.reshape(N, C, nh, patch_size, nw, patch_size)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [N, nh, nw, C, ps, ps]
    return x.reshape(N, nh * nw, C * patch_size * patch_size)


def vit_forward(params: dict, cfg: VisionConfig, pixel_values: Array, pixel_mask: Array) -> VisionOutput:
    """pixel_values: [N, C, S, S]; pixel_mask: [N, S, S] bool."""
    pm2d = patch_attention_mask(pixel_mask, cfg.patch_size)  # [N, nh, nw]
    pos_ids = _position_ids(pm2d, cfg.patches_per_side)  # [N, P]
    pmask = pm2d.reshape(pm2d.shape[0], -1)  # [N, P]

    patches = _extract_patches(pixel_values, cfg.patch_size)
    pw = params["patch_embed_w"]
    dtype = pw["q"].dtype if isinstance(pw, dict) else pw.dtype
    if dtype == jnp.int8:
        dtype = jnp.bfloat16
    x = (
        qlinear(patches.astype(dtype), pw, "npk,kd->npd").astype(dtype)
        + params["patch_embed_b"]
    )
    x = x + params["pos_embed"][pos_ids].astype(dtype)

    # Padding-only attention mask: every query may attend every valid key.
    attn_mask = pmask[:, None, None, :]  # [N, 1, 1, P]
    H, Dh = cfg.num_heads, cfg.head_dim

    from aria_tpu.ops.backend import use_pallas

    flash = use_pallas() and pmask.shape[1] >= 256

    def body(h, layer):
        normed = layer_norm(h, layer["ln1_w"], layer["ln1_b"], cfg.layer_norm_eps)
        N, P, D = normed.shape

        def lin(t, w, b, spec):  # int8-capable projection, back to act dtype
            return (qlinear(t, w, spec) + b).astype(h.dtype)

        q = lin(normed, layer["wq"], layer["bq"], "npd,de->npe").reshape(N, P, H, Dh)
        k = lin(normed, layer["wk"], layer["bk"], "npd,de->npe").reshape(N, P, H, Dh)
        v = lin(normed, layer["wv"], layer["bv"], "npd,de->npe").reshape(N, P, H, Dh)
        if flash:
            from aria_tpu.ops.backend import kernel_interpret
            from aria_tpu.ops.vit_flash import vit_flash, vit_flash_enabled

            if vit_flash_enabled():
                # head-dim-on-sublanes kernel (ops/vit_flash.py): D=72 pads
                # to 80 sublane rows instead of 128 lanes
                import os

                att = vit_flash(
                    q, k, v, kv_valid=pmask,
                    bq=int(os.environ.get("ARIA_TPU_VIT_BQ", 512)),
                    bk=int(os.environ.get("ARIA_TPU_VIT_BK", 512)),
                    interpret=kernel_interpret(),
                ).reshape(N, P, D)
            else:
                # NaViT padding via segment ids (pad tokens = segment 0
                # attend only each other; outputs ignored downstream).
                from aria_tpu.ops.flash import flash_sdpa

                att = flash_sdpa(q, k, v, q_valid=pmask,
                                 kv_valid=pmask).reshape(N, P, D)
        else:
            att = sdpa(q, k, v, attn_mask).reshape(N, P, D)
        att = lin(att, layer["wo"], layer["bo"], "npd,de->npe")
        h = h + att
        normed = layer_norm(h, layer["ln2_w"], layer["ln2_b"], cfg.layer_norm_eps)
        mlp = gelu_tanh(lin(normed, layer["fc1_w"], layer["fc1_b"], "npd,df->npf"))
        mlp = lin(mlp, layer["fc2_w"], layer["fc2_b"], "npf,fd->npd")
        return h + mlp, None

    x, _ = jax.lax.scan(body, x, params["layers"])
    # No post-layernorm (reference vision_encoder.py:43-67 IdentityOp).
    return VisionOutput(x, pmask, jnp.logical_not(pmask))
