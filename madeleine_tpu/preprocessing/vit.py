"""TPU-native ViT image tower — the tile encoder's compute core.

The reference embeds tiles with CONCH's ViT-B/16 through torch on GPU
(ref: conch_patch_embedder.py:93-125). This module runs an open_clip-style
vision transformer natively in JAX/XLA on TPU:

- functional ViT (conv patch embed -> cls token + learned pos emb -> pre-norm
  transformer blocks -> final LN -> cls pooled -> optional projection);
- `vit_from_torch_state_dict` maps open_clip ``visual.*`` checkpoints (the
  layout CONCH uses) into the pytree, so users with the gated CONCH weights
  run the tower on TPU instead of torch/GPU;
- `JaxViTEncoder` adapts it to the TileEmbedder protocol with CLIP pixel
  normalization and batched jit execution.

Numerics follow the torch modules: exact-erf GELU where the checkpoint used
it (open_clip ViT uses nn.GELU default), LN eps 1e-5, fp32 softmax.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from madeleine_tpu.models.abmil import dot_precision, layer_norm

Params = Dict[str, Any]

CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    image_size: int = 224
    patch_size: int = 16
    width: int = 768
    layers: int = 12
    heads: int = 12
    mlp_ratio: float = 4.0
    out_dim: Optional[int] = 512      # projection dim (None = raw width)

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def seq_len(self) -> int:
        return self.grid * self.grid + 1


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------

def init_vit_params(rng, cfg: ViTConfig, dtype=jnp.float32) -> Params:
    keys = jax.random.split(rng, 4 + cfg.layers)
    w = cfg.width
    scale = w ** -0.5

    def dense(key, i, o):
        return {"w": jax.random.normal(key, (i, o), dtype) * (i ** -0.5),
                "b": jnp.zeros((o,), dtype)}

    params: Params = {
        "patch_embed": {  # conv k=p s=p == per-patch linear [p*p*3, w]
            "w": jax.random.normal(keys[0],
                                   (cfg.patch_size * cfg.patch_size * 3, w),
                                   dtype) * scale,
        },
        "cls": jax.random.normal(keys[1], (w,), dtype) * scale,
        "pos": jax.random.normal(keys[2], (cfg.seq_len, w), dtype) * scale,
        "ln_pre": {"scale": jnp.ones((w,), dtype),
                   "bias": jnp.zeros((w,), dtype)},
        "ln_post": {"scale": jnp.ones((w,), dtype),
                    "bias": jnp.zeros((w,), dtype)},
        "blocks": [],
    }
    mlp_dim = int(w * cfg.mlp_ratio)
    for i in range(cfg.layers):
        k1, k2, k3, k4 = jax.random.split(keys[4 + i], 4)
        params["blocks"].append({
            "ln1": {"scale": jnp.ones((w,), dtype),
                    "bias": jnp.zeros((w,), dtype)},
            "qkv": dense(k1, w, 3 * w),
            "out": dense(k2, w, w),
            "ln2": {"scale": jnp.ones((w,), dtype),
                    "bias": jnp.zeros((w,), dtype)},
            "fc1": dense(k3, w, mlp_dim),
            "fc2": dense(k4, mlp_dim, w),
        })
    if cfg.out_dim:
        params["proj"] = jax.random.normal(keys[3], (w, cfg.out_dim),
                                           dtype) * scale
    return params


# ---------------------------------------------------------------------------
# Forward
# ---------------------------------------------------------------------------

def _dense(p, x):
    return jnp.dot(x, p["w"], precision=dot_precision(x.dtype)) + p["b"]


def _attention(block: Params, x: jnp.ndarray, heads: int) -> jnp.ndarray:
    """Standard MHA (torch nn.MultiheadAttention semantics: packed qkv)."""
    n, s, w = x.shape
    hd = w // heads
    qkv = _dense(block["qkv"], x)                       # [n, s, 3w]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads_split(a):
        return a.reshape(n, s, heads, hd).transpose(0, 2, 1, 3)

    q, k, v = heads_split(q), heads_split(k), heads_split(v)
    logits = jnp.einsum("nhqd,nhkd->nhqk", q, k,
                        precision=dot_precision(x.dtype)) / jnp.sqrt(
        jnp.asarray(hd, jnp.float32)).astype(x.dtype)
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("nhqk,nhkd->nhqd", attn, v,
                     precision=dot_precision(x.dtype))
    out = out.transpose(0, 2, 1, 3).reshape(n, s, w)
    return _dense(block["out"], out)


def vit_forward(params: Params, images: jnp.ndarray, cfg: ViTConfig,
                *, project: bool = True) -> jnp.ndarray:
    """images: [n, H, W, 3] float in [0, 1]-normalized CLIP space already.
    Returns [n, out_dim] (cls pooled; projected when `project` and proj
    weights exist — CONCH's encode_image(proj_contrast=False) equivalent)."""
    n, H, W, _ = images.shape
    p = cfg.patch_size
    g = H // p
    # conv k=p s=p as unfold+matmul (MXU-shaped): [n, g, g, p*p*3] @ [p*p*3, w]
    x = images.reshape(n, g, p, g, p, 3).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(n, g * g, p * p * 3)
    x = jnp.dot(x, params["patch_embed"]["w"],
                precision=dot_precision(x.dtype))
    cls = jnp.broadcast_to(params["cls"][None, None, :], (n, 1, x.shape[-1]))
    x = jnp.concatenate([cls, x], axis=1) + params["pos"][None, :, :]
    x = layer_norm(x, params["ln_pre"])
    for block in params["blocks"]:
        x = x + _attention(block, layer_norm(x, block["ln1"]), cfg.heads)
        h = layer_norm(x, block["ln2"])
        h = jax.nn.gelu(_dense(block["fc1"], h), approximate=False)
        x = x + _dense(block["fc2"], h)
    pooled = layer_norm(x[:, 0], params["ln_post"])
    if project and "proj" in params:
        pooled = jnp.dot(pooled, params["proj"],
                         precision=dot_precision(pooled.dtype))
    return pooled


# ---------------------------------------------------------------------------
# torch (open_clip `visual.*`) bridge
# ---------------------------------------------------------------------------

def vit_from_torch_state_dict(sd: Dict[str, np.ndarray],
                              prefix: str = "visual.",
                              dtype=jnp.float32,
                              heads: Optional[int] = None):
    """open_clip VisionTransformer state_dict -> (ViTConfig, params).

    Expected keys (the layout CONCH's image tower uses): ``conv1.weight``,
    ``class_embedding``, ``positional_embedding``, ``ln_pre/ln_post.{weight,
    bias}``, ``transformer.resblocks.{i}.{ln_1,ln_2}.{weight,bias}``,
    ``...attn.{in_proj_weight,in_proj_bias,out_proj.weight,out_proj.bias}``,
    ``...mlp.{c_fc,c_proj}.{weight,bias}``, optional ``proj``."""
    def g(name):
        key = prefix + name
        if key not in sd:
            raise KeyError(f"missing {key}")
        return np.asarray(sd[key])

    conv = g("conv1.weight")                       # [w, 3, p, p]
    w, _, p, _ = conv.shape
    pos = g("positional_embedding")                # [seq, w]
    grid = int(round((pos.shape[0] - 1) ** 0.5))
    n_layers = 0
    while f"{prefix}transformer.resblocks.{n_layers}.ln_1.weight" in sd:
        n_layers += 1
    proj = sd.get(prefix + "proj")
    if heads is None:
        heads = w // 64   # open_clip convention (head_dim 64); the state_dict
                          # does not record head count — override if different

    cfg = ViTConfig(image_size=grid * p, patch_size=p, width=w,
                    layers=n_layers, heads=heads,
                    out_dim=None if proj is None else proj.shape[1])

    def ln(name):
        return {"scale": jnp.asarray(g(name + ".weight"), dtype),
                "bias": jnp.asarray(g(name + ".bias"), dtype)}

    # conv [w, 3, p, p] -> unfold layout [p*p*3, w]: our patch vector is
    # (row-major p x p, channel minor)
    conv_w = conv.transpose(2, 3, 1, 0).reshape(p * p * 3, w)
    params: Params = {
        "patch_embed": {"w": jnp.asarray(conv_w, dtype)},
        "cls": jnp.asarray(g("class_embedding"), dtype),
        "pos": jnp.asarray(pos, dtype),
        "ln_pre": ln("ln_pre"),
        "ln_post": ln("ln_post"),
        "blocks": [],
    }
    for i in range(n_layers):
        base = f"transformer.resblocks.{i}."
        in_w = g(base + "attn.in_proj_weight")     # [3w, w]
        in_b = g(base + "attn.in_proj_bias")
        params["blocks"].append({
            "ln1": ln(base + "ln_1"),
            "qkv": {"w": jnp.asarray(in_w.T, dtype),
                    "b": jnp.asarray(in_b, dtype)},
            "out": {"w": jnp.asarray(g(base + "attn.out_proj.weight").T, dtype),
                    "b": jnp.asarray(g(base + "attn.out_proj.bias"), dtype)},
            "ln2": ln(base + "ln_2"),
            "fc1": {"w": jnp.asarray(g(base + "mlp.c_fc.weight").T, dtype),
                    "b": jnp.asarray(g(base + "mlp.c_fc.bias"), dtype)},
            "fc2": {"w": jnp.asarray(g(base + "mlp.c_proj.weight").T, dtype),
                    "b": jnp.asarray(g(base + "mlp.c_proj.bias"), dtype)},
        })
    if proj is not None:
        params["proj"] = jnp.asarray(proj, dtype)
    return cfg, params


# ---------------------------------------------------------------------------
# Tile-encoder adapter
# ---------------------------------------------------------------------------

class JaxViTEncoder:
    """TileEncoder protocol: uint8 tiles -> ViT features, batched on TPU."""

    def __init__(self, cfg: ViTConfig, params: Params, dtype=None,
                 project: bool = True):
        self.cfg = cfg
        self.dtype = dtype
        self.dim = cfg.out_dim or cfg.width
        import functools

        self._fwd = jax.jit(functools.partial(vit_forward, cfg=cfg,
                                              project=project))
        self.params = (params if dtype is None
                       else jax.tree.map(lambda x: x.astype(dtype), params))

    def __call__(self, tiles: np.ndarray) -> np.ndarray:
        import cv2

        s = self.cfg.image_size
        if tiles.shape[1] != s:
            tiles = np.stack([
                cv2.resize(t, (s, s), interpolation=cv2.INTER_LINEAR)
                for t in tiles])
        x = tiles.astype(np.float32) / 255.0
        x = (x - CLIP_MEAN) / CLIP_STD
        x = jnp.asarray(x, self.dtype) if self.dtype else jnp.asarray(x)
        return np.asarray(self._fwd(self.params, x), np.float32)


def load_torch_vision_tower(checkpoint_path: str, prefix: str = "visual.",
                            dtype=jnp.float32, heads: Optional[int] = None):
    """torch .pt/.bin checkpoint -> (ViTConfig, params)."""
    import torch

    sd = torch.load(checkpoint_path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    sd = {k: v.detach().float().numpy() if hasattr(v, "detach") else v
          for k, v in sd.items()}
    return vit_from_torch_state_dict(sd, prefix=prefix, dtype=dtype,
                                     heads=heads)
