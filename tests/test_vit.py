"""JAX ViT tower parity vs an open_clip-style torch VisionTransformer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.preprocessing.vit import (
    JaxViTEncoder,
    ViTConfig,
    init_vit_params,
    vit_forward,
    vit_from_torch_state_dict,
)


def _torch_vit(image_size=32, patch=8, width=64, layers=2, heads=4,
               out_dim=16, seed=0):
    """Minimal torch ViT with open_clip's module names and forward semantics
    (conv1 / class_embedding / positional_embedding / ln_pre /
    transformer.resblocks.{i} / ln_post / proj)."""
    import torch
    from torch import nn

    torch.manual_seed(seed)
    grid = image_size // patch

    class Block(nn.Module):
        def __init__(self):
            super().__init__()
            self.ln_1 = nn.LayerNorm(width)
            self.attn = nn.MultiheadAttention(width, heads, batch_first=True)
            self.ln_2 = nn.LayerNorm(width)
            self.mlp = nn.Sequential()
            self.mlp.add_module("c_fc", nn.Linear(width, width * 4))
            self.mlp.add_module("gelu", nn.GELU())
            self.mlp.add_module("c_proj", nn.Linear(width * 4, width))

        def forward(self, x):
            y = self.ln_1(x)
            x = x + self.attn(y, y, y, need_weights=False)[0]
            x = x + self.mlp(self.ln_2(x))
            return x

    class Transformer(nn.Module):
        def __init__(self):
            super().__init__()
            self.resblocks = nn.ModuleList([Block() for _ in range(layers)])

        def forward(self, x):
            for b in self.resblocks:
                x = b(x)
            return x

    class ViT(nn.Module):
        def __init__(self):
            super().__init__()
            self.conv1 = nn.Conv2d(3, width, patch, patch, bias=False)
            self.class_embedding = nn.Parameter(torch.randn(width) * 0.02)
            self.positional_embedding = nn.Parameter(
                torch.randn(grid * grid + 1, width) * 0.02)
            self.ln_pre = nn.LayerNorm(width)
            self.transformer = Transformer()
            self.ln_post = nn.LayerNorm(width)
            self.proj = nn.Parameter(torch.randn(width, out_dim) * 0.02)

        def forward(self, img):  # img [n, 3, H, W]
            n = img.shape[0]
            x = self.conv1(img).reshape(n, width, -1).permute(0, 2, 1)
            cls = self.class_embedding.expand(n, 1, -1)
            x = torch.cat([cls, x], dim=1) + self.positional_embedding
            x = self.ln_pre(x)
            x = self.transformer(x)
            x = self.ln_post(x[:, 0])
            return x @ self.proj

    return ViT()


def test_vit_torch_parity():
    import torch

    model = _torch_vit()
    model.eval()
    sd = {f"visual.{k}": v.detach().numpy() for k, v in
          model.state_dict().items()}
    cfg, params = vit_from_torch_state_dict(sd, heads=4)
    assert cfg.width == 64 and cfg.layers == 2 and cfg.out_dim == 16
    assert cfg.heads == 4

    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((3, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(imgs.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(vit_forward(params, jnp.asarray(imgs), cfg))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vit_no_projection_branch():
    import torch

    model = _torch_vit(seed=1)
    sd = {f"visual.{k}": v.detach().numpy() for k, v in
          model.state_dict().items()}
    cfg, params = vit_from_torch_state_dict(sd, heads=4)
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.standard_normal((2, 32, 32, 3)).astype(np.float32))
    raw = vit_forward(params, imgs, cfg, project=False)
    assert raw.shape == (2, 64)


def test_jax_vit_encoder_pipeline(tmp_path):
    """JaxViTEncoder plugs into TileEmbedder and writes reference-schema bags."""
    from madeleine_tpu.data.io import load_features
    from madeleine_tpu.preprocessing.tile_embedder import TileEmbedder

    cfg = ViTConfig(image_size=32, patch_size=8, width=64, layers=1, heads=4,
                    out_dim=16)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    enc = JaxViTEncoder(cfg, params)

    rng = np.random.default_rng(2)
    img = np.full((512, 512, 3), 245, np.uint8)
    img[100:300, 100:300] = rng.integers(60, 180, (200, 200, 3))
    mask = np.zeros((512, 512), np.uint8)
    mask[100:300, 100:300] = 1

    emb = TileEmbedder(encoder=enc, target_patch_size=64, target_mag=10,
                       batch_size=8, save_path=str(tmp_path))
    out = emb.embed_tiles(img, mask, "s", pixel_size=1.0)
    feats = load_features(out)
    assert feats.shape[1] == 16
    assert feats.shape[0] > 0
    assert np.all(np.isfinite(feats))
