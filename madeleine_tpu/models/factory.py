"""Checkpoint bridge + model factory.

Loads reference torch checkpoints (``model.pt`` state_dicts, ref:
madeleine/models/factory.py:16-39 and Model.py:28-41) into the JAX parameter
pytree, and exports back, so the two frameworks are drop-in interchangeable at
the artifact level.

Reference state_dict layout (ref: Model.py:80-91, 350-363; abmil.py:23-39):
  wsi_embedders.pre_attn.{0,4,8}.{weight,bias}   Linear layers
  wsi_embedders.pre_attn.{1,5,9}.{weight,bias}   LayerNorms
  wsi_embedders.attn.{h}.attention_a.0.{weight,bias}
  wsi_embedders.attn.{h}.attention_b.0.{weight,bias}
  wsi_embedders.attn.{h}.attention_c.{weight,bias}
  token_projector.{weight,bias}
  projector.{weight,bias}
  embedding.weight                               (only with stain encodings)

torch Linear stores weight as [out, in]; JAX kernels here are [in, out].
A leading ``module.`` prefix (nn.DataParallel artifact) is stripped, matching
ref: Model.py:31-40 / utils/utils.py:115-120.

Layout conversion: the reference's hidden*n_heads axis is head-MINOR
(index = e * nh + h, einops '(e c)', ref Model.py:396); this build runs
head-MAJOR internally (index = h * hidden + e) for contiguous per-head slices
on TPU. The bridge permutes fc3/ln3 columns and projector/token_projector rows
on import, and inverts the permutation on export — torch-side artifacts stay
bit-compatible with the reference.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models.madeleine import init_madeleine_params

Params = Dict[str, Any]

_PRE_ATTN_LAYERS = {"fc1": "0", "ln1": "1", "fc2": "4", "ln2": "5", "fc3": "8", "ln3": "9"}


def _head_major_perm(hidden: int, n_heads: int) -> np.ndarray:
    """perm[j] = source (head-minor) index for head-major position j:
    j = h * hidden + e  <-  e * n_heads + h."""
    j = np.arange(hidden * n_heads)
    return (j % hidden) * n_heads + (j // hidden)


def _strip_module_prefix(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    if any(k.startswith("module.") for k in sd):
        return {k[len("module."):]: v for k, v in sd.items()}
    return sd


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read a torch ``model.pt`` into numpy arrays (CPU, no grad)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    out = {k: v.detach().to(torch.float32).cpu().numpy() for k, v in sd.items()}
    return _strip_module_prefix(out)


def state_dict_to_params(
    sd: Dict[str, np.ndarray], dtype=jnp.float32
) -> Params:
    """Reference state_dict -> JAX parameter pytree."""
    sd = _strip_module_prefix(sd)

    def arr(name: str) -> jnp.ndarray:
        if name not in sd:
            raise KeyError(f"checkpoint missing key: {name}")
        return jnp.asarray(np.asarray(sd[name]), dtype=dtype)

    pre_attn: Params = {}
    for ours, idx in _PRE_ATTN_LAYERS.items():
        w = arr(f"wsi_embedders.pre_attn.{idx}.weight")
        b = arr(f"wsi_embedders.pre_attn.{idx}.bias")
        if ours.startswith("fc"):
            pre_attn[ours] = {"w": w.T, "b": b}
        else:
            pre_attn[ours] = {"scale": w, "bias": b}

    n_heads = 0
    while f"wsi_embedders.attn.{n_heads}.attention_c.weight" in sd:
        n_heads += 1
    if n_heads == 0:
        raise KeyError("no attention heads found in checkpoint")

    # head-minor -> head-major permutation of the hidden*n_heads axis
    hidden = pre_attn["fc3"]["w"].shape[1] // n_heads
    perm = _head_major_perm(hidden, n_heads)
    pre_attn["fc3"]["w"] = pre_attn["fc3"]["w"][:, perm]
    pre_attn["fc3"]["b"] = pre_attn["fc3"]["b"][perm]
    pre_attn["ln3"]["scale"] = pre_attn["ln3"]["scale"][perm]
    pre_attn["ln3"]["bias"] = pre_attn["ln3"]["bias"][perm]
    attn = {
        "wa": jnp.stack([arr(f"wsi_embedders.attn.{h}.attention_a.0.weight").T
                         for h in range(n_heads)]),
        "ba": jnp.stack([arr(f"wsi_embedders.attn.{h}.attention_a.0.bias")
                         for h in range(n_heads)]),
        "wb": jnp.stack([arr(f"wsi_embedders.attn.{h}.attention_b.0.weight").T
                         for h in range(n_heads)]),
        "bb": jnp.stack([arr(f"wsi_embedders.attn.{h}.attention_b.0.bias")
                         for h in range(n_heads)]),
        "wc": jnp.stack([arr(f"wsi_embedders.attn.{h}.attention_c.weight").T
                         for h in range(n_heads)]),
        "bc": jnp.stack([arr(f"wsi_embedders.attn.{h}.attention_c.bias")
                         for h in range(n_heads)]),
    }

    params: Params = {
        "wsi_embedders": {"pre_attn": pre_attn, "attn": attn},
        "token_projector": {"w": arr("token_projector.weight").T[perm, :],
                            "b": arr("token_projector.bias")},
        "projector": {"w": arr("projector.weight").T[perm, :],
                      "b": arr("projector.bias")},
    }
    if "embedding.weight" in sd:
        params["embedding"] = {"table": arr("embedding.weight")}
    return params


def params_to_state_dict(params: Params) -> Dict[str, np.ndarray]:
    """JAX pytree -> reference-named state_dict (numpy). Inverse bridge, so
    models trained here load in the reference's torch code."""
    sd: Dict[str, np.ndarray] = {}
    pre = params["wsi_embedders"]["pre_attn"]
    attn = params["wsi_embedders"]["attn"]
    n_heads = attn["wa"].shape[0]
    hidden = pre["fc3"]["w"].shape[1] // n_heads
    perm = _head_major_perm(hidden, n_heads)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    for ours, idx in _PRE_ATTN_LAYERS.items():
        p = pre[ours]
        if ours == "fc3":
            sd[f"wsi_embedders.pre_attn.{idx}.weight"] = np.asarray(p["w"])[:, inv].T
            sd[f"wsi_embedders.pre_attn.{idx}.bias"] = np.asarray(p["b"])[inv]
        elif ours == "ln3":
            sd[f"wsi_embedders.pre_attn.{idx}.weight"] = np.asarray(p["scale"])[inv]
            sd[f"wsi_embedders.pre_attn.{idx}.bias"] = np.asarray(p["bias"])[inv]
        elif ours.startswith("fc"):
            sd[f"wsi_embedders.pre_attn.{idx}.weight"] = np.asarray(p["w"]).T
            sd[f"wsi_embedders.pre_attn.{idx}.bias"] = np.asarray(p["b"])
        else:
            sd[f"wsi_embedders.pre_attn.{idx}.weight"] = np.asarray(p["scale"])
            sd[f"wsi_embedders.pre_attn.{idx}.bias"] = np.asarray(p["bias"])
    for h in range(n_heads):
        sd[f"wsi_embedders.attn.{h}.attention_a.0.weight"] = np.asarray(attn["wa"][h]).T
        sd[f"wsi_embedders.attn.{h}.attention_a.0.bias"] = np.asarray(attn["ba"][h])
        sd[f"wsi_embedders.attn.{h}.attention_b.0.weight"] = np.asarray(attn["wb"][h]).T
        sd[f"wsi_embedders.attn.{h}.attention_b.0.bias"] = np.asarray(attn["bb"][h])
        sd[f"wsi_embedders.attn.{h}.attention_c.weight"] = np.asarray(attn["wc"][h]).T
        sd[f"wsi_embedders.attn.{h}.attention_c.bias"] = np.asarray(attn["bc"][h])
    sd["token_projector.weight"] = np.asarray(params["token_projector"]["w"])[inv, :].T
    sd["token_projector.bias"] = np.asarray(params["token_projector"]["b"])
    sd["projector.weight"] = np.asarray(params["projector"]["w"])[inv, :].T
    sd["projector.bias"] = np.asarray(params["projector"]["b"])
    if "embedding" in params:
        sd["embedding.weight"] = np.asarray(params["embedding"]["table"])
    return sd


def export_torch_checkpoint(params: Params, path: str) -> None:
    """Save params as a torch ``model.pt`` loadable by the reference
    (ref load path: Model.py:28-41)."""
    import torch

    sd = {k: torch.from_numpy(np.ascontiguousarray(v.astype(np.float32)))
          for k, v in params_to_state_dict(params).items()}
    torch.save(sd, path)


# ---------------------------------------------------------------------------
# Factory
# ---------------------------------------------------------------------------

def create_model(
    model_cfg,
    checkpoint_path: Optional[str] = None,
    dtype=jnp.float32,
    seed: int = 0,
) -> Tuple[MadeleineConfig, Params]:
    """Build (config, params); restore from a torch or native checkpoint if given
    (ref: Model.py:15-43)."""
    import jax

    if isinstance(model_cfg, MadeleineConfig):
        cfg = model_cfg
    elif isinstance(model_cfg, dict):
        cfg = MadeleineConfig.from_dict(model_cfg)
    else:  # argparse/SimpleNamespace-style
        cfg = MadeleineConfig.from_dict(vars(model_cfg))
    if not cfg.STAINS:
        cfg.finalize()

    if checkpoint_path:
        if checkpoint_path.endswith((".pt", ".pth", ".bin")):
            params = state_dict_to_params(load_torch_state_dict(checkpoint_path), dtype)
        elif checkpoint_path.endswith(".npz"):
            data = dict(np.load(checkpoint_path))
            params = state_dict_to_params(data, dtype)
        else:
            from madeleine_tpu.train.checkpoint import restore_params
            params = restore_params(checkpoint_path)
    else:
        params = init_madeleine_params(jax.random.PRNGKey(seed), cfg, dtype)
    return cfg, params


def create_model_from_pretrained(
    local_dir: str, repo_id: str = "MahmoodLab/madeleine", download: bool = True
) -> Tuple[MadeleineConfig, Params, Any]:
    """HF-hub flavored factory (ref: factory.py:16-39): reads
    ``model_config.json`` + ``model.pt`` from local_dir, downloading from the
    hub first when available. Returns (cfg, params, compute_dtype)."""
    from madeleine_tpu.config import compute_dtype

    os.makedirs(local_dir, exist_ok=True)
    cfg_path = os.path.join(local_dir, "model_config.json")
    ckpt_path = os.path.join(local_dir, "model.pt")
    if download and not (os.path.exists(cfg_path) and os.path.exists(ckpt_path)):
        try:
            from huggingface_hub import snapshot_download
            snapshot_download(repo_id=repo_id, local_dir=local_dir)
        except Exception as e:  # offline environments: fall back to local files
            print(f"* snapshot_download unavailable ({type(e).__name__}); "
                  f"using local files in {local_dir}")
    with open(cfg_path) as f:
        model_cfg = json.load(f)
    cfg, params = create_model(model_cfg, checkpoint_path=ckpt_path)
    return cfg, params, compute_dtype(cfg.precision)
