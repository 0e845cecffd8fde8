"""Generate golden parity fixtures from the reference torch model.

Run once (requires torch + the reference checkout at /root/reference):
    python tests/golden/generate.py

Produces ``golden.npz`` holding a random reference checkpoint (state_dict
arrays) plus input/output pairs for every forward branch. ``test_golden.py``
then asserts our JAX forward against these WITHOUT importing torch or the
reference — the torch-free golden suite from SURVEY §4.
"""

import os
import sys
import types

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, "/root/reference")
sys.modules.setdefault("wandb", types.ModuleType("wandb"))


def main() -> None:
    import torch
    from argparse import Namespace

    from madeleine.models.Model import MADELEINE
    from madeleine.utils import loss as ref_loss

    if not getattr(torch.Tensor, "_cuda_patched", False):
        torch.Tensor.cuda = lambda self, *a, **k: self
        torch.Tensor._cuda_patched = True

    torch.manual_seed(1234)
    cfg = Namespace(MODALITIES=["HE", "HER2", "PGR"], wsi_encoder="abmil",
                    patch_embedding_dim=24, wsi_encoder_hidden_dim=512,
                    activation="softmax", n_heads=2, precision="float32")
    model = MADELEINE(config=cfg, stain_encoding=False)
    model.eval()

    rng = np.random.default_rng(7)
    out = {}
    for k, v in model.state_dict().items():
        out[f"sd/{k}"] = v.detach().numpy()

    # encode_he branch
    feats_he = rng.standard_normal((2, 64, 24)).astype(np.float32)
    with torch.no_grad():
        out["encode_he/in"] = feats_he
        out["encode_he/out"] = model.encode_he(
            torch.from_numpy(feats_he), device="cpu").numpy()

        # train forward (n_views=1)
        feats_tr = rng.standard_normal((3, 3, 40, 24)).astype(np.float32)
        wsi, tok = model({"feats": torch.from_numpy(feats_tr)}, device="cpu",
                         train=True, n_views=1)
        out["train/in"] = feats_tr
        for mod in cfg.MODALITIES:
            out[f"train/wsi/{mod}"] = wsi[mod].numpy()
            out[f"train/tok/{mod}"] = tok[mod].numpy()

        # attention branch
        feats_at = rng.standard_normal((2, 30, 24)).astype(np.float32)
        emb, attn = model({"feats": torch.from_numpy(feats_at[:, None])},
                          device="cpu", train=False, return_attention=True)
        out["attn/in"] = feats_at
        out["attn/emb"] = emb.numpy()
        out["attn/raw"] = attn.numpy()

        # losses
        q = rng.standard_normal((8, 16)).astype(np.float32)
        k = rng.standard_normal((8, 16)).astype(np.float32)
        out["infonce/q"], out["infonce/k"] = q, k
        fn = ref_loss.InfoNCE(temperature=0.001)
        out["infonce/sym"] = np.float32(
            fn(torch.from_numpy(q), torch.from_numpy(k), symmetric=True).item())
        out["infonce/asym"] = np.float32(
            fn(torch.from_numpy(q), torch.from_numpy(k), symmetric=False).item())

        v = rng.standard_normal((2, 12, 8)).astype(np.float32)
        w = rng.standard_normal((2, 12, 8)).astype(np.float32)
        out["got/v"], out["got/q"] = v, w
        out["got/out"] = np.float32(ref_loss.GOT(
            torch.from_numpy(v), torch.from_numpy(w), subsample=None).item())

    np.savez_compressed(os.path.join(HERE, "golden.npz"), **out)
    print(f"wrote golden.npz with {len(out)} arrays")


if __name__ == "__main__":
    main()
