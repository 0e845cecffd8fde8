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

ACROBAT = ["HE", "HER2", "PGR", "KI67", "ER"]


def flagship_state_dict(seed: int = 11, stain_encoding: bool = False,
                        n_heads: int = 4, hidden: int = 512,
                        d_in: int = 512, n_mod: int = 5,
                        attn_dim: int = 512, token_dim: int = 128,
                        se_dim: int = 32):
    """Deterministic numpy state_dict at the published flagship shape
    (ref: factory.py:16-39 / Model.py:50-94 — CONCH 512-d in, hidden 512,
    4 heads, 5 ACROBAT stains, optional 32-d stain encodings).

    Pure numpy so tests can rebuild the identical weights WITHOUT torch —
    golden_flagship.npz then only has to carry inputs/outputs, not ~20 MB of
    incompressible random weights per variant.
    """
    rng = np.random.default_rng(seed + int(stain_encoding))

    def lin(i, o):
        s = 1.0 / np.sqrt(i)  # torch kaiming_uniform(a=sqrt(5)) bound
        return (rng.uniform(-s, s, (o, i)).astype(np.float32),
                rng.uniform(-s, s, (o,)).astype(np.float32))

    def ln(d):
        # perturbed LN params so the affine path is actually exercised
        return ((1.0 + 0.05 * rng.standard_normal(d)).astype(np.float32),
                (0.05 * rng.standard_normal(d)).astype(np.float32))

    sd = {}
    fc_in = d_in + (se_dim if stain_encoding else 0)
    dims = {"0": (fc_in, hidden), "4": (hidden, hidden),
            "8": (hidden, hidden * n_heads)}
    for idx, (i, o) in dims.items():
        w, b = lin(i, o)
        sd[f"wsi_embedders.pre_attn.{idx}.weight"] = w
        sd[f"wsi_embedders.pre_attn.{idx}.bias"] = b
    for idx, d in {"1": hidden, "5": hidden, "9": hidden * n_heads}.items():
        w, b = ln(d)
        sd[f"wsi_embedders.pre_attn.{idx}.weight"] = w
        sd[f"wsi_embedders.pre_attn.{idx}.bias"] = b
    for h in range(n_heads):
        for branch, (i, o) in (("attention_a.0", (hidden, attn_dim)),
                               ("attention_b.0", (hidden, attn_dim)),
                               ("attention_c", (attn_dim, 1))):
            w, b = lin(i, o)
            sd[f"wsi_embedders.attn.{h}.{branch}.weight"] = w
            sd[f"wsi_embedders.attn.{h}.{branch}.bias"] = b
    w, b = lin(hidden * n_heads, token_dim)
    sd["token_projector.weight"], sd["token_projector.bias"] = w, b
    w, b = lin(hidden * n_heads, hidden)
    sd["projector.weight"], sd["projector.bias"] = w, b
    if stain_encoding:
        sd["embedding.weight"] = (
            0.5 * rng.standard_normal((n_mod, se_dim))).astype(np.float32)
    return sd


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


def main_flagship() -> None:
    """Flagship-shape golden fixtures (VERDICT r1 #5): n_heads=4, 512-d,
    with AND without stain encodings, against the actual reference model.
    Weights come from flagship_state_dict (regenerable torch-free)."""
    import torch
    from argparse import Namespace

    from madeleine.models.Model import MADELEINE

    out = {}
    rng = np.random.default_rng(17)

    def build(stain_encoding):
        cfg = Namespace(MODALITIES=list(ACROBAT), wsi_encoder="abmil",
                        patch_embedding_dim=512, wsi_encoder_hidden_dim=512,
                        activation="softmax", n_heads=4, precision="float32")
        model = MADELEINE(config=cfg, stain_encoding=stain_encoding)
        sd = {k: torch.from_numpy(v)
              for k, v in flagship_state_dict(stain_encoding=stain_encoding).items()}
        model.load_state_dict(sd, strict=True)
        model.eval()
        return model

    with torch.no_grad():
        # --- variant A: without stain encodings --------------------------
        model = build(False)
        feats_he = rng.standard_normal((2, 96, 512)).astype(np.float32)
        out["fs/encode_he/in"] = feats_he
        out["fs/encode_he/out"] = model.encode_he(
            torch.from_numpy(feats_he), device="cpu").numpy()

        feats_tr = rng.standard_normal((2, 5, 48, 512)).astype(np.float32)
        wsi, tok = model({"feats": torch.from_numpy(feats_tr)}, device="cpu",
                         train=True, n_views=1)
        out["fs/train/in"] = feats_tr
        for mod in ACROBAT:
            out[f"fs/train/wsi/{mod}"] = wsi[mod].numpy()
            out[f"fs/train/tok/{mod}"] = tok[mod].numpy()

        feats_at = rng.standard_normal((2, 40, 512)).astype(np.float32)
        emb, attn = model({"feats": torch.from_numpy(feats_at[:, None])},
                          device="cpu", train=False, return_attention=True)
        out["fs/attn/in"] = feats_at
        out["fs/attn/emb"] = emb.numpy()
        out["fs/attn/raw"] = attn.numpy()

        # --- variant B: with stain encodings ------------------------------
        # bs=1 everywhere: the reference misassigns stain ids for bs>1 in the
        # train branch (mod-major ids vs b-major flatten, Model.py:126-129 —
        # documented deviation) and its eval concat only broadcasts at bs=1.
        model = build(True)
        feats_tr = rng.standard_normal((1, 5, 48, 512)).astype(np.float32)
        wsi, tok = model({"feats": torch.from_numpy(feats_tr)}, device="cpu",
                         train=True, n_views=1)
        out["se/train/in"] = feats_tr
        for mod in ACROBAT:
            out[f"se/train/wsi/{mod}"] = wsi[mod].numpy()
            out[f"se/train/tok/{mod}"] = tok[mod].numpy()

        # eval per-stain branch with custom_stain_idx (Model.py:162-203):
        # input carries ONE stain's bag; the idx keys the learned encoding
        feats_ev = rng.standard_normal((1, 1, 48, 512)).astype(np.float32)
        out["se/eval/in"] = feats_ev
        for idx, mod in ((3, "KI67"), (1, "HER2")):
            embs = model({"feats": torch.from_numpy(feats_ev)}, device="cpu",
                         train=False, custom_stain_idx=idx)
            out[f"se/eval/{idx}"] = embs[mod].numpy()

    np.savez_compressed(os.path.join(HERE, "golden_flagship.npz"), **out)
    print(f"wrote golden_flagship.npz with {len(out)} arrays")


if __name__ == "__main__":
    main()
    main_flagship()
