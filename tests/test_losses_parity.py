"""Loss-function parity with the reference torch implementations."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.ops import losses as L
from madeleine_tpu.ops.rank import smooth_rank_measure


# ---------------------------------------------------------------------------
# InfoNCE (ref: loss.py:10-133)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("temperature", [0.1, 0.001])
@pytest.mark.parametrize("symmetric", [False, True])
def test_info_nce_parity(reference_models, temperature, symmetric):
    import torch

    _, ref_loss = reference_models
    rng = np.random.default_rng(0)
    q = rng.standard_normal((8, 16)).astype(np.float32)
    k = rng.standard_normal((8, 16)).astype(np.float32)

    ref_fn = ref_loss.InfoNCE(temperature=temperature)
    with torch.no_grad():
        want = ref_fn(torch.from_numpy(q), torch.from_numpy(k),
                      symmetric=symmetric).item()
    got = float(L.info_nce(jnp.asarray(q), jnp.asarray(k),
                           temperature=temperature, symmetric=symmetric))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_info_nce_masked_equals_subset(reference_models):
    """Masked InfoNCE over the full batch == reference InfoNCE over the valid
    subset (how the trainer uses it, ref: trainer.py:25-33)."""
    import torch

    _, ref_loss = reference_models
    rng = np.random.default_rng(1)
    q = rng.standard_normal((10, 8)).astype(np.float32)
    k = rng.standard_normal((10, 8)).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0, 1, 1, 0, 1, 1], bool)

    ref_fn = ref_loss.InfoNCE(temperature=0.01)
    with torch.no_grad():
        want = ref_fn(torch.from_numpy(q[mask]), torch.from_numpy(k[mask]),
                      symmetric=True).item()
    got = float(L.info_nce(jnp.asarray(q), jnp.asarray(k), temperature=0.01,
                           symmetric=True, mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_info_nce_explicit_negatives_runs():
    """Deviation: reference's explicit-negatives path falls through with no
    return (ref: loss.py:93-110); ours returns a finite CE loss."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32))
    k = jnp.asarray(rng.standard_normal((6, 8)).astype(np.float32))
    neg = jnp.asarray(rng.standard_normal((12, 8)).astype(np.float32))
    out = L.info_nce(q, k, neg, temperature=0.1)
    assert np.isfinite(float(out))
    negp = jnp.asarray(rng.standard_normal((6, 5, 8)).astype(np.float32))
    out = L.info_nce(q, k, negp, temperature=0.1, negative_mode="paired")
    assert np.isfinite(float(out))


# ---------------------------------------------------------------------------
# GOT (ref: loss.py:160-301)
# ---------------------------------------------------------------------------

def test_got_parity(reference_models):
    import torch

    _, ref_loss = reference_models
    rng = np.random.default_rng(3)
    b, n, d = 3, 12, 8
    v = rng.standard_normal((b, n, d)).astype(np.float32)
    q = rng.standard_normal((b, n, d)).astype(np.float32)

    with torch.no_grad():
        want = ref_loss.GOT(torch.from_numpy(v), torch.from_numpy(q),
                            subsample=None).item()
    got = float(L.got_loss(jnp.asarray(v), jnp.asarray(q)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_got_masked_equals_subset(reference_models):
    import torch

    _, ref_loss = reference_models
    rng = np.random.default_rng(4)
    b, n, d = 5, 10, 6
    v = rng.standard_normal((b, n, d)).astype(np.float32)
    q = rng.standard_normal((b, n, d)).astype(np.float32)
    mask = np.array([1, 0, 1, 1, 0], bool)

    with torch.no_grad():
        want = ref_loss.GOT(torch.from_numpy(v[mask]), torch.from_numpy(q[mask]),
                            subsample=None).item()
    got = float(L.got_loss(jnp.asarray(v), jnp.asarray(q),
                           sample_mask=jnp.asarray(mask)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_got_subsample_shape_and_grad():
    """Subsampled GOT is finite and differentiable w.r.t. inputs (the GW plan is
    stop-gradiented like the reference's .detach(), loss.py:248)."""
    rng = np.random.default_rng(5)
    v = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((2, 32, 8)).astype(np.float32))

    def f(v, q):
        return L.got_loss(v, q, subsample=16, rng=jax.random.PRNGKey(0))

    val, grads = jax.value_and_grad(f, argnums=(0, 1))(v, q)
    assert np.isfinite(float(val))
    for g in grads:
        assert np.all(np.isfinite(np.asarray(g)))


# ---------------------------------------------------------------------------
# Smooth rank (ref: utils.py:180-201)
# ---------------------------------------------------------------------------

def test_smooth_rank_parity(reference_models):
    import sys

    sys.path.insert(0, "/root/reference")
    import torch
    from madeleine.utils.utils import smooth_rank_measure as ref_rank

    rng = np.random.default_rng(6)
    x = rng.standard_normal((40, 16)).astype(np.float32)
    want = ref_rank(torch.from_numpy(x))
    got = float(smooth_rank_measure(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_smooth_rank_wide_matrix(reference_models):
    import torch
    from madeleine.utils.utils import smooth_rank_measure as ref_rank

    rng = np.random.default_rng(7)
    x = rng.standard_normal((8, 32)).astype(np.float32)  # n < m branch
    want = ref_rank(torch.from_numpy(x))
    got = float(smooth_rank_measure(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-3)


def test_got_loss_multi_matches_individual():
    """Batched all-stain GOT must equal per-stain got_loss calls (per-group
    thresholds preserved)."""
    rng = np.random.default_rng(10)
    S, b, n, d = 3, 5, 12, 8
    v = rng.standard_normal((S, b, n, d)).astype(np.float32)
    q = rng.standard_normal((S, b, n, d)).astype(np.float32)
    mask = rng.random((S, b)) < 0.8

    multi = np.asarray(L.got_loss_multi(jnp.asarray(v), jnp.asarray(q),
                                        sample_mask=jnp.asarray(mask)))
    for s in range(S):
        single = float(L.got_loss(jnp.asarray(v[s]), jnp.asarray(q[s]),
                                  sample_mask=jnp.asarray(mask[s])))
        np.testing.assert_allclose(multi[s], single, rtol=1e-4, atol=1e-4,
                                   err_msg=f"stain {s}")


def test_got_loss_multi_grad_matches_individual():
    """Gradients through the batched GOT (fused threshold_build + gw_trace
    custom VJPs, ops/got_glue.py) must equal the per-stain got_loss gradients
    (plain XLA autodiff chain) — covers the hand-written relu-threshold, Cst
    and C_final adjoints."""
    rng = np.random.default_rng(11)
    S, b, n, d = 3, 5, 12, 8
    v = jnp.asarray(rng.standard_normal((S, b, n, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((S, b, n, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((S, b)) < 0.8)

    def f_multi(v, q):
        return jnp.sum(L.got_loss_multi(v, q, sample_mask=mask))

    def f_single(v, q):
        return sum(L.got_loss(v[s], q[s], sample_mask=mask[s])
                   for s in range(S))

    gm = jax.grad(f_multi, argnums=(0, 1))(v, q)
    gs = jax.grad(f_single, argnums=(0, 1))(v, q)
    for a, b_ in zip(gm, gs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-4)


def test_got_glue_branch_equality(monkeypatch):
    """got_loss_multi's fused (ops/got_glue.py kernels) and unfused (plain
    XLA) branches must agree in values AND gradients — the XLA fallback runs
    in production only when a problem's tiles exceed the glue kernels' VMEM
    bound, so without this pin it would rot untested. MADELEINE_NO_GOT_GLUE=1
    is the production kill switch that forces the same fallback."""
    rng = np.random.default_rng(12)
    S, b, n, d = 2, 4, 12, 8
    v = jnp.asarray(rng.standard_normal((S, b, n, d)).astype(np.float32))
    q = jnp.asarray(rng.standard_normal((S, b, n, d)).astype(np.float32))
    mask = jnp.asarray(rng.random((S, b)) < 0.8)

    def run():
        def f(v, q):
            return jnp.sum(L.got_loss_multi(v, q, sample_mask=mask))

        val, grads = jax.value_and_grad(f, argnums=(0, 1))(v, q)
        return float(val), grads

    monkeypatch.delenv("MADELEINE_NO_GOT_GLUE", raising=False)
    val_fused, g_fused = run()
    monkeypatch.setenv("MADELEINE_NO_GOT_GLUE", "1")
    val_plain, g_plain = run()

    np.testing.assert_allclose(val_fused, val_plain, rtol=1e-5)
    # Gradient atol 5e-5: the two branches reduce the cost tensors in
    # different orders and the IPOT proximal loop amplifies f32 rounding;
    # observed worst-case branch delta is ~1.6e-5 on O(1e-2) gradients.
    for a, b_ in zip(g_fused, g_plain):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=5e-5)


def test_masked_subsample_without_replacement():
    """A bag with exactly `subsample` valid tokens must yield a permutation of
    them (no duplicates, no padding); >subsample valid -> distinct subset;
    <subsample valid -> only valid tokens, duplicates only from cyclic tiling."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from madeleine_tpu.ops import losses as L

    b, n, sub = 3, 32, 8
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, 1)), jnp.float32)
    mask = np.zeros((b, n), bool)
    mask[0, :sub] = True          # exactly sub valid
    mask[1, :] = True             # plenty valid
    mask[2, :3] = True            # fewer than sub valid
    out = np.asarray(L.masked_subsample(
        x, jnp.asarray(mask), jax.random.PRNGKey(7), sub))[..., 0]

    vals0 = np.asarray(x[0, :sub, 0])
    assert sorted(out[0].tolist()) == sorted(vals0.tolist())  # permutation

    vals1 = set(np.asarray(x[1, :, 0]).tolist())
    assert len(set(out[1].tolist())) == sub                    # distinct
    assert set(out[1].tolist()) <= vals1

    vals2 = np.asarray(x[2, :3, 0])
    assert set(out[2].tolist()) <= set(vals2.tolist())         # valid only
    # cyclic tiling: each valid token appears ceil/floor(sub/3) times
    counts = [out[2].tolist().count(v) for v in set(out[2].tolist())]
    assert max(counts) - min(counts) <= 1
