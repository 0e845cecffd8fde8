"""LN/GELU/gate backward-chain probe sweep (round-5 verdict item 4).

The fused encoder backward runs at 1.41x its bf16 matmul floor; the slack is
VPU elementwise/reduction chains serialized with the MXU. Each probe
statically DELETES one chain (numerically wrong, timing-only — see
ops/preattn._PROBE_BWD) so the measured step bounds what any correct
restructure of that chain could save. `ln_mxu_mean` is the one CORRECT
candidate (row means via MXU matvec instead of VPU reduction trees;
equivalence pinned by tests and the CPU smoke in this script's history).

Single-probe mode (MADELEINE_PROBE_BWD set by the sweep driver) measures the
canonical-scale fused encoder fwd and fwd+bwd on the live backend. Sweep
mode (no args) subprocess-runs every variant and prints a table.

Usage:
  python scripts/bench_probe_bwd.py            # full sweep (TPU, ~20 min)
  python scripts/bench_probe_bwd.py --one      # single run, env already set
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

PROBES = [
    ("default", ""),
    ("ln_nocenter", "ln_nocenter"),            # bound: LN centering chain
    ("gelu_identity", "gelu_identity"),        # bound: GELU-grad chain
    ("gates_linear", "gates_linear"),          # bound: gate deriv chains
    ("all_deleted", "gelu_identity,ln_nocenter,gates_linear"),
    ("ln_mxu_mean", "ln_mxu_mean"),            # CORRECT restructure candidate
]


def run_one() -> None:
    from madeleine_tpu.utils.platform import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    from madeleine_tpu.models.abmil import init_abmil_params
    from madeleine_tpu.models.madeleine import _init_linear
    from madeleine_tpu.ops.encoder_train import encoder_train

    # canonical joint-batch encoder shape: bs 65 x 5 stains, 2048 tok, 512-d
    nh, e, d, t, b, h, d_out = 4, 512, 512, 2048, 325, 512, 128
    params = init_abmil_params(jax.random.PRNGKey(1), d, e, nh, e)
    tokp = _init_linear(jax.random.PRNGKey(2), e * nh, d_out)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, t, d)), jnp.bfloat16)
    pre, attn = params["pre_attn"], params["attn"]
    seed = jnp.int32(7)

    def fwd_loss(attn):
        p, tk = encoder_train(x, pre, attn, tokp, None, seed,
                              need_dx=False)
        return (jnp.sum(p.astype(jnp.float32))
                + 0.01 * jnp.sum(tk.astype(jnp.float32)))

    fwd = jax.jit(fwd_loss)
    grad = jax.jit(jax.grad(fwd_loss))

    def timed(fn, arg, reps=8):
        out = fn(arg)                       # compile + warm
        np.asarray(jax.tree_util.tree_leaves(out)[0])
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(arg)
            np.asarray(jax.tree_util.tree_leaves(out)[0])  # force host fetch
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts) * 1e3), out

    fwd_ms, _ = timed(fwd, attn)
    tot_ms, g = timed(grad, attn)
    chk = float(sum(jnp.sum(jnp.abs(l.astype(jnp.float32)))
                    for l in jax.tree_util.tree_leaves(g)))
    print(json.dumps({
        "probe": os.environ.get("MADELEINE_PROBE_BWD", "") or "default",
        "fwd_ms": round(fwd_ms, 1),
        "fwd_bwd_ms": round(tot_ms, 1),
        "bwd_ms": round(tot_ms - fwd_ms, 1),
        "grad_checksum": chk,
        "backend": jax.default_backend(),
    }), flush=True)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--one", action="store_true")
    args = ap.parse_args()
    if args.one:
        run_one()
        return 0

    rows = []
    for name, env_val in PROBES:
        env = dict(os.environ, MADELEINE_PROBE_BWD=env_val)
        # the axon tunnel's remote-compile endpoint drops occasionally
        # (UNAVAILABLE/Broken pipe) — retry each variant a few times with a
        # backoff rather than losing a 2-hour sweep to one blip
        line = []
        for attempt in range(3):
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--one"],
                    env=env, capture_output=True, text=True, timeout=2700)
            except subprocess.TimeoutExpired:
                print(f"{name}: attempt {attempt} timed out", flush=True)
                continue
            line = [ln for ln in r.stdout.splitlines()
                    if ln.startswith("{")]
            if r.returncode == 0 and line:
                break
            print(f"{name}: attempt {attempt} failed\n{r.stdout[-400:]}\n"
                  f"{r.stderr[-400:]}", flush=True)
            time.sleep(120 * (attempt + 1))
        if not line:
            rows.append({"probe": name, "error": True})
            continue
        rec = json.loads(line[-1])
        rec["probe"] = name
        rows.append(rec)
        print(json.dumps(rec), flush=True)

    ok = [r for r in rows if not r.get("error")]
    base = next((r for r in ok if r["probe"] == "default"), None)
    if base:
        print("\nprobe              fwd_ms  bwd_ms   d_bwd_vs_default")
        for r in ok:
            print(f"{r['probe']:<18} {r['fwd_ms']:>6.1f} {r['bwd_ms']:>7.1f} "
                  f"{r['bwd_ms'] - base['bwd_ms']:>+8.1f}")
        mx = next((r for r in ok if r["probe"] == "ln_mxu_mean"), None)
        if mx:
            rel = abs(mx["grad_checksum"] - base["grad_checksum"]) / max(
                abs(base["grad_checksum"]), 1e-9)
            print(f"\nln_mxu_mean grad checksum vs default: rel diff {rel:.2e} "
                  f"({'OK — correct variant' if rel < 1e-3 else 'MISMATCH'})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
