"""Benchmark suite — every line is one JSON record; the driver records all.

Line 1 (headline): slides/sec encoding 4096-token CONCH bags (512-d) through
the flagship MADELEINE encoder (bf16, fused Pallas attention pooling), with
achieved MFU. Baseline: the BASELINE.json north star of 200 slides/sec/chip
(the reference publishes no throughput; its downstream loop is bs=1 per-slide
torch on GPU).

Line 2: canonical train step DEVICE-side ms from a jax.profiler trace —
tunnel-independent (the axon tunnel adds ~70 ms round-trip to wall timings,
round-2 verdict weak #4). Baseline: the reference's ~1 h for 120 epochs x ~65
steps on 3x RTX 3090 Ti (~462 ms/step, README.md:94).

Line 3: native .bag loader batch-assembly bandwidth (GB/s) — pure host,
tunnel-independent.

Line 4: END-TO-END disk -> BucketedBagLoader -> run_inference throughput.
NOTE: under the axon tunnel host->device is ~12 MB/s (measured round 4), so
this line measures the tunnel, not the system; production numbers are bounded
by line 1.

Line 5: modeled production disk->embedding bound — min(native loader
assembly, PCIe host->device at 8 GB/s, device encode) per 4k-token bf16
slide, every component measured above except the PCIe rate (the lab's axon
tunnel replaces PCIe; labeled modeled, not measured).

Line 6: on-chip train-kernel verification (scripts/verify_train_kernels.py):
per-kernel pass/fail incl. the rate>0 dropout paths and the fwd/bwd
mask-regeneration identity; also written to VERIFY.json. A PRNG-path
regression flips this line red even while the CPU suite stays green.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from madeleine_tpu.utils.platform import enable_compilation_cache

enable_compilation_cache()

import numpy as np

BASELINE_SLIDES_PER_SEC = 200.0   # BASELINE.json target (v5e, 4k bags)
REF_TRAIN_STEP_MS = 461.5         # ~1h / (120 epochs * 65 steps), README.md:94
# v5e peak bf16 matmul throughput (per chip)
PEAK_BF16_FLOPS = float(os.environ.get("MADELEINE_PEAK_TFLOPS", "197")) * 1e12


def encode_flops_per_slide(cfg, tokens: int) -> float:
    """Analytic matmul FLOPs for one encode_he slide (MFU denominator)."""
    d = cfg.patch_embedding_dim
    h = cfg.wsi_encoder_hidden_dim
    nh = cfg.n_heads
    f = cfg.attention_hidden_dim
    mlp = 2 * (d * h + h * h + h * h * nh)          # 3-layer pre-attn MLP
    gates = nh * (2 * 2 * h * f + 2 * f)            # tanh/sigmoid branches + wc
    per_token = mlp + gates
    projector = 2 * (h * nh) * cfg.embed_dim        # per slide
    return per_token * tokens + projector


def train_flops_per_step(cfg, bs: int, tokens: int) -> float:
    """Matmul-only FLOPs for one canonical train step (fwd + bwd ~ 3x fwd).
    Excludes IPOT/GW transport iterations — a lower bound on true MFU."""
    n_mod = len(cfg.MODALITIES)
    fwd = encode_flops_per_slide(cfg, tokens) * bs * n_mod
    fwd += 2 * (cfg.wsi_encoder_hidden_dim * cfg.n_heads) * 128 \
        * bs * n_mod * tokens                        # token projector
    return 3.0 * fwd


def main() -> None:
    import jax
    import jax.numpy as jnp

    from madeleine_tpu.models import madeleine as mtm
    from madeleine_tpu.models.madeleine import init_madeleine_params
    from __graft_entry__ import _flagship_cfg

    cfg = _flagship_cfg()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg,
                                   dtype=jnp.bfloat16)

    batch, tokens, d = 256, 4096, 512
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((batch, tokens, d)), jnp.bfloat16)

    @jax.jit
    def encode(params, feats):
        return mtm.encode_he(params, cfg, feats)

    @jax.jit
    def encode_chained(params, feats, carry):
        # fold the previous output into the input so iterations can't be
        # elided or overlapped away by a lazy backend
        feats = feats.at[0, 0, :].add(carry[0].astype(feats.dtype) * 1e-6)
        out = mtm.encode_he(params, cfg, feats)
        return out

    # warmup / compile (fetch to host: the axon tunnel's block_until_ready
    # does not reliably force enqueued work, a np.asarray fetch does)
    carry = encode(params, feats)
    carry = encode_chained(params, feats, carry)
    np.asarray(carry)

    n_iters = 10
    t0 = time.perf_counter()
    for _ in range(n_iters):
        carry = encode_chained(params, feats, carry)
    np.asarray(carry)  # forces the whole dependency chain
    elapsed = time.perf_counter() - t0

    slides_per_sec = batch * n_iters / elapsed
    mfu = slides_per_sec * encode_flops_per_slide(cfg, tokens) / PEAK_BF16_FLOPS
    print(json.dumps({
        "metric": "slide_encode_throughput_4k_bags",
        "value": round(slides_per_sec, 2),
        "unit": "slides/sec/chip",
        "vs_baseline": round(slides_per_sec / BASELINE_SLIDES_PER_SEC, 3),
        "mfu": round(mfu, 3),
    }), flush=True)

    bench_train_step_device(cfg)
    loader_gbps = bench_native_loader()
    bench_end_to_end(params, cfg)
    bench_production_bound(slides_per_sec, loader_gbps, tokens, d)
    bench_kernel_verification()


def bench_train_step_device(cfg) -> None:
    """Canonical train step, DEVICE-side ms via jax.profiler (no tunnel RT)."""
    import shutil
    import tempfile

    import jax
    import jax.numpy as jnp

    from madeleine_tpu.models.madeleine import init_madeleine_params
    from madeleine_tpu.train.optim import make_optimizer
    from madeleine_tpu.train.trainer import init_train_state, make_train_step
    from madeleine_tpu.utils.profiling import module_device_ms

    import copy

    tcfg = copy.deepcopy(cfg)
    tcfg.remat = False           # fastest measured mode (BASELINE.md)
    tcfg.modality_scan = False   # joint-batch training

    params = init_madeleine_params(jax.random.PRNGKey(0), tcfg)
    tx, _ = make_optimizer(tcfg, steps_per_epoch=64)
    state = init_train_state(params, tx)
    step = make_train_step(tcfg, tx, donate=True)

    rng = np.random.default_rng(0)
    bs, n_mod, t, d = 65, len(tcfg.MODALITIES), 2048, 512
    labels = np.ones((bs, n_mod), np.float32)
    for s in range(1, n_mod):
        labels[:, s] = (rng.random(bs) < 0.8).astype(np.float32)
    batch = {
        "feats": jnp.asarray(rng.standard_normal((bs, n_mod, t, d)),
                             jnp.bfloat16),
        "modality_labels": jnp.asarray(labels),
        "sample_mask": jnp.ones(bs, bool),
    }
    key = jax.random.PRNGKey(0)
    state, he, _ = step(state, batch, key)       # compile + warmup
    np.asarray(he)

    prof_dir = tempfile.mkdtemp(prefix="madeleine_prof_")
    try:
        jax.profiler.start_trace(prof_dir)
        for i in range(4):
            state, he, _ = step(state, batch, jax.random.fold_in(key, i))
        np.asarray(he)
        jax.profiler.stop_trace()
        dev_ms = module_device_ms(prof_dir, "step_fn")
        if dev_ms is None:
            return  # no trace on this backend; wall numbers live in scripts/
        flops = train_flops_per_step(tcfg, bs, t)
        print(json.dumps({
            "metric": "train_step_device_ms",
            "value": round(dev_ms, 1),
            "unit": "ms/step (device-side, bs65 x 5 stains x 2048 tok)",
            "vs_baseline": round(REF_TRAIN_STEP_MS / dev_ms, 2),
            "mfu_matmul_lower_bound": round(
                flops / (dev_ms * 1e-3) / PEAK_BF16_FLOPS, 3),
            "note": "baseline = reference ~462 ms/step on 3x3090 "
                    "(README.md:94); vs_baseline is the speedup",
        }), flush=True)
    finally:
        shutil.rmtree(prof_dir, ignore_errors=True)


def bench_native_loader() -> None:
    """C++ .bag batch assembly bandwidth — host-only, tunnel-independent."""
    import shutil
    import tempfile

    import pandas as pd

    from madeleine_tpu.native import bagio
    from madeleine_tpu.native.dataset import NativeTrainLoader

    rng = np.random.default_rng(2)
    tmp = tempfile.mkdtemp(prefix="madeleine_loader_bench_")
    n_cases, n_mod, d, sample = 16, 5, 512, 2048
    mods = ["HE", "HER2", "PGR", "KI67", "ER"]
    try:
        rows = []
        for i in range(n_cases):
            sid = f"c{i}"
            row = {"slide_id": sid, "split": "train"}
            for m in mods:
                row[m] = 1
                n = int(rng.integers(2048, 3500))
                bagio.write_bag_file(
                    os.path.join(tmp, f"{sid}_{m}.bag"),
                    rng.standard_normal((n, d)).astype(np.float32),
                    dtype="bfloat16")
            rows.append(row)
        csv = os.path.join(tmp, "cohort.csv")
        pd.DataFrame(rows).to_csv(csv, index=False)

        from madeleine_tpu.native.bagio import bf16_dtype

        out_dtype = "bfloat16" if bf16_dtype() is not None else "float32"
        loader = NativeTrainLoader(csv, tmp, mods, embedding_size=d,
                                   sample=sample, batch_size=n_cases,
                                   shuffle=False, out_dtype=out_dtype)
        # warmup: 3 full sweeps so every ring buffer is first-touched and the
        # mmaps are faulted in (the first 1-2 sweeps run ~20x slower from
        # cold buffers; timing them would measure the kernel's page zeroing)
        batches = list(loader)
        for _ in range(2):
            for b in loader:
                pass
        bytes_per_batch = batches[0]["feats"].nbytes
        t0 = time.perf_counter()
        n_rounds = 5
        for _ in range(n_rounds):
            for b in loader:
                pass
        elapsed = time.perf_counter() - t0
        gbps = bytes_per_batch * len(batches) * n_rounds / elapsed / 1e9
        print(json.dumps({
            "metric": "native_loader_assembly_bandwidth",
            "value": round(gbps, 2),
            "unit": f"GB/s ({out_dtype} batch bytes; bf16 on disk)",
            "vs_baseline": round(gbps / (1.36 / 0.43), 2),
            "note": "baseline = round-2 measured 1.36 GB f32 in 0.43 s; "
                    "the bf16 path is the production train feed (half "
                    "the bytes, no host cast)",
        }), flush=True)
        return gbps
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_production_bound(encode_sps: float, loader_gbps: float,
                           tokens: int, d: int) -> None:
    """Modeled disk->embedding bound for a PCIe-attached chip: the pipeline
    (loader assembly || host->device copy || device encode) is limited by its
    slowest stage per slide. Loader and encode rates are the MEASURED lines
    above; the host->device rate is the one modeled term (8 GB/s, a
    conservative PCIe gen3-class figure — the lab's ~12 MB/s axon tunnel
    stands in for PCIe here, which is why the measured e2e line above is
    uninformative about production)."""
    PCIE_GBPS = 8.0
    bytes_per_slide = tokens * d * 2  # bf16
    loader_sps = loader_gbps * 1e9 / bytes_per_slide
    pcie_sps = PCIE_GBPS * 1e9 / bytes_per_slide
    bound, limiter = min([(loader_sps, "loader"), (pcie_sps, "pcie"),
                          (encode_sps, "encode")])
    print(json.dumps({
        "metric": "production_disk_to_embedding_bound",
        "value": round(bound, 1),
        "unit": "slides/sec/chip (modeled: min of measured stages)",
        "vs_baseline": round(bound / BASELINE_SLIDES_PER_SEC, 3),
        "limiting_stage": limiter,
        "stages_sps": {"loader": round(loader_sps, 1),
                       "pcie_modeled": round(pcie_sps, 1),
                       "encode": round(encode_sps, 1)},
    }), flush=True)


def bench_end_to_end(params, cfg) -> None:
    """Disk .bag files -> BucketedBagLoader -> run_inference (the real
    extraction path), timed end to end including IO and host->device feed."""
    import shutil
    import tempfile

    from madeleine_tpu.data.datasets import BucketedBagLoader
    from madeleine_tpu.eval.inference import run_inference
    from madeleine_tpu.native import bagio

    try:
        import ml_dtypes

        disk_dtype = ml_dtypes.bfloat16
    except ImportError:
        disk_dtype = np.float32

    rng = np.random.default_rng(1)
    tmp = tempfile.mkdtemp(prefix="madeleine_bench_")
    n_slides, d = 96, 512
    lengths = rng.integers(1024, 4096, n_slides)
    try:
        for i, n in enumerate(lengths):
            bagio.write_bag_file(
                os.path.join(tmp, f"s{i}.bag"),
                rng.standard_normal((int(n), d)).astype(np.float32),
                dtype="bfloat16")

        def run():
            loader = BucketedBagLoader(tmp, tokens_per_batch=262144,
                                       dtype=disk_dtype)
            return run_inference(params, cfg, loader, verbose=False)

        run()  # warmup: compiles every (bucket, batch) shape + page cache
        t0 = time.perf_counter()
        res, _ = run()
        elapsed = time.perf_counter() - t0
        assert len(res["slide_ids"]) == n_slides
        sps = n_slides / elapsed
        print(json.dumps({
            "metric": "e2e_disk_to_embedding_throughput",
            "value": round(sps, 2),
            "unit": "slides/sec/chip",
            "vs_baseline": round(sps / BASELINE_SLIDES_PER_SEC, 3),
            "note": "axon tunnel host->device is ~12 MB/s (measured), so "
                    "this line measures the tunnel, not the system; "
                    "production PCIe-fed throughput is bounded by line 1",
        }), flush=True)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def bench_kernel_verification() -> None:
    """Hardware verification of every training-path kernel (incl. rate>0
    dropout mask regeneration) — recorded per round so a PRNG regression
    cannot hide behind the (rate=0-only) CPU suite."""
    import jax

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from verify_train_kernels import run_all

    results = run_all()
    passed = sum(r["ok"] for r in results)
    artifact = {"backend": jax.default_backend(), "passed": passed,
                "total": len(results), "checks": results}
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "VERIFY.json"), "w") as f:
        json.dump(artifact, f, indent=1)
    print(json.dumps({
        "metric": "train_kernel_verification",
        "value": passed,
        "unit": f"kernel checks passed of {len(results)}",
        "vs_baseline": round(passed / len(results), 3),
        "failed": [r["check"] for r in results if not r["ok"]],
    }), flush=True)


if __name__ == "__main__":
    main()
