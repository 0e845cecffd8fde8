#!/usr/bin/env python
"""Measured, loader-fed pretraining epochs at ACROBAT scale (round-2 verdict
item 2: replace the steps x step-time arithmetic with a REAL fed epoch).

Builds a synthetic ACROBAT-scale cohort (default 4,211 cases x 5 stains,
bf16 .bag on disk), then runs `bin/pretrain.py` — the real CLI path: native
C++ loader (bf16 assembly) -> Prefetcher -> jitted train step — for a few
epochs and reports measured epoch wall times from metrics.jsonl.

It also measures the loader ALONE (assembly rate with no device in the loop)
so the epoch number decomposes into loader vs step vs transfer. On the axon
tunnel, host->device moves ~12 MB/s (measured round 4: 12.2 MB/s on 64 MB
chunks), so the fed-epoch wall number is tunnel-dominated; the loader-only
and device-step lines are the production-relevant ones (PCIe/local-TPU hosts
move GB/s).

Usage:
  python scripts/bench_epoch.py [--cases 4211] [--epochs 3]
      [--data_dir /tmp/madeleine_epoch_cohort] [--loader-only]
"""

import argparse
import json
import os
import shutil
import struct
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MODS = ["HE", "HER2", "PGR", "KI67", "ER"]  # ACROBAT registry order


def build_cohort(data_dir: str, n_cases: int, d: int, min_t: int, max_t: int,
                 seed: int = 0) -> str:
    """Synthetic cohort: every case has HE, each IHC present w.p. 0.8
    (ACROBAT-realistic availability). Bag content slices a shared random
    pool — loader performance only depends on bytes, not values.

    Fast + resumable: the bf16 payload pool is converted ONCE (per-file cost
    is then header + one buffered write), and files already on disk at the
    right size are skipped while the RNG stream advances identically — an
    interrupted build continues where it left off."""
    import pandas as pd

    from madeleine_tpu.native import bagio

    csv_path = os.path.join(data_dir, "cohort.csv")
    if os.path.exists(csv_path):
        print(f"* reusing cohort at {data_dir}")
        return csv_path
    os.makedirs(data_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    pool = rng.standard_normal((2 * max_t, d)).astype(np.float32)
    # one-shot f32->bf16 truncation (matches bagio.write_bag_file's storage
    # conversion); per-file work drops to a slice + write
    pool_u16 = (((pool.view(np.uint32) + 0x8000) >> 16)
                .astype(np.uint16))
    rows = []
    t0 = time.time()
    for i in range(n_cases):
        sid = f"case{i:05d}"
        row = {"slide_id": sid, "split": "train"}
        for m in MODS:
            present = m == "HE" or rng.random() < 0.8
            row[m] = int(present)
            if present:
                n = int(rng.integers(min_t, max_t))
                off = int(rng.integers(0, max_t))
                path = os.path.join(data_dir, f"{sid}_{m}.bag")
                want = 40 + n * d * 2
                if (os.path.exists(path)
                        and os.path.getsize(path) == want):
                    continue  # resume: deterministic content, already built
                header = struct.pack("<IIQQIIQ", bagio.MAGIC, 1, n, d,
                                     bagio.DTYPE_BF16, 0, 0)
                with open(path, "wb") as f:
                    f.write(header)
                    f.write(pool_u16[off:off + n].tobytes())
        rows.append(row)
        if i % 500 == 0:
            print(f"  ... {i}/{n_cases} cases ({time.time() - t0:.0f}s)",
                  flush=True)
    pd.DataFrame(rows).to_csv(csv_path, index=False)
    print(f"* cohort built in {time.time() - t0:.0f}s "
          f"({n_cases} cases, disk {du_gb(data_dir):.1f} GB)")
    return csv_path


def du_gb(path: str) -> float:
    total = 0
    for root, _, files in os.walk(path):
        for f in files:
            total += os.path.getsize(os.path.join(root, f))
    return total / 1e9


def bench_loader_only(csv_path: str, data_dir: str, batch: int,
                      sample: int, d: int) -> dict:
    """Assembly + prefetch with NO device in the loop (host truth)."""
    from madeleine_tpu.data.datasets import Prefetcher
    from madeleine_tpu.native.dataset import NativeTrainLoader

    loader = NativeTrainLoader(csv_path, data_dir, MODS, embedding_size=d,
                               sample=sample, batch_size=batch, shuffle=True,
                               out_dtype="bfloat16")
    # epoch 0 pays the first-touch page faults of the whole cohort's mmaps
    # (one-time per process) and epoch 1 still carries residual page-table /
    # THP population (measured: 0.23 s/batch vs the true 0.13 s steady
    # state); epoch 2+ is what a 120-epoch training run actually sees.
    epochs = []
    for ep in range(3):
        loader.set_epoch(ep)
        n, nbytes = 0, 0
        it = Prefetcher(loader)
        t0 = time.time()
        for b in it:
            n += 1
            nbytes += b["feats"].nbytes
        dt = time.time() - t0
        epochs.append({"batches": n, "s_per_batch": dt / max(n, 1),
                       "assembly_gb_s": nbytes / dt / 1e9,
                       "epoch_s": dt})
    loader.close()
    return {"batches": epochs[-1]["batches"],
            "s_per_batch": epochs[-1]["s_per_batch"],
            "assembly_gb_s": epochs[-1]["assembly_gb_s"],
            "epoch_s_loader_only": epochs[-1]["epoch_s"],
            "epoch_s_each": [round(e["epoch_s"], 1) for e in epochs],
            "first_epoch_s": epochs[0]["epoch_s"],
            "first_epoch_s_per_batch": epochs[0]["s_per_batch"]}


def drop_cohort_cache(data_dir: str) -> int:
    """Evict every .bag byte from the page cache (posix_fadvise DONTNEED).
    Must run while NO loader holds the files mmap'd — the kernel does not
    invalidate mapped pages. Returns bytes advised."""
    n = 0
    for root, _, files in os.walk(data_dir):
        for fn in files:
            if not fn.endswith(".bag"):
                continue
            p = os.path.join(root, fn)
            fd = os.open(p, os.O_RDONLY)
            try:
                os.posix_fadvise(fd, 0, 0, os.POSIX_FADV_DONTNEED)
            finally:
                os.close(fd)
            n += os.path.getsize(p)
    return n


def _cached_gb() -> float:
    with open("/proc/meminfo") as f:
        for line in f:
            if line.startswith("Cached:"):
                return int(line.split()[1]) / 1e6
    return float("nan")


def bench_loader_cold(csv_path: str, data_dir: str, batch: int,
                      sample: int, d: int, reps: int = 2) -> dict:
    """Streaming gather rate with the cohort evicted from page cache — the
    larger-than-RAM regime (e.g. the paper's 12,070-WSI kidney cohort at
    ~3x this host's RAM, ref README.md:8). Every epoch re-reads the .bag
    runs from disk: this is the number the NVMe provisioning advice in
    docs/DEPLOYMENT.md needs, not the warm-cache 5 GB/s memcpy rate.

    Each rep: drop cache (verified via /proc/meminfo), construct a FRESH
    loader (fadvise cannot evict mapped pages), run one epoch."""
    from madeleine_tpu.data.datasets import Prefetcher
    from madeleine_tpu.native.dataset import NativeTrainLoader

    runs = []
    for rep in range(reps):
        before = _cached_gb()
        advised = drop_cohort_cache(data_dir)
        after = _cached_gb()
        loader = NativeTrainLoader(csv_path, data_dir, MODS,
                                   embedding_size=d, sample=sample,
                                   batch_size=batch, shuffle=True,
                                   out_dtype="bfloat16")
        loader.set_epoch(rep)
        n, nbytes = 0, 0
        t0 = time.time()
        for b in Prefetcher(loader):
            n += 1
            nbytes += b["feats"].nbytes
        dt = time.time() - t0
        loader.close()
        runs.append({"epoch_s": round(dt, 1),
                     "s_per_batch": round(dt / max(n, 1), 3),
                     "assembly_gb_s": round(nbytes / dt / 1e9, 2),
                     "cache_dropped_gb": round(before - after, 1),
                     "advised_gb": round(advised / 1e9, 1)})
    worst = max(runs, key=lambda r: r["epoch_s"])
    return {"metric": "loader_cold_epoch", "reps": runs,
            "cold_assembly_gb_s": worst["assembly_gb_s"],
            "cold_epoch_s": worst["epoch_s"]}


def bench_threads_sweep(csv_path: str, data_dir: str, batch: int,
                        sample: int, d: int,
                        thread_counts=(1, 2, 4, 8)) -> dict:
    """Assembly rate vs worker-pool size (the 8-chip DP feed-budget table:
    per-host feed must scale ~8x for 8-way data parallelism; gather tasks
    are independent memcpys, so the pool scales with real cores — this
    host has nproc=os.cpu_count()). Steady-state: median of 8 batches
    after a warm epoch."""
    from madeleine_tpu.native.dataset import NativeTrainLoader

    sweep = {}
    for nt in thread_counts:
        loader = NativeTrainLoader(csv_path, data_dir, MODS,
                                   embedding_size=d, sample=sample,
                                   batch_size=batch, shuffle=False,
                                   out_dtype="bfloat16", n_threads=nt)
        for b in loader:  # warm sweep: page-faults + ring first-touch
            pass
        times = []
        it = iter(loader)
        for _ in range(8):
            t0 = time.time()
            try:
                b = next(it)
            except StopIteration:
                it = iter(loader)
                b = next(it)
            times.append(time.time() - t0)
        nbytes = b["feats"].nbytes
        med = float(np.median(times))
        sweep[str(nt)] = {"s_per_batch": round(med, 4),
                          "gb_s": round(nbytes / med / 1e9, 2)}
        loader.close()
    return {"metric": "loader_threads_sweep", "cpu_count": os.cpu_count(),
            "batch_gb": round(nbytes / 1e9, 3), "threads": sweep}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cases", type=int, default=4211)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--batch", type=int, default=65)
    ap.add_argument("--sample", type=int, default=2048)
    ap.add_argument("--d", type=int, default=512)
    ap.add_argument("--min_tokens", type=int, default=2048)
    ap.add_argument("--max_tokens", type=int, default=2816)
    ap.add_argument("--data_dir", default="/tmp/madeleine_epoch_cohort")
    ap.add_argument("--results_dir", default="/tmp/madeleine_epoch_results")
    ap.add_argument("--loader-only", action="store_true")
    ap.add_argument("--cold", action="store_true",
                    help="measure the loader with the cohort EVICTED from "
                         "page cache each epoch (posix_fadvise DONTNEED) — "
                         "the streaming-read rate for larger-than-RAM "
                         "cohorts; implies --skip-loader unless given")
    ap.add_argument("--threads_sweep", action="store_true",
                    help="also measure assembly rate at n_threads 1/2/4/8 "
                         "(the per-host feed-scaling table for multi-chip "
                         "DP, docs/DEPLOYMENT.md)")
    ap.add_argument("--skip-loader", action="store_true",
                    help="skip the loader-only pass (already measured)")
    ap.add_argument("--fed_cases", type=int, default=0,
                    help="run the fed pretrain on only the first N cases of "
                         "the cohort (the axon tunnel moves ~12 MB/s "
                         "host->device, so a full 44 GB/epoch fed run is "
                         "tunnel-bound into hours; a subset keeps the step "
                         "at the CANONICAL shape — bs x 5 stains x sample "
                         "tokens — while the epoch fits the tunnel)")
    ap.add_argument("--clean", action="store_true",
                    help="delete the cohort afterwards")
    args = ap.parse_args()

    csv_path = build_cohort(args.data_dir, args.cases, args.d,
                            args.min_tokens, args.max_tokens)

    if not args.skip_loader:
        host = bench_loader_only(csv_path, args.data_dir, args.batch,
                                 args.sample, args.d)
        print(json.dumps({"metric": "loader_only_epoch", **host}), flush=True)
    else:
        host = {"s_per_batch": None}
    if args.cold:
        print(json.dumps(bench_loader_cold(
            csv_path, args.data_dir, args.batch, args.sample, args.d)),
            flush=True)
    if args.threads_sweep:
        print(json.dumps(bench_threads_sweep(
            csv_path, args.data_dir, args.batch, args.sample, args.d)),
            flush=True)
    if args.loader_only:
        if args.clean:
            shutil.rmtree(args.data_dir, ignore_errors=True)
        return 0

    if args.fed_cases:
        import pandas as pd
        sub = pd.read_csv(csv_path).head(args.fed_cases)
        csv_path = os.path.join(args.data_dir,
                                f"cohort_head{args.fed_cases}.csv")
        sub.to_csv(csv_path, index=False)

    shutil.rmtree(args.results_dir, ignore_errors=True)
    cmd = [
        sys.executable, os.path.join(REPO, "bin/pretrain.py"),
        "--cohort", "brca", "--dataset", "ACROBAT",
        "--csv_fpath", csv_path, "--data_root_dir", args.data_dir,
        "--results_dir", args.results_dir,
        "--wsi_encoder", "abmil", "--n_heads", "4",
        "--patch_embedding_dim", str(args.d),
        "--wsi_encoder_hidden_dim", "512", "--activation", "softmax",
        "--global_loss", "info-nce", "--local_loss", "got",
        "--temperature", "0.001", "--symmetric_cl",
        "--lr", "0.0001", "--max_epochs", str(args.epochs),
        "--batch_size", str(args.batch),
        "--n_subsamples", str(args.sample),
        "--warmup", "--warmup_epochs", "5", "--precision", "bfloat16",
        "--no_remat", "--no_modality_scan",
    ]
    t0 = time.time()
    subprocess.run(cmd, check=True)
    wall = time.time() - t0

    # epoch walls from the run's metrics.jsonl (search the hashed run dir)
    times = []
    for root, _, files in os.walk(args.results_dir):
        if "metrics.jsonl" in files:
            with open(os.path.join(root, "metrics.jsonl")) as f:
                for line in f:
                    rec = json.loads(line)
                    if "epoch_time" in rec:
                        times.append(rec["epoch_time"])
    result = {
        "metric": "fed_epoch",
        "fed_cases": args.fed_cases or args.cases,
        "epochs": len(times),
        "epoch_s_each": [round(t, 1) for t in times],
        "epoch_s_steady": round(float(np.median(times[1:]) if len(times) > 1
                                      else times[0]), 1) if times else None,
        "total_wall_s": round(wall, 1),
        "loader_only_s_per_batch": (round(host["s_per_batch"], 3)
                                    if host["s_per_batch"] is not None
                                    else None),
        "note": "fed epoch includes host->device transfer; on the axon "
                "tunnel that path moves ~12 MB/s and dominates — see "
                "loader_only + train_step_device_ms for production math",
    }
    print(json.dumps(result), flush=True)
    if args.clean:
        shutil.rmtree(args.data_dir, ignore_errors=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
