"""Summarize a jax.profiler trace: per-step device time by XLA op.

Parses the Chrome-trace export (vm.trace.json.gz) that
`--profile_dir`/`jax.profiler.start_trace` writes — no TensorBoard needed.
Prints the step module time and the top ops, aggregated across repeats.

Usage:
  python scripts/bench_train_step.py ... --profile-dir /tmp/prof
  python scripts/profile_summary.py /tmp/prof [--top 20]
"""

import argparse
import collections
import glob
import gzip
import json
import os


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("profile_dir")
    ap.add_argument("--top", type=int, default=20)
    ap.add_argument("--module", default="step_fn",
                    help="substring of the jit module to report step time for")
    args = ap.parse_args()

    paths = sorted(glob.glob(os.path.join(
        args.profile_dir, "plugins", "profile", "*", "*.trace.json.gz")))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {args.profile_dir}")
    with gzip.open(paths[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]

    tids = {(e["pid"], e["tid"]): e["args"]["name"]
            for e in ev if e.get("ph") == "M" and e.get("name") == "thread_name"}

    mods = [e for e in ev if e.get("ph") == "X"
            and tids.get((e["pid"], e["tid"])) == "XLA Modules"
            and args.module in e["name"]]
    n = max(1, len(mods))
    if mods:
        print(f"{args.module} device time: {mods[0]['dur'] / 1e3:.1f} ms/step"
              f"  ({n} steps captured)")

    ops = [e for e in ev if e.get("ph") == "X"
           and tids.get((e["pid"], e["tid"])) == "XLA Ops"]
    agg = collections.Counter()
    long_name = {}
    for e in ops:
        agg[e["name"]] += e["dur"]
        long_name.setdefault(e["name"], str(e.get("args", {})
                                            .get("long_name", "")))
    total = sum(agg.values())
    print(f"total XLA op time: {total / (n * 1e3):.1f} ms/step "
          f"({len(agg)} distinct ops)\n")
    for k, v in agg.most_common(args.top):
        print(f"{v / (n * 1e3):8.2f} ms/step {100 * v / total:5.1f}%  "
              f"{k[:46]:46s} {long_name[k][:70]}")


if __name__ == "__main__":
    main()
