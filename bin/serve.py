"""Serve MADELEINE slide embeddings over HTTP.

Usage:
    python serve.py --model_dir ./../models [--port 8000] [--max_batch 32]

POST /encode with an .npz body ({"features": [n, d]}) or raw f32 bytes +
X-Rows/X-Cols headers; returns {"embedding": [...]}. GET /healthz, /stats.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from madeleine_tpu.utils.platform import apply_platform_env

apply_platform_env()

from madeleine_tpu.models.factory import create_model_from_pretrained
from madeleine_tpu.serve.server import serve

if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--model_dir", type=str, default="./../models")
    parser.add_argument("--host", type=str, default="0.0.0.0")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--max_batch", type=int, default=32)
    parser.add_argument("--max_wait_ms", type=float, default=5.0)
    parser.add_argument("--no_download", action="store_true")
    parser.add_argument("--warmup", action="store_true",
                        help="pre-compile all bucket shapes before serving")
    args = parser.parse_args()

    cfg, params, _ = create_model_from_pretrained(
        os.path.join(args.model_dir, "MADELEINE"),
        download=not args.no_download)
    serve(params, cfg, host=args.host, port=args.port, warmup=args.warmup,
          max_batch=args.max_batch, max_wait_ms=args.max_wait_ms)
