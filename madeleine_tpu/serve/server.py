"""Slide-embedding serving — batched HTTP inference server.

No reference equivalent (the reference is offline-only); this is the
production-serving layer for the TPU build. Stdlib-only HTTP front
(ThreadingHTTPServer) over a micro-batching core:

- requests enqueue bags; a dispatcher thread groups them by length bucket and
  flushes when `max_batch` accumulate or `max_wait_ms` elapse;
- each bucket shape hits one cached jitted encode executable (same bucketing
  policy as eval/inference.py), so steady-state serving never recompiles;
- responses return embeddings as JSON or raw f32 bytes.

Endpoints:
  POST /encode        body: .npz bytes with a 'features' [n, d] array
                      (reference h5 bags converted client-side), or raw f32
                      with headers X-Rows/X-Cols
  POST /encode_batch  body: .npz with 'features' [total, d] (row-concat of k
                      bags) + 'offsets' [k+1] prefix sums; returns k
                      embeddings batched through one dispatcher flush
  GET  /healthz       liveness + model info
  GET  /stats         counters (requests, batches, slides, p50/p95 latency)
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, List, Optional

import numpy as np

from madeleine_tpu.config import MadeleineConfig, compute_dtype
from madeleine_tpu.data.datasets import DEFAULT_BUCKETS


class _Pending:
    __slots__ = ("feats", "event", "result", "error", "t_enqueue")

    def __init__(self, feats: np.ndarray):
        self.feats = feats
        self.event = threading.Event()
        self.result: Optional[np.ndarray] = None
        self.error: Optional[str] = None
        self.t_enqueue = time.perf_counter()


class EmbeddingService:
    """Micro-batching encode core (framework-agnostic, HTTP-free)."""

    def __init__(self, params, cfg: MadeleineConfig,
                 buckets=DEFAULT_BUCKETS, max_batch: int = 32,
                 max_wait_ms: float = 5.0, stain_idx: int = 0):
        import jax

        self.params = params
        self.cfg = cfg
        self.buckets = sorted(buckets)
        self.max_batch = max_batch
        self.max_wait = max_wait_ms / 1000.0
        self.stain_idx = stain_idx
        self.dtype = compute_dtype(cfg.precision)
        self._q: "queue.Queue[_Pending]" = queue.Queue()
        self._stop = threading.Event()
        # bounded ring + lock: stats are read/written from many HTTP threads
        # and the dispatcher; an unbounded list leaks in a long-lived server
        from collections import deque

        self._latencies: "deque[float]" = deque(maxlen=1000)
        self._stats_lock = threading.Lock()
        self.counters = {"requests": 0, "batches": 0, "slides": 0,
                         "bucket_growths": 0}

        from madeleine_tpu.models import madeleine as mtm

        @jax.jit
        def _encode(params, feats, mask):
            return mtm.encode(params, cfg, feats, stain_idx=stain_idx,
                              mask=mask)

        self._encode = _encode
        self._thread = threading.Thread(target=self._loop, daemon=True)
        self._thread.start()

    def warmup(self, batch_sizes=None, verbose: bool = True) -> None:
        """Pre-compile (bucket x batch) executables so first requests don't
        pay multi-second XLA compiles. Call before accepting traffic.

        The dispatcher pads batches to powers of two up to max_batch, so by
        default EVERY shape it can emit is compiled here — otherwise the
        first request landing on an unwarmed power of two still pays a
        multi-second compile despite the warmup contract."""
        import jax.numpy as jnp

        if batch_sizes is None:
            batch_sizes, bs_ = [], 1
            while bs_ < self.max_batch:
                batch_sizes.append(bs_)
                bs_ <<= 1
            batch_sizes.append(bs_)  # pow2 ceiling of max_batch

        d = self.cfg.patch_embedding_dim
        for bucket in self.buckets:
            for bs in batch_sizes:
                feats = jnp.zeros((bs, bucket, d), self.dtype)
                mask = jnp.ones((bs, bucket), bool)
                self._encode(self.params, feats, mask).block_until_ready()
                if verbose:
                    print(f"* warmed bucket={bucket} bs={bs}")

    # ------------------------------------------------------------------
    def encode(self, feats: np.ndarray, timeout: float = 60.0) -> np.ndarray:
        """Blocking single-bag encode (thread-safe)."""
        if feats.ndim != 2:
            raise ValueError(f"features must be [n, d], got {feats.shape}")
        if feats.shape[1] != self.cfg.patch_embedding_dim:
            raise ValueError(
                f"feature dim {feats.shape[1]} != model input dim "
                f"{self.cfg.patch_embedding_dim}")
        p = _Pending(np.asarray(feats, np.float32))
        with self._stats_lock:
            self.counters["requests"] += 1
        self._q.put(p)
        if not p.event.wait(timeout):
            raise TimeoutError("encode timed out")
        if p.error:
            raise RuntimeError(p.error)
        return p.result

    def encode_many(self, bags: List[np.ndarray],
                    timeout: float = 120.0) -> List[np.ndarray]:
        """Blocking multi-bag encode. All bags enqueue at once, so the
        dispatcher batches them together (grouped by length bucket) instead
        of paying one dispatch round-trip per bag."""
        pending = []
        for feats in bags:
            if feats.ndim != 2:
                raise ValueError(f"features must be [n, d], got {feats.shape}")
            if feats.shape[1] != self.cfg.patch_embedding_dim:
                raise ValueError(
                    f"feature dim {feats.shape[1]} != model input dim "
                    f"{self.cfg.patch_embedding_dim}")
            pending.append(_Pending(np.asarray(feats, np.float32)))
        with self._stats_lock:
            self.counters["requests"] += len(pending)
        for p in pending:
            self._q.put(p)
        deadline = time.perf_counter() + timeout
        out = []
        for p in pending:
            if not p.event.wait(max(0.0, deadline - time.perf_counter())):
                raise TimeoutError("encode_many timed out")
            if p.error:
                raise RuntimeError(p.error)
            out.append(p.result)
        return out

    def _bucket_of(self, n: int) -> int:
        for b in self.buckets:
            if n <= b:
                return b
        # oversize bags run WHOLE in a grown pow2 bucket (the streaming pool
        # is O(block) in VMEM); the first hit compiles a new executable and
        # is counted in /stats as bucket_growths — never silently truncated
        from madeleine_tpu.data.datasets import grow_bucket

        with self._stats_lock:
            self.counters["bucket_growths"] += 1
        return grow_bucket(n, self.buckets[-1])

    def _loop(self) -> None:
        import jax.numpy as jnp

        while not self._stop.is_set():
            try:
                first = self._q.get(timeout=0.1)
            except queue.Empty:
                continue
            batch = [first]
            deadline = time.perf_counter() + self.max_wait
            while len(batch) < self.max_batch:
                remaining = deadline - time.perf_counter()
                if remaining <= 0:
                    break
                try:
                    batch.append(self._q.get(timeout=remaining))
                except queue.Empty:
                    break
            # group by bucket to keep shapes canonical
            groups: Dict[int, List[_Pending]] = {}
            for p in batch:
                groups.setdefault(self._bucket_of(p.feats.shape[0]),
                                  []).append(p)
            for bucket, items in groups.items():
                try:
                    d = items[0].feats.shape[1]
                    bs = 1 << (len(items) - 1).bit_length()  # pow2 batch shape
                    feats = np.zeros((bs, bucket, d), np.float32)
                    mask = np.zeros((bs, bucket), bool)
                    for i, p in enumerate(items):
                        f = p.feats  # always fits: buckets grow, never cut
                        feats[i, :len(f)] = f
                        mask[i, :len(f)] = True
                    emb = np.asarray(self._encode(
                        self.params,
                        jnp.asarray(feats, self.dtype),
                        jnp.asarray(mask)).astype(jnp.float32))
                    now = time.perf_counter()
                    with self._stats_lock:
                        for p in items:
                            self._latencies.append(now - p.t_enqueue)
                        self.counters["batches"] += 1
                        self.counters["slides"] += len(items)
                    for i, p in enumerate(items):
                        p.result = emb[i]
                        p.event.set()
                except Exception as e:  # propagate to every waiter
                    for p in items:
                        p.error = f"{type(e).__name__}: {e}"
                        p.event.set()

    def stats(self) -> Dict:
        with self._stats_lock:
            lat = np.asarray(self._latencies or [0.0])
            counters = dict(self.counters)
        return {
            **counters,
            "latency_p50_ms": float(np.percentile(lat, 50) * 1e3),
            "latency_p95_ms": float(np.percentile(lat, 95) * 1e3),
            "embed_dim": self.cfg.embed_dim,
        }

    def close(self) -> None:
        self._stop.set()
        self._thread.join(timeout=2)


# ---------------------------------------------------------------------------
# HTTP front
# ---------------------------------------------------------------------------

def make_handler(service: EmbeddingService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _reply(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._reply(200, {"status": "ok",
                                  "model": service.cfg.EXP_CODE,
                                  "embed_dim": service.cfg.embed_dim})
            elif self.path == "/stats":
                self._reply(200, service.stats())
            else:
                self._reply(404, {"error": "not found"})

        def do_POST(self):
            try:
                length = int(self.headers.get("Content-Length", 0))
                raw = self.rfile.read(length)
                if self.path == "/encode":
                    if self.headers.get("X-Rows"):
                        rows = int(self.headers["X-Rows"])
                        cols = int(self.headers["X-Cols"])
                        feats = np.frombuffer(raw, np.float32).reshape(rows,
                                                                       cols)
                    else:
                        with np.load(io.BytesIO(raw)) as npz:
                            feats = npz["features"]
                    emb = service.encode(np.asarray(feats, np.float32))
                    self._reply(200, {"embedding": emb.tolist()})
                elif self.path == "/encode_batch":
                    # packed ragged bags: 'features' [total, d] row-concat of
                    # k bags + 'offsets' [k+1] prefix sums (offsets[i]:
                    # offsets[i+1] is bag i)
                    with np.load(io.BytesIO(raw)) as npz:
                        feats = np.asarray(npz["features"], np.float32)
                        offs = np.asarray(npz["offsets"], np.int64)
                    if offs.ndim != 1 or len(offs) < 2 or offs[0] != 0 \
                            or offs[-1] != len(feats) \
                            or np.any(np.diff(offs) <= 0):
                        raise ValueError(
                            "offsets must be increasing prefix sums "
                            "[0, ..., len(features)] with nonempty bags")
                    bags = [feats[offs[i]:offs[i + 1]]
                            for i in range(len(offs) - 1)]
                    embs = service.encode_many(bags)
                    self._reply(200,
                                {"embeddings": [e.tolist() for e in embs]})
                else:
                    self._reply(404, {"error": "not found"})
            except (ValueError, KeyError) as e:
                self._reply(400, {"error": str(e)})
            except Exception as e:
                self._reply(500, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def serve(params, cfg: MadeleineConfig, host: str = "0.0.0.0",
          port: int = 8000, warmup: bool = False, **service_kw):
    """Blocking serve loop. Returns (server, service) if you need handles."""
    service = EmbeddingService(params, cfg, **service_kw)
    if warmup:
        service.warmup()
    server = ThreadingHTTPServer((host, port), make_handler(service))
    print(f"* Serving MADELEINE embeddings on {host}:{port} "
          f"(embed_dim={cfg.embed_dim})")
    try:
        server.serve_forever()
    finally:
        service.close()
