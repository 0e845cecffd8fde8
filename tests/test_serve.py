"""Serving tests: micro-batching core + HTTP front end-to-end."""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from madeleine_tpu.config import MadeleineConfig
from madeleine_tpu.models import madeleine as mtm
from madeleine_tpu.models.madeleine import init_madeleine_params
from madeleine_tpu.serve.server import EmbeddingService, make_handler


def _cfg():
    return MadeleineConfig(
        patch_embedding_dim=8, wsi_encoder_hidden_dim=16,
        attention_hidden_dim=16, n_heads=2, precision="float32",
        dataset="__test__", MODALITIES=["HE", "X"],
    ).finalize()


@pytest.fixture()
def service():
    cfg = _cfg()
    params = init_madeleine_params(jax.random.PRNGKey(0), cfg)
    svc = EmbeddingService(params, cfg, buckets=(32, 64, 128),
                           max_batch=8, max_wait_ms=10.0)
    yield svc, params, cfg
    svc.close()


def test_single_encode_matches_direct(service):
    svc, params, cfg = service
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((50, 8)).astype(np.float32)
    got = svc.encode(feats)
    want = np.asarray(mtm.encode_he(params, cfg, jnp.asarray(feats[None])))[0]
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_concurrent_requests_batched(service):
    svc, params, cfg = service
    rng = np.random.default_rng(1)
    bags = [rng.standard_normal((int(rng.integers(10, 120)), 8)
                                ).astype(np.float32) for _ in range(20)]
    results = [None] * 20

    def worker(i):
        results[i] = svc.encode(bags[i])

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(20)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, f in enumerate(bags):
        want = np.asarray(mtm.encode_he(params, cfg, jnp.asarray(f[None])))[0]
        np.testing.assert_allclose(results[i], want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"bag {i}")
    stats = svc.stats()
    assert stats["slides"] == 20
    assert stats["batches"] <= 20  # some batching happened or at worst 1:1


def test_bad_input_rejected(service):
    svc, _, _ = service
    with pytest.raises(ValueError):
        svc.encode(np.zeros((10, 99), np.float32))  # wrong dim
    with pytest.raises(ValueError):
        svc.encode(np.zeros((10,), np.float32))     # wrong rank


def test_http_roundtrip(service):
    from http.server import ThreadingHTTPServer

    svc, params, cfg = service
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        # healthz
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/healthz", timeout=10) as r:
            health = json.loads(r.read())
        assert health["status"] == "ok"
        assert health["embed_dim"] == 16

        # encode via npz body
        rng = np.random.default_rng(2)
        feats = rng.standard_normal((40, 8)).astype(np.float32)
        buf = io.BytesIO()
        np.savez(buf, features=feats)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            emb = np.asarray(json.loads(r.read())["embedding"], np.float32)
        want = np.asarray(mtm.encode_he(params, cfg,
                                        jnp.asarray(feats[None])))[0]
        np.testing.assert_allclose(emb, want, rtol=1e-3, atol=1e-4)

        # encode via raw bytes + headers
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode", data=feats.tobytes(),
            headers={"X-Rows": "40", "X-Cols": "8"}, method="POST")
        with urllib.request.urlopen(req, timeout=30) as r:
            emb2 = np.asarray(json.loads(r.read())["embedding"], np.float32)
        np.testing.assert_allclose(emb2, emb, rtol=1e-5)

        # malformed body -> 400
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode", data=b"junk", method="POST")
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code in (400, 500)

        # stats
        with urllib.request.urlopen(
                f"http://127.0.0.1:{port}/stats", timeout=10) as r:
            stats = json.loads(r.read())
        assert stats["slides"] >= 2
    finally:
        server.shutdown()


def test_warmup_compiles_buckets(service):
    svc, _, _ = service
    svc.warmup(batch_sizes=(1,), verbose=False)
    # after warmup, a request still round-trips correctly
    out = svc.encode(np.zeros((10, 8), np.float32))
    assert out.shape == (16,)


def test_encode_many_matches_direct(service):
    svc, params, cfg = service
    rng = np.random.default_rng(3)
    bags = [rng.standard_normal((n, 8)).astype(np.float32)
            for n in (12, 40, 40, 100)]
    embs = svc.encode_many(bags)
    assert len(embs) == 4
    for i, f in enumerate(bags):
        want = np.asarray(mtm.encode_he(params, cfg, jnp.asarray(f[None])))[0]
        np.testing.assert_allclose(embs[i], want, rtol=1e-4, atol=1e-5,
                                   err_msg=f"bag {i}")


def test_encode_many_validates_before_enqueue(service):
    svc, _, _ = service
    before = svc.stats()["requests"]
    with pytest.raises(ValueError):
        svc.encode_many([np.zeros((10, 8), np.float32),
                         np.zeros((10, 99), np.float32)])
    assert svc.stats()["requests"] == before  # nothing half-enqueued


def test_http_encode_batch(service):
    from http.server import ThreadingHTTPServer

    svc, params, cfg = service
    server = ThreadingHTTPServer(("127.0.0.1", 0), make_handler(svc))
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    try:
        rng = np.random.default_rng(4)
        bags = [rng.standard_normal((n, 8)).astype(np.float32)
                for n in (15, 60, 33)]
        packed = np.concatenate(bags, axis=0)
        offsets = np.cumsum([0] + [len(b) for b in bags])
        buf = io.BytesIO()
        np.savez(buf, features=packed, offsets=offsets)
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode_batch", data=buf.getvalue(),
            method="POST")
        with urllib.request.urlopen(req, timeout=60) as r:
            embs = json.loads(r.read())["embeddings"]
        assert len(embs) == 3
        for i, f in enumerate(bags):
            want = np.asarray(mtm.encode_he(params, cfg,
                                            jnp.asarray(f[None])))[0]
            np.testing.assert_allclose(np.asarray(embs[i], np.float32), want,
                                       rtol=1e-3, atol=1e-4, err_msg=f"bag {i}")

        # bad offsets -> 400
        buf = io.BytesIO()
        np.savez(buf, features=packed, offsets=np.asarray([0, 5, 4]))
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/encode_batch", data=buf.getvalue(),
            method="POST")
        try:
            urllib.request.urlopen(req, timeout=10)
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
