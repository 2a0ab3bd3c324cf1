"""Seed-ensemble serving (serve.SeedEnsemble): the ensemble's
distribution is exactly the mean of the per-seed classifiers'."""

import json
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fumi_tpu.core.config import Config
from fumi_tpu.serve import FewShotClassifier, SeedEnsemble
from fumi_tpu.train import checkpoint as ckpt_lib
from fumi_tpu.train.steps import build_family, make_opt

N, K, Q, D = 3, 2, 4, 16


def _cfg(**kw):
    base = dict(
        model="am3", dataset="synthetic", im_emb_dim=D, text_emb_dim=8,
        im_hid_dim=(8,), prototype_dim=8, text_hid_dim=8,
        num_ways=N, num_shots=K, num_shots_test=Q,
        num_train_adapt_steps=2, num_test_adapt_steps=3,
        batch_size=2, dropout=0.0, text_encoder="precomputed",
        step_size=0.1, lr=1e-2, optim="adam", seed=0,
        prng_impl="threefry2x32",
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture
def sweep_exports(tmp_path):
    """A fake sweep run dir: per-seed exports with DIFFERENT params."""
    cfg = _cfg(seed_sweep=2)
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir, exist_ok=True)
    import dataclasses
    with open(os.path.join(run_dir, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, default=str)
    params_list = []
    for s in (0, 1):
        p = build_family(cfg.replace(seed_sweep=0),
                         jax.random.PRNGKey(s)).params
        opt = make_opt(cfg.replace(seed_sweep=0))
        seed_dir = os.path.join(run_dir, f"seed{s}")
        ckpt_lib.save_checkpoint(seed_dir, p, opt.init(p), 0, 1.0,
                                 is_best=True,
                                 extra_meta={"model": cfg.model,
                                             "seed": s})
        params_list.append(p)
    return cfg, run_dir, params_list


def _episode(rng):
    r = np.random.RandomState(rng)
    s_im = r.randn(N * K, D).astype(np.float32)
    s_y = np.repeat(np.arange(N), K).astype(np.int32)
    q_im = r.randn(5, D).astype(np.float32)
    s_text = r.randn(N * K, 8).astype(np.float32)
    return s_im, s_y, q_im, s_text


def test_ensemble_is_mean_of_seed_classifiers(sweep_exports):
    cfg, run_dir, params_list = sweep_exports
    s_im, s_y, q_im, s_text = _episode(0)
    rng = jax.random.PRNGKey(7)

    ens = SeedEnsemble.from_sweep_run(run_dir)
    assert ens.num_seeds == 2
    ens.adapt(s_im, support_text=s_text, support_y=s_y, rng=rng)
    p_ens = np.asarray(ens.classify(q_im, return_probs=True))

    per = []
    for i, p in enumerate(params_list):
        solo = FewShotClassifier(cfg.replace(seed_sweep=0), p)
        # the documented per-replica derivation: replica i == fold_in(rng, i)
        solo.adapt(s_im, support_text=s_text, support_y=s_y,
                   rng=jax.random.fold_in(rng, i))
        per.append(np.asarray(jax.nn.softmax(solo.logits(q_im), axis=-1)))
    np.testing.assert_allclose(p_ens, np.mean(per, axis=0),
                               rtol=1e-5, atol=1e-6)
    # labels come from the averaged distribution
    labels = np.asarray(ens.classify(q_im))
    np.testing.assert_array_equal(labels, np.mean(per, 0).argmax(-1))


def test_ensemble_episode_paths_match_adapt_classify(sweep_exports):
    """The one-call episode path and the batched form agree with each
    other and with the per-seed mean."""
    cfg, run_dir, params_list = sweep_exports
    s_im, s_y, q_im, s_text = _episode(1)
    rng = jax.random.PRNGKey(3)

    ens = SeedEnsemble.from_sweep_run(run_dir)
    lg1 = np.asarray(ens.episode_logits(s_im, s_y, q_im, support_text=s_text,
                                           rng=rng))
    p1 = np.asarray(jax.nn.softmax(lg1, axis=-1))

    # per-seed oracle: each replica's one-episode logits under the
    # folded key, softmaxed, averaged
    per = []
    for i, p in enumerate(params_list):
        solo = FewShotClassifier(cfg.replace(seed_sweep=0), p)
        lg = solo.episode_logits(
            s_im, s_y, q_im, support_text=s_text,
            rng=jax.random.fold_in(rng, i))
        per.append(np.asarray(jax.nn.softmax(lg, axis=-1)))
    np.testing.assert_allclose(p1, np.mean(per, axis=0),
                               rtol=1e-5, atol=1e-6)

    # batched form, R=2 identical episodes -> identical rows
    lgb = np.asarray(ens.episode_logits_batch(
        np.stack([s_im, s_im]), np.stack([s_y, s_y]),
        np.stack([q_im, q_im]), support_text=np.stack([s_text, s_text]),
        rng=rng))
    assert lgb.shape[0] == 2


@pytest.mark.slow
def test_ensemble_over_http(sweep_exports):
    """The HTTP front-end serves a SeedEnsemble transparently (same
    routes); /v1/episode returns the ensemble distribution."""
    import threading
    import urllib.request

    from fumi_tpu.serve_http import make_server

    cfg, run_dir, params_list = sweep_exports
    ens = SeedEnsemble.from_sweep_run(run_dir)
    server = make_server(ens, port=0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    host, port = server.server_address[:2]
    url = f"http://{host}:{port}"
    try:
        s_im, s_y, q_im, s_text = _episode(4)
        body = {"support_im": s_im.tolist(),
                "support_y": s_y.tolist(),
                "support_text": s_text.tolist(),
                "query_im": q_im.tolist(),
                "return": "probs"}
        req = urllib.request.Request(
            url + "/v1/episode", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"}, method="POST")
        with urllib.request.urlopen(req) as resp:
            payload = json.loads(resp.read())
        probs = np.asarray(payload["result"])
        assert probs.shape == (5, N)
        np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-4)
        # matches the in-process ensemble
        want = np.asarray(jax.nn.softmax(
            ens.episode_logits(s_im, s_y, q_im, support_text=s_text),
            axis=-1))
        np.testing.assert_allclose(probs, want, rtol=1e-3, atol=1e-5)
    finally:
        server.shutdown()


def test_ensemble_reload_and_errors(sweep_exports, tmp_path):
    cfg, run_dir, _ = sweep_exports
    ens = SeedEnsemble.from_sweep_run(run_dir)
    s_im, s_y, q_im, s_text = _episode(2)
    ens.adapt(s_im, support_text=s_text, support_y=s_y)
    _ = ens.classify(q_im)
    ens.reload()  # re-reads the same exports
    with pytest.raises(RuntimeError):
        ens.logits(q_im)  # adapted state invalidated
    with pytest.raises(FileNotFoundError):
        SeedEnsemble.from_sweep_run(str(tmp_path / "empty"))

    # stray run-dir entries matching seed* (a notes file, an unrelated
    # dir with no trailing digits) must be ignored, not crash the sort
    (pathlib.Path(run_dir) / "seed_notes.txt").write_text("x")
    (pathlib.Path(run_dir) / "seed_exports").mkdir(exist_ok=True)
    ens2 = SeedEnsemble.from_sweep_run(run_dir)
    assert ens2.num_seeds == ens.num_seeds

    # a reload pointed at a dir WITHOUT seed exports is a client mistake:
    # the HTTP layer maps it to 400, not a 500 server error
    from fumi_tpu.serve_http import FewShotService, ServeError
    svc = FewShotService(ens)
    plain = tmp_path / "plain"
    plain.mkdir()
    with pytest.raises(ServeError) as ei:
        svc.reload({"checkpoint": str(plain)})
    assert ei.value.status == 400


def test_find_seed_exports_matches_loader_definition(sweep_exports,
                                                     tmp_path):
    """The HTTP front-end's sweep autodetection and the ensemble loader
    share ONE definition of 'seed export' (strict seed<k> name + best/):
    a standalone run dir with a stray seed*-prefixed entry must NOT be
    detected as a sweep (the loader would reject the stray and crash the
    server at startup where from_checkpoint serves fine)."""
    from fumi_tpu.serve import find_seed_exports
    cfg, run_dir, _ = sweep_exports

    found = find_seed_exports(run_dir)
    assert [os.path.basename(d) for d in found] == ["seed0", "seed1"]

    # a standalone-shaped run dir: own best/ plus a stray seed0_backup/
    # containing a best/ (e.g. a manual `cp -r ../sweep/seed0 .`)
    solo = tmp_path / "solo"
    (solo / "best").mkdir(parents=True)
    import shutil
    shutil.copytree(os.path.join(run_dir, "seed0"),
                    str(solo / "seed0_backup"))
    assert find_seed_exports(str(solo)) == []

    # strict-name dir WITHOUT a best/ checkpoint is not an export either
    (solo / "seed3").mkdir()
    assert find_seed_exports(str(solo)) == []
