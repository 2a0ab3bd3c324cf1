"""HTTP serving front-end: few-shot-as-a-service over JSON.

The reference has no inference story at all (SURVEY §5; training ends at
wandb metrics + a CSV). :mod:`fumi_tpu.serve` provides the device-side
request programs (adapt-once/classify-many and the one-dispatch episode
path); this module puts them behind a wire protocol using only the
standard library — no web-framework dependency to gate deployment on.

Endpoints (JSON in / JSON out):

- ``GET  /healthz`` — liveness: model family, backend, device count.
- ``GET  /v1/stats`` — health + per-route request counts, error counts,
  and latency mean/max/p50/p95/p99 (sliding window).
- ``GET  /metrics`` — the same counters in Prometheus text exposition
  format for standard scrapers.
- ``POST /v1/episode`` — one-dispatch few-shot request: adapt on the
  request's own support set AND classify its queries
  (``serve.FewShotClassifier.episode_logits``; fused Pallas adaptation on
  TPU where supported). Body: ``{"support_im": [[...]], "support_y":
  [...], "query_im": [[...]], "support_text": [[...]]?, "return":
  "labels"|"probs"|"logits"?}``.
- ``POST /v1/episode_batch`` — R independent episodes in one dispatch
  (leading request axis on every field; R is power-of-two padded
  device-side).
- ``POST /v1/adapt`` — stateful: run the one-time adaptation, keep the
  adapted state on device. Body: support fields as above.
- ``POST /v1/classify`` — classify queries against the adapted state.
  Body: ``{"query_im": [[...]], "return": ...?}``.
- ``POST /v1/reload`` — hot-swap weights from a checkpoint with zero
  recompilation (params are program arguments); invalidates any adapted
  state / indexed gallery. Body: ``{"checkpoint": "<run_dir or reference
  best.pth.tar>", "best": true?}``.

With ``--model clip`` the server exposes retrieval endpoints instead
(:class:`ClipService`): ``POST /v1/clip/index`` (project + normalize a
gallery of image embeddings once, device-resident), ``POST
/v1/clip/retrieve`` (rank texts against the gallery, top-k indices +
cosine scores), ``POST /v1/clip/similarity`` (stateless text×image
cosine matrix).

Run:  ``python -m fumi_tpu.serve_http --checkpoint <run_dir> --model fumi
--port 8080 <model/config flags>`` — the full training CLI flag surface
applies, so the server reconstructs exactly the trained architecture.

Concurrency: requests are handled on a thread pool
(`ThreadingHTTPServer`) but device work is serialized under one lock —
the classifier's adapt state is a single device-resident slot, and JAX
dispatch from many threads would interleave anyway. Scale-out is
process-level (one server per chip), matching the one-chip-per-replica
serving shape.
"""

from __future__ import annotations

import json
import threading
import time
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

import numpy as np

from fumi_tpu.core.config import Config
from fumi_tpu.serve import FewShotClassifier, RequestError


class Metrics:
    """Per-route request counters and latency percentiles.

    Production observability for the serving stack (the reference has no
    serving at all — SURVEY §5): cumulative request/error counts plus a
    sliding reservoir of the last ``WINDOW`` latencies per route, from
    which ``/v1/stats`` reports p50/p95/p99. ``/metrics`` renders the
    same numbers in Prometheus text exposition format, so a standard
    scraper needs zero adapters. Thread-safe (the HTTP layer is a thread
    pool); the lock covers only counter math, never device work.
    """

    WINDOW = 1024
    QUANTILES = (0.5, 0.95, 0.99)

    def __init__(self):
        self._lock = threading.Lock()
        self._t0 = time.time()
        self._routes: dict = {}

    def observe(self, route: str, ms: float, status: int) -> None:
        with self._lock:
            r = self._routes.setdefault(
                route, {"count": 0, "errors": 0, "sum_ms": 0.0,
                        "max_ms": 0.0, "lat": deque(maxlen=self.WINDOW)})
            r["count"] += 1
            r["sum_ms"] += ms
            r["max_ms"] = max(r["max_ms"], ms)
            r["lat"].append(ms)
            if status >= 400:
                r["errors"] += 1

    @staticmethod
    def _pct(sorted_ms, q: float) -> float:
        if not sorted_ms:
            return 0.0
        return sorted_ms[min(len(sorted_ms) - 1, int(q * len(sorted_ms)))]

    def _snapshot(self) -> dict:
        with self._lock:
            return {route: {**{k: r[k] for k in
                               ("count", "errors", "sum_ms", "max_ms")},
                            "lat": sorted(r["lat"])}
                    for route, r in self._routes.items()}

    def stats(self) -> dict:
        out = {"uptime_s": round(time.time() - self._t0, 3), "routes": {}}
        for route, r in self._snapshot().items():
            lat = r.pop("lat")
            entry = {"count": r["count"], "errors": r["errors"],
                     "mean_ms": round(r["sum_ms"] / max(r["count"], 1), 3),
                     "max_ms": round(r["max_ms"], 3)}
            for q in self.QUANTILES:
                entry[f"p{int(q * 100)}_ms"] = round(self._pct(lat, q), 3)
            out["routes"][route] = entry
        return out

    def prometheus(self) -> str:
        lines = [
            "# HELP fumi_tpu_requests_total Requests handled, by route.",
            "# TYPE fumi_tpu_requests_total counter",
            "# HELP fumi_tpu_request_errors_total 4xx/5xx responses.",
            "# TYPE fumi_tpu_request_errors_total counter",
            "# HELP fumi_tpu_request_latency_ms Request latency "
            "(sliding-window quantiles).",
            "# TYPE fumi_tpu_request_latency_ms summary",
            "# HELP fumi_tpu_uptime_seconds Server uptime.",
            "# TYPE fumi_tpu_uptime_seconds gauge",
            f"fumi_tpu_uptime_seconds {time.time() - self._t0:.3f}",
        ]
        for route, r in sorted(self._snapshot().items()):
            lab = f'route="{route}"'
            lat = r["lat"]
            lines.append(f"fumi_tpu_requests_total{{{lab}}} {r['count']}")
            lines.append(
                f"fumi_tpu_request_errors_total{{{lab}}} {r['errors']}")
            for q in self.QUANTILES:
                lines.append(
                    f'fumi_tpu_request_latency_ms{{{lab},quantile="{q}"}} '
                    f"{self._pct(lat, q):.3f}")
            lines.append(
                f"fumi_tpu_request_latency_ms_sum{{{lab}}} "
                f"{r['sum_ms']:.3f}")
            lines.append(
                f"fumi_tpu_request_latency_ms_count{{{lab}}} {r['count']}")
        return "\n".join(lines) + "\n"


class ServeError(Exception):
    """Client error with an HTTP status."""

    def __init__(self, status: int, message: str):
        super().__init__(message)
        self.status = status


def _array(body: dict, key: str, dtype=np.float32,
           required: bool = True) -> Optional[np.ndarray]:
    if key not in body or body[key] is None:
        if required:
            raise ServeError(400, f"missing field {key!r}")
        return None
    try:
        return np.asarray(body[key], dtype=dtype)
    except (TypeError, ValueError) as e:
        raise ServeError(400, f"field {key!r} is not a numeric array: {e}")


def _render(logits, mode: str) -> list:
    # host-side numpy: the classifier already fetched the logits, and
    # eager jnp post-ops would compile once per query-count shape
    from fumi_tpu.serve import _np_softmax
    logits = np.asarray(logits)
    if mode == "logits":
        out = logits
    elif mode == "probs":
        out = _np_softmax(logits)
    elif mode == "labels":
        out = np.argmax(logits, axis=-1)
    else:
        raise ServeError(400, f"unknown return mode {mode!r} "
                              "(labels|probs|logits)")
    return np.asarray(out).tolist()


class FewShotService:
    """The endpoint logic, separated from HTTP plumbing for testability."""

    def __init__(self, clf: FewShotClassifier):
        self.clf = clf
        self.lock = threading.Lock()
        self.metrics = Metrics()
        # token-encoder models take support_text as int token ids on the
        # wire; coercing them to float32 would silently break the
        # embedding lookup
        self._text_dtype = (np.int32 if clf.text_is_tokens else np.float32)

    def _text(self, body: dict) -> Optional[np.ndarray]:
        return _array(body, "support_text", dtype=self._text_dtype,
                      required=False)

    def healthz(self) -> dict:
        import jax
        return {"ok": True, "model": self.clf.cfg.model,
                "backend": jax.default_backend(),
                "devices": len(jax.devices())}

    def episode(self, body: dict) -> dict:
        s_im = _array(body, "support_im")
        s_y = _array(body, "support_y", dtype=np.int32)
        q_im = _array(body, "query_im")
        s_text = self._text(body)
        mode = body.get("return", "labels")
        with self.lock:
            logits = self.clf.episode_logits(s_im, s_y, q_im,
                                             support_text=s_text)
        return {"result": _render(logits, mode)}

    def episode_batch(self, body: dict) -> dict:
        s_im = _array(body, "support_im")
        s_y = _array(body, "support_y", dtype=np.int32)
        q_im = _array(body, "query_im")
        s_text = self._text(body)
        # support_y is (R, NK) in every layout (support_im is 3-D for
        # embeddings but 5-D for raw images), so the leading-request-axis
        # check keys on the labels
        if s_y.ndim != 2:
            raise ServeError(400, "episode_batch expects a leading request "
                                  f"axis; support_y has shape {s_y.shape}")
        mode = body.get("return", "labels")
        with self.lock:
            logits = self.clf.episode_logits_batch(s_im, s_y, q_im,
                                                   support_text=s_text)
        return {"result": _render(logits, mode)}

    def adapt(self, body: dict) -> dict:
        s_im = _array(body, "support_im")
        s_y = _array(body, "support_y", dtype=np.int32)
        s_text = self._text(body)
        with self.lock:
            self.clf.adapt(s_im, support_text=s_text, support_y=s_y)
        return {"ok": True}

    def classify(self, body: dict) -> dict:
        q_im = _array(body, "query_im")
        mode = body.get("return", "labels")
        with self.lock:
            try:
                logits = self.clf.logits(q_im)
            except RuntimeError as e:  # adapt() not called yet
                raise ServeError(409, str(e))
        return {"result": _render(logits, mode)}

    def reload(self, body: dict) -> dict:
        """Hot-swap weights from a checkpoint — zero recompilation
        (params are program ARGUMENTS); any adapted state is invalidated.
        Body: ``{"checkpoint": "<run_dir or best.pth.tar>", "best":
        true?}``. A torch FILE routes through the reference-checkpoint
        importer (:mod:`fumi_tpu.interop`)."""
        path = body.get("checkpoint")
        if not isinstance(path, str) or not path:
            raise ServeError(400, "missing field 'checkpoint' "
                                  "(run dir or .pth.tar)")
        import os
        if not (os.path.isdir(path) or os.path.isfile(path)):
            raise ServeError(400, f"checkpoint not found: {path!r}")
        with self.lock:
            try:
                self.clf.reload(path, best=bool(body.get("best", True)))
            except ValueError as e:  # structure mismatch / corrupt files
                raise ServeError(400, str(e))
            except FileNotFoundError as e:
                # e.g. an ensemble pointed at a dir with no seed*/
                # exports — a request-content problem, not a server error
                raise ServeError(400, str(e))
        return {"ok": True, "checkpoint": path}

    ROUTES = {"/v1/episode": episode, "/v1/episode_batch": episode_batch,
              "/v1/adapt": adapt, "/v1/classify": classify,
              "/v1/reload": reload}


class ClipService:
    """CLIP retrieval endpoints (``--model clip``): index a gallery of
    image embeddings once, rank texts against it; plus the stateless
    similarity matrix. Serves :class:`fumi_tpu.serve.ClipRetrieval`."""

    def __init__(self, clf):
        self.clf = clf
        self.lock = threading.Lock()
        self.metrics = Metrics()

    def healthz(self) -> dict:
        import jax
        return {"ok": True, "model": "clip",
                "backend": jax.default_backend(),
                "devices": len(jax.devices()),
                "gallery": (int(self.clf._gallery.shape[0])
                            if self.clf._gallery is not None else 0)}

    def index(self, body: dict) -> dict:
        images = _array(body, "images")
        with self.lock:
            size = self.clf.index(images)
        return {"ok": True, "gallery_size": size}

    def retrieve(self, body: dict) -> dict:
        text = _array(body, "text")
        top_k = int(body.get("top_k", 5))
        with self.lock:
            try:
                idx, scores = self.clf.retrieve(text, top_k)
            except RuntimeError as e:  # index() not called yet
                raise ServeError(409, str(e))
        return {"indices": np.asarray(idx).tolist(),
                "scores": np.asarray(scores).tolist()}

    def similarity(self, body: dict) -> dict:
        text = _array(body, "text")
        images = _array(body, "images")
        with self.lock:
            sim = self.clf.similarity(text, images)
        return {"similarity": np.asarray(sim).tolist()}

    reload = FewShotService.reload  # same wire contract, same lock shape

    ROUTES = {"/v1/clip/index": index, "/v1/clip/retrieve": retrieve,
              "/v1/clip/similarity": similarity, "/v1/reload": reload}


class _Handler(BaseHTTPRequestHandler):
    service: FewShotService  # set by make_server

    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _reply(self, status: int, payload: dict) -> None:
        data = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(data)))
        self.end_headers()
        self.wfile.write(data)

    def do_GET(self):
        if self.path == "/healthz":
            self._reply(200, self.service.healthz())
        elif self.path == "/v1/stats":
            self._reply(200, {**self.service.healthz(),
                              **self.service.metrics.stats()})
        elif self.path == "/metrics":
            data = self.service.metrics.prometheus().encode()
            self.send_response(200)
            self.send_header("Content-Type",
                             "text/plain; version=0.0.4; charset=utf-8")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)
        else:
            self._reply(404, {"error": f"no route {self.path}"})

    def do_POST(self):
        route = type(self.service).ROUTES.get(self.path)
        if route is None:
            self._reply(404, {"error": f"no route {self.path}"})
            return
        t0 = time.perf_counter()
        status, payload = 500, {"error": "unhandled"}
        try:
            length = int(self.headers.get("Content-Length", 0))
            body = json.loads(self.rfile.read(length) or b"{}")
            if not isinstance(body, dict):
                raise ServeError(400, "body must be a JSON object")
            status, payload = 200, route(self.service, body)
        except ServeError as e:
            status, payload = e.status, {"error": str(e)}
        except json.JSONDecodeError as e:
            status, payload = 400, {"error": f"invalid JSON: {e}"}
        except RequestError as e:
            # request-content errors detected past the parse layer (e.g.
            # missing support_text on a token model). Deliberately narrow:
            # a blanket ValueError/TypeError catch would reclassify
            # server-side defects as client errors
            status, payload = 400, {"error": str(e)}
        except Exception as e:  # device-side failure: fail the request,
            status, payload = 500, {"error": f"{type(e).__name__}: {e}"}
            # not the server
        finally:
            self.service.metrics.observe(
                self.path, (time.perf_counter() - t0) * 1e3, status)
        self._reply(status, payload)


def make_server(clf, host: str = "127.0.0.1",
                port: int = 0) -> ThreadingHTTPServer:
    """Build (but do not start) the HTTP server; ``port=0`` auto-picks.
    The bound port is ``server.server_address[1]``. ``clf`` is a
    FewShotClassifier (episodic families) or a ClipRetrieval (CLIP)."""
    from fumi_tpu.serve import ClipRetrieval
    service = (ClipService(clf) if isinstance(clf, ClipRetrieval)
               else FewShotService(clf))
    handler = type("Handler", (_Handler,), {"service": service})
    return ThreadingHTTPServer((host, port), handler)


def build_net_parser():
    """The server's OWN flags (everything else forwards to the full
    training-config parser). A function so the docs-rot guard
    (tests/test_docs_flags.py) can see these flags too."""
    import argparse

    net = argparse.ArgumentParser(add_help=False)
    net.add_argument("--host", type=str, default="127.0.0.1")
    net.add_argument("--port", type=int, default=8080)
    net.add_argument(
        "--warmup", type=str, default=None, metavar="R[,R...]",
        help="pre-compile the serving programs before accepting traffic: "
             "comma-separated episode-batch buckets to warm (e.g. '1,8'; "
             "'1' = the single-episode path). Cold compiles cost minutes "
             "on a tunneled runtime; warmed buckets serve retrace-free.")
    net.add_argument(
        "--warmup_queries", type=str, default="16", metavar="M[,M...]",
        help="query count(s) whose power-of-two bucket(s) --warmup "
             "compiles (one compile per (R, M-bucket) pair)")
    return net


def main(argv=None) -> None:
    from fumi_tpu.core.config import config_from_args

    net_args, rest = build_net_parser().parse_known_args(argv)

    cfg = config_from_args(rest)  # the full training CLI flag surface

    from fumi_tpu.core.runtime import setup_cache
    setup_cache()
    run_dir = None
    if cfg.checkpoint:
        from fumi_tpu.train.checkpoint import resolve_checkpoint
        run_dir = resolve_checkpoint(cfg.checkpoint, cfg.model,
                                     entity=cfg.wandb_entity,
                                     project=cfg.wandb_project)
    if cfg.model == "clip":
        from fumi_tpu.serve import ClipRetrieval
        clf = (ClipRetrieval.from_checkpoint(run_dir, cfg)
               if run_dir else ClipRetrieval(cfg, None))
    elif run_dir:
        from fumi_tpu.serve import find_seed_exports
        if find_seed_exports(run_dir):
            # a --tpu_seed_sweep run dir: serve the SEED ENSEMBLE over
            # its per-seed exports (average of replica probabilities).
            # Detection uses the SAME strict seed<k> definition as the
            # ensemble loader, so a stray seed*-prefixed entry next to a
            # standalone run's best/ cannot divert it off the
            # from_checkpoint path below.
            from fumi_tpu.serve import SeedEnsemble
            clf = SeedEnsemble.from_sweep_run(run_dir, cfg)
            print(f"seed ensemble: {clf.num_seeds} replicas from "
                  f"{run_dir}/seed*/")
        else:
            # from_checkpoint resolves the token dictionary itself
            # (vocab.json shipped with the run, else --data_dir pipeline)
            clf = FewShotClassifier.from_checkpoint(run_dir, cfg)
    else:
        from fumi_tpu.serve import serving_dictionary
        clf = FewShotClassifier(cfg, None,
                                serving_dictionary(cfg))  # fresh init

    if net_args.warmup:
        from fumi_tpu.serve import warmup
        warmup(clf,
               r_buckets=tuple(int(r) for r in net_args.warmup.split(",")),
               num_queries=tuple(
                   int(m) for m in net_args.warmup_queries.split(",")))

    server = make_server(clf, net_args.host, net_args.port)
    host, port = server.server_address[:2]
    from fumi_tpu.serve import ClipRetrieval
    svc_cls = (ClipService if isinstance(clf, ClipRetrieval)
               else FewShotService)
    routes = ", ".join(svc_cls.ROUTES)
    print(f"serving {cfg.model} on http://{host}:{port} (POST {routes})")
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()


if __name__ == "__main__":
    main()
