#!/usr/bin/env python
"""Serving CLI: a checkpoint-resident grounding endpoint.

  python serve.py --name <experiment_dir> [--ckpt last] [--port 8787] \
                  [--warmup T,Q,L ...] [--set dotted.key value ...]

Loads the experiment exactly like eval.py (frozen opt.yaml + default
backfill + EMA weights) and serves it over HTTP (stdlib ThreadingHTTPServer;
decode itself is single-flight -- TPU programs run serially):

  GET  /healthz          -> {"status": "ok", "backend": "...", ...}
  POST /ground           -> {"detections": [{"segments": [[s,e]...],
                                             "scores": [...]}, ...]}

Request body (JSON): feature arrays either inline (nested lists) or as
.npy paths readable by the server --
  vid | vid_path                 (Cv, t) expert clip features
  shallow_vid | shallow_vid_path (Cs, t) sidekick features
  texts                          list of Q (Ct, l_q) token arrays (inline)
      | texts_path               .npz whose sorted entries are the queries
  text_cls | text_cls_path       (Q, Cs) query CLS embeddings
  fps, clip_size, clip_stride, duration   optional grid->seconds mapping
  ext_scores | ext_scores_path   optional (Q, t) external scores

The reference has no serving surface at all (its Evaluator is dataset-bound,
bs=1, libs/worker_v2.py:726-814); this is a deployment capability the
rebuild adds on top of the same decode path the Evaluator uses (shape-bucket
compile cache shared across requests).
"""

import argparse
import json
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


def _load_field(req, name, required=True):
    """Inline nested lists or an .npy/.npz path."""
    if name in req:
        return np.asarray(req[name], np.float32)
    path = req.get(f"{name}_path")
    if path is not None:
        if name == "texts":
            with np.load(path) as z:
                return [np.asarray(z[k], np.float32)
                        for k in sorted(z.files)]
        return np.load(path).astype(np.float32)
    if required:
        raise KeyError(f"request needs '{name}' or '{name}_path'")
    return None


def make_handler(service):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code, payload):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet access log
            pass

        def do_GET(self):
            if self.path == "/healthz":
                import jax
                self._send(200, {"status": "ok",
                                 "backend": jax.default_backend(),
                                 "n_devices": len(jax.devices()),
                                 "phase_stats": service.stats()})
            else:
                self._send(404, {"error": f"unknown path {self.path}"})

        @staticmethod
        def _request_kwargs(req):
            texts = req.get("texts")
            if texts is not None:
                texts = [np.asarray(x, np.float32) for x in texts]
            else:
                texts = _load_field(req, "texts")
            kwargs = dict(vid=_load_field(req, "vid"),
                          shallow_vid=_load_field(req, "shallow_vid"),
                          texts=texts,
                          text_cls=_load_field(req, "text_cls"))
            for k in ("fps", "duration", "clip_size", "clip_stride"):
                if k in req:
                    kwargs[k] = float(req[k])
            ext = _load_field(req, "ext_scores", required=False)
            if ext is not None:
                kwargs["ext_scores"] = ext
            return kwargs

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/ground":
                    detections = service.ground(**self._request_kwargs(req))
                    self._send(200, {"detections": detections})
                elif self.path == "/ground_batch":
                    # list of request objects; same-bucket videos decode
                    # stacked (V videos x Q rows per jitted call)
                    batch = [self._request_kwargs(r)
                             for r in req["requests"]]
                    results = service.ground_many(batch)
                    self._send(200, {"detections_batch": results})
                else:
                    self._send(404, {"error": f"unknown path {self.path}"})
            except Exception as e:  # noqa: BLE001 -- report to the client
                self._send(400, {"error": f"{type(e).__name__}: {e}"})

    return Handler


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--name", required=True,
                        help="experiment directory containing opt.yaml")
    parser.add_argument("--ckpt", default="last")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8787)
    parser.add_argument("--warmup", nargs="*", default=(),
                        help="shape buckets to pre-compile, each T,Q,L "
                             "(e.g. --warmup 2304,8,24 512,1,8)")
    parser.add_argument("--set", dest="set_cfgs", nargs="*", default=None)
    args = parser.parse_args(argv)

    from decafnet_tpu.serve import service_from_logdir
    from decafnet_tpu.utils.backend import resolve_backend_or_exit

    # first device touch: resolve under the wedge watchdog (a stuck axon
    # claim otherwise hangs the CLI forever with no error; CLAUDE.md notes)
    print(f"backend: {resolve_backend_or_exit()}")
    service = service_from_logdir(args.name, args.ckpt, args.set_cfgs)
    for spec in args.warmup:
        t, q, l = (int(x) for x in spec.split(","))
        print(f"warmup T={t} Q={q} L={l} ...", flush=True)
        service.warmup(t, q, l)

    server = ThreadingHTTPServer((args.host, args.port),
                                 make_handler(service))
    print(f"serving {args.name} [{args.ckpt}] on "
          f"http://{args.host}:{args.port}  (POST /ground)", flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
