"""Minimal production serving layer: HTTP folding service.

Wraps the engine in a threaded HTTP server for deployment behind a load
balancer — one process per TPU host, requests batched per shape bucket by
the streaming engine. Endpoints:

  POST /fold?iterations=10&minsteps=100   body: aln text -> PDB text
  GET  /healthz                           liveness (runs a tiny fold)
  GET  /stats                             throughput counters (JSON)

Run: ``python -m dmpfold2_tpu.serve --port 8080 [--weights params.npz]``.
The reference has no serving story (CLI-only); this is net-new surface.
"""

from __future__ import annotations

import argparse
import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from .engine.fold import DEFAULT_ITERATIONS, DEFAULT_MINSTEPS, Folder
from .utils import aln as aln_io
from .utils import pdb as pdb_io
from .utils.obs import Counters


class FoldService:
    """Thread-safe folding backend shared by request handlers."""

    def __init__(self, params, precision: str = "bf16"):
        self.folder = Folder(params, precision=precision)
        self.counters = Counters()
        self._lock = threading.Lock()  # one fold at a time per chip

    def fold_aln_text(self, text: str, iterations: int, minsteps: int) -> str:
        # accepts aln or a3m bodies (lowercase insertion states stripped)
        rows = aln_io.a3m_to_rows(text)
        alnmat = aln_io.encode_rows(rows)
        if alnmat.shape[0] > aln_io.MAX_SEQS:
            alnmat = alnmat[: aln_io.MAX_SEQS]
        with self._lock:
            coords, confs = self.folder.fold(
                alnmat, iterations=iterations, minsteps=minsteps
            )
            self.counters.record(alnmat.shape[1])
        return "\n".join(pdb_io.format_pdb(coords, confs, alnmat[0])) + "\n"


def make_handler(service: FoldService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet default access log
            pass

        def _send(self, code: int, body: str, ctype: str = "text/plain"):
            data = body.encode()
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/healthz":
                # exercise the model (compiled after the first call)
                try:
                    service.fold_aln_text("ARNDARNDARNDARND\n", 0, 0)
                except Exception as exc:
                    self._send(500, f"unhealthy: {exc}\n")
                    return
                self._send(200, "ok\n")
            elif path == "/stats":
                self._send(200, json.dumps(service.counters.summary()) + "\n",
                           "application/json")
            else:
                self._send(404, "not found\n")

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/fold":
                self._send(404, "not found\n")
                return
            query = parse_qs(parsed.query)
            try:
                iterations = int(query.get("iterations", [DEFAULT_ITERATIONS])[0])
                minsteps = int(query.get("minsteps", [DEFAULT_MINSTEPS])[0])
                length = int(self.headers.get("Content-Length", 0))
                text = self.rfile.read(length).decode()
            except (ValueError, UnicodeDecodeError) as exc:
                self._send(400, f"bad request: {exc}\n")
                return
            try:
                pdb_text = service.fold_aln_text(text, iterations, minsteps)
            except ValueError as exc:  # malformed alignment -> client error
                self._send(400, f"bad alignment: {exc}\n")
                return
            except Exception as exc:   # device/compile faults -> server error
                self._send(500, f"internal error: {exc}\n")
                return
            self._send(200, pdb_text, "chemical/x-pdb")

    return Handler


def serve(params, host: str = "0.0.0.0", port: int = 8080,
          precision: str = "bf16") -> ThreadingHTTPServer:
    service = FoldService(params, precision)
    server = ThreadingHTTPServer((host, port), make_handler(service))
    server.fold_service = service  # exposed for warmup / introspection
    return server


def main(argv=None):
    from .engine.fold import load_weights

    ap = argparse.ArgumentParser(description="DMPfold2-TPU folding service")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8080)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--precision", default="bf16")
    args = ap.parse_args(argv)
    from .utils.cache import enable_persistent_cache

    enable_persistent_cache()
    params = load_weights(args.weights)
    server = serve(params, args.host, args.port, args.precision)
    # precompile common shape buckets before accepting traffic so the first
    # real requests don't block on minutes of XLA compilation
    print("warming up (precompiling common shape buckets)...")
    server.fold_service.folder.warmup(shapes=((256, 96), (256, 128)))
    print(f"serving on {args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
