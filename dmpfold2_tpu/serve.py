"""Minimal production serving layer: HTTP folding service.

Wraps the engine in a threaded HTTP server for deployment behind a load
balancer — one process per TPU host. Concurrent requests are coalesced by a
dispatcher thread and folded together per shape bucket through the streaming
engine (``BatchFolder``), falling back to the single-target path under low
load. Endpoints:

  POST /fold?iterations=10&minsteps=100   body: aln text -> PDB text
  POST /fold   (Content-Type: application/json)
       body: {"aln": "...", "template_pdb": "ATOM...", "iterations": 10,
              "minsteps": 100} -> PDB text — the JSON form carries an
       optional template PDB (CLI ``-t`` parity; reference
       predict.py:106-119 template-seeded prediction)
  GET  /healthz                           liveness (cached; folds at most once)
  GET  /stats                             throughput + batching counters (JSON)

Request hardening: bodies above ``--max-body-mb`` are rejected with 413
without reading them, a missing/invalid Content-Length is a 411/400, and a
client that stalls mid-body trips the socket read timeout (408) instead of
wedging the handler thread.

Run: ``python -m dmpfold2_tpu.serve --port 8080 [--weights params.npz]``.
The reference has no serving story (CLI-only); this is net-new surface.
"""

from __future__ import annotations

import argparse
import json
import queue
import threading
import time
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import numpy as np

from .config import FoldConfig
from .engine.fold import DEFAULT_ITERATIONS, DEFAULT_MINSTEPS, Folder
from .parallel.stream import BatchFolder, Target
from .utils import aln as aln_io
from .utils import pdb as pdb_io
from .utils.obs import Counters

# the tiny alignment folded by the first /healthz probe (and pre-warmed at
# startup so that probe doesn't trigger a cold XLA compile)
HEALTH_ALN = "ARNDARNDARNDARND\n"
HEALTH_SHAPE = (1, 16)


@dataclass
class _FoldRequest:
    alnmat: np.ndarray
    iterations: int
    minsteps: int
    template_ca: np.ndarray | None = None
    event: threading.Event = field(default_factory=threading.Event)
    result: tuple | None = None
    error: Exception | None = None


class FoldService:
    """Folding backend shared by request handlers.

    Handler threads enqueue requests; a single dispatcher thread coalesces
    whatever arrives within ``batch_window_s`` (up to ``max_batch``), groups
    by (iterations, minsteps), and dispatches each group through
    ``BatchFolder`` — so N concurrent same-bucket requests cost one device
    program instead of N serialized folds.
    """

    def __init__(self, params, precision: str = "bf16",
                 config: FoldConfig | None = None,
                 batch_window_s: float = 0.05, max_batch: int = 8,
                 max_body_bytes: int = 64 * 2 ** 20,
                 read_timeout_s: float = 30.0, mesh=None):
        self.max_body_bytes = max_body_bytes
        self.read_timeout_s = read_timeout_s
        cfg = config or FoldConfig(precision=precision)
        self.config = cfg
        self.counters = Counters()
        self.folder = Folder.from_config(params, cfg)
        # the coalesced path must run the same implementation knobs as the
        # single path, or identical inputs would return (slightly) different
        # results depending on server load
        self.batcher = BatchFolder(
            params, mesh=mesh, precision=cfg.precision,
            dca_method=cfg.dca_method,
            vgru_impl=cfg.vgru_impl, counters=self.counters,
        )
        # under a mesh, even a lone request should ride the data-parallel
        # batched path (the single-target Folder would leave every chip but
        # one idle)
        self.min_batched = 1 if mesh is not None else 2
        self.batch_window_s = batch_window_s
        self.max_batch = max_batch
        self.batch_stats = {"dispatches": 0, "requests": 0, "max_coalesced": 0}
        self._ready = threading.Event()
        self._closed = False
        self._queue: queue.Queue = queue.Queue()
        # pipelined dispatch (round-4 verdict item 3): the dispatcher thread
        # only parses/pads/uploads/launches each group (JAX dispatch is
        # async) and hands a finisher to this bounded queue; the finisher
        # thread blocks on device results. Group k+1's host-side prep thus
        # overlaps group k's device compute — the same depth-2 window
        # parallel/stream.py uses one layer down. maxsize bounds in-flight
        # device batches (and their HBM input buffers).
        self._finish_queue: queue.Queue = queue.Queue(maxsize=2)
        # in-flight group count (queued + currently finishing): while > 0
        # the dispatcher keeps coalescing instead of launching undersized
        # batches — waiting is latency-free there because a new batch would
        # only queue behind the running fold on the (serial) device anyway.
        # First measured round 5: launching eagerly shrank mean batch size
        # 7 -> 3.5 and throughput 13.8 -> 12.4 req/s; busy-coalescing is
        # what converts pipelining into full batches.
        self._inflight = 0
        self._inflight_lock = threading.Lock()
        # hard cap on busy-coalescing so one pathological in-flight fold
        # (e.g. minsteps=100000) cannot stall queued quick requests forever
        self.busy_collect_cap_s = 30.0
        self._thread = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._thread.start()
        self._finish_thread = threading.Thread(target=self._finish_loop,
                                               daemon=True)
        self._finish_thread.start()

    # -- lifecycle ---------------------------------------------------------

    def _batch_ladder(self) -> list[int]:
        """Warmed device batch sizes: powers of two from 2 to max_batch."""
        sizes = [2]
        while sizes[-1] < self.max_batch:
            sizes.append(min(sizes[-1] * 2, self.max_batch))
        return sizes

    def _quantized_batch(self, n: int) -> int:
        """Smallest warmed batch size >= n (capped at max_batch)."""
        for bs in self._batch_ladder():
            if bs >= n:
                return bs
        return self.max_batch

    def warmup(self, shapes=((256, 96), (256, 128))) -> None:
        """Precompile common buckets + the healthz shape; marks the service
        ready so /healthz answers from cache.

        Also precompiles the COALESCED path (the batched program is distinct
        from the single-target one) at the quantized batch sizes for the
        primary bucket — otherwise the first concurrent burst stalls every
        queued request behind a cold XLA compile. One-time cost per cluster
        with the persistent compile cache.

        Under a mesh (``min_batched == 1``) every request — including the
        healthz probe — rides the batched path, so the batched program is
        warmed for EVERY shape (healthz included) and the unreachable
        single-target programs are skipped entirely.
        """
        if self.min_batched == 1:
            for nseqs, nres in tuple(shapes) + (HEALTH_SHAPE,):
                aln = np.zeros((nseqs, nres), np.uint8)
                for bs in self._batch_ladder():
                    self.batcher.batch_size = bs
                    self.batcher.fold_many([Target(alnmat=aln)] * 2,
                                           iterations=1, minsteps=1)
            self._ready.set()
            return
        self.folder.warmup(shapes=tuple(shapes) + (HEALTH_SHAPE,))
        if shapes:
            # the alignment must land in the SAME (nseqs, nres) bucket real
            # traffic hits — a smaller warm-up MSA would compile a different
            # (wrong) batched program
            nseqs, nres = shapes[0]
            aln = np.zeros((nseqs, nres), np.uint8)
            for bs in self._batch_ladder():
                self.batcher.batch_size = bs
                self.batcher.fold_many([Target(alnmat=aln)] * 2,
                                       iterations=1, minsteps=1)
        self._ready.set()

    def ready(self) -> bool:
        return self._ready.is_set()

    def close(self) -> None:
        self._closed = True
        self._queue.put(None)

    # -- request path ------------------------------------------------------

    def fold_aln_text(self, text: str, iterations: int, minsteps: int,
                      template_ca: np.ndarray | None = None) -> str:
        # accepts aln or a3m bodies (lowercase insertion states stripped)
        rows = aln_io.a3m_to_rows(text)
        alnmat = aln_io.encode_rows(rows)
        if alnmat.shape[0] > aln_io.MAX_SEQS:
            alnmat = alnmat[: aln_io.MAX_SEQS]
        if template_ca is not None and template_ca.shape[0] != alnmat.shape[1]:
            # validate before enqueueing so a bad template is a client error
            # (400), not a dispatch-time batch failure
            raise ValueError(
                f"template has {template_ca.shape[0]} CA atoms but alignment "
                f"has {alnmat.shape[1]} residues — lengths must match")
        if self._closed:
            raise RuntimeError("service is shutting down")
        req = _FoldRequest(alnmat, iterations, minsteps, template_ca)
        self._queue.put(req)
        while not req.event.wait(timeout=1.0):
            # belt for the close() race: if the pipeline exited after we
            # checked _closed but before our put, nobody will set the event
            if self._closed and not (self._thread.is_alive()
                                     or self._finish_thread.is_alive()):
                raise RuntimeError("service is shutting down")
        if req.error is not None:
            raise req.error
        coords, confs = req.result
        self._ready.set()
        return "\n".join(pdb_io.format_pdb(coords, confs, alnmat[0])) + "\n"

    # -- dispatcher --------------------------------------------------------

    def _dispatch_loop(self) -> None:
        while True:
            req = self._queue.get()
            if req is None:
                self._drain_closed()
                # let the finisher retire every already-launched group
                # (graceful drain), then exit
                self._finish_queue.put(None)
                return
            batch = [req]
            # coalescing policy: a solitary request on an IDLE server
            # dispatches immediately (no window in its latency); when more
            # work is already queued, collect within batch_window_s; and
            # while a group is in flight on the device, keep collecting
            # until it drains (or the cap) — the device is serial, so a
            # batch launched "early" would only queue behind the running
            # fold, whereas holding it fills the batch for free.
            opened = not self._queue.empty()
            deadline = time.monotonic() + self.batch_window_s
            busy_cap = time.monotonic() + self.busy_collect_cap_s
            # while a group is in flight, dispatch at HALF the max batch:
            # with the depth-2 pipeline, a closed-loop client pool splits
            # into two half-size batches in flight (8/8 for 16 clients)
            # with zero ladder padding, instead of the measured 10/6
            # alternation that padded to 16+8 device slots per 16 requests
            busy_target = max(self.min_batched, self.max_batch // 2)
            while len(batch) < self.max_batch:
                now = time.monotonic()
                busy = self._inflight > 0 and now < busy_cap
                if busy and len(batch) >= busy_target:
                    break
                if busy:
                    timeout = 0.01  # poll: wake soon after the device drains
                elif opened and now < deadline:
                    timeout = deadline - now
                else:
                    break
                try:
                    nxt = self._queue.get(timeout=timeout)
                except queue.Empty:
                    if busy:
                        continue  # still busy: hold out for a fuller batch
                    break
                if nxt is None:   # shutdown mid-coalesce: finish batch first
                    self._queue.put(None)
                    break
                batch.append(nxt)

            groups: dict[tuple[int, int], list[_FoldRequest]] = {}
            for r in batch:
                groups.setdefault((r.iterations, r.minsteps), []).append(r)
            for (it, ms), reqs in groups.items():
                fin = self._launch_group(it, ms, reqs)
                if fin is not None:
                    with self._inflight_lock:
                        self._inflight += 1
                    # blocks only when 2 groups are already in flight
                    self._finish_queue.put(fin)

    def _drain_closed(self) -> None:
        """Fail any request enqueued in the close() race so its handler
        thread doesn't wait forever on an event nobody will set."""
        while True:
            try:
                req = self._queue.get_nowait()
            except queue.Empty:
                return
            if req is not None:
                req.error = RuntimeError("service is shutting down")
                req.event.set()

    def _finish_loop(self) -> None:
        while True:
            fin = self._finish_queue.get()
            if fin is None:
                return
            try:
                fin()
            finally:
                with self._inflight_lock:
                    self._inflight -= 1

    def _launch_group(self, iterations: int, minsteps: int,
                      reqs: list[_FoldRequest]):
        """Dispatch one (iterations, minsteps) group without blocking on
        device results.

        Returns a finisher callable that fetches + distributes the results
        (run on the finisher thread), or None when the launch itself failed
        (request events already set). The launch covers parse/pad/upload —
        exactly the host-side work that overlaps the previous group's
        device compute under the depth-2 finish queue.
        """
        self.batch_stats["dispatches"] += 1
        self.batch_stats["requests"] += len(reqs)
        self.batch_stats["max_coalesced"] = max(
            self.batch_stats["max_coalesced"], len(reqs))

        if len(reqs) < self.min_batched:  # low load: single-target path
            r = reqs[0]
            try:
                fetch = self.folder.fold_async(
                    r.alnmat, r.template_ca,
                    iterations=iterations, minsteps=minsteps)
            except Exception as exc:
                r.error = exc
                r.event.set()
                return None

            def finish_single():
                try:
                    r.result = fetch()
                    self.counters.record(r.alnmat.shape[1])
                except Exception as exc:
                    r.error = exc
                r.event.set()

            return finish_single

        # quantize the device batch to a warmed power-of-two size so
        # coalesce counts never hit a cold batched program mid-traffic, and
        # mid-size groups don't pad all the way to max_batch (a 5-request
        # group on a 16-batch server used to waste 11/16 of device compute)
        self.batcher.batch_size = self._quantized_batch(len(reqs))
        try:
            pending = self.batcher.fold_many_async(
                [Target(alnmat=r.alnmat, template_ca=r.template_ca)
                 for r in reqs],
                iterations=iterations, minsteps=minsteps)
        except Exception as exc:
            for r in reqs:
                r.error = exc
                r.event.set()
            return None

        def finish_batched():
            try:
                results = pending.wait()
            except Exception as exc:
                for r in reqs:
                    r.error = exc
                    r.event.set()
                return
            for r, res in zip(reqs, results):
                if res is None:
                    r.error = RuntimeError("fold failed (see target_error log)")
                else:
                    r.result = res
                r.event.set()

        return finish_batched


def make_handler(service: FoldService):
    class Handler(BaseHTTPRequestHandler):
        # socket timeout for all reads on this connection: a client that
        # stalls mid-request-body cannot wedge a handler thread forever
        # (BaseHTTPRequestHandler applies this via connection.settimeout)
        timeout = service.read_timeout_s

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
                # cached liveness: after warmup (or any successful fold) the
                # probe costs nothing; only the very first probe of a cold,
                # un-warmed server folds the tiny health alignment
                if service.ready():
                    self._send(200, "ok\n")
                    return
                try:
                    service.fold_aln_text(HEALTH_ALN, 0, 0)
                except Exception as exc:
                    self._send(500, f"unhealthy: {exc}\n")
                    return
                self._send(200, "ok\n")
            elif path == "/stats":
                stats = service.counters.summary()
                stats["batching"] = dict(service.batch_stats)
                self._send(200, json.dumps(stats) + "\n", "application/json")
            else:
                self._send(404, "not found\n")

        def _read_body(self) -> bytes | None:
            """Bounded, timeout-guarded body read; sends the error response
            and returns None on failure."""
            raw_len = self.headers.get("Content-Length")
            if raw_len is None:
                self._send(411, "length required\n")
                return None
            try:
                length = int(raw_len)
            except ValueError:
                self._send(400, f"bad Content-Length: {raw_len!r}\n")
                return None
            if length < 0:
                self._send(400, "bad Content-Length: negative\n")
                return None
            if length > service.max_body_bytes:
                # reject BEFORE reading: a malicious Content-Length must not
                # make the server buffer an arbitrarily large body
                self._send(413, f"body too large ({length} bytes > "
                                f"{service.max_body_bytes} limit)\n")
                return None
            try:
                body = self.rfile.read(length)
            except TimeoutError:  # socket.timeout: client stalled mid-body
                self._send(408, "request body read timed out\n")
                return None
            if len(body) < length:  # client closed early
                self._send(400, "truncated body\n")
                return None
            return body

        def do_POST(self):
            parsed = urlparse(self.path)
            if parsed.path != "/fold":
                self._send(404, "not found\n")
                return
            body = self._read_body()
            if body is None:
                return
            query = parse_qs(parsed.query)
            template_ca = None
            try:
                iterations = int(query.get("iterations", [DEFAULT_ITERATIONS])[0])
                minsteps = int(query.get("minsteps", [DEFAULT_MINSTEPS])[0])
                ctype = (self.headers.get("Content-Type") or "").split(";")[0].strip()
                if ctype == "application/json":
                    # JSON form: alignment + optional template PDB text
                    # (CLI -t parity; reference predict.py:106-119), with
                    # iterations/minsteps overridable in the body
                    doc = json.loads(body.decode())
                    if not isinstance(doc, dict) or "aln" not in doc:
                        raise ValueError('JSON body must be {"aln": ...}')
                    text = str(doc["aln"])
                    iterations = int(doc.get("iterations", iterations))
                    minsteps = int(doc.get("minsteps", minsteps))
                    if doc.get("template_pdb"):
                        template_ca = pdb_io.parse_template_ca_text(
                            str(doc["template_pdb"]))
                else:
                    text = body.decode()
            except (ValueError, UnicodeDecodeError) as exc:
                self._send(400, f"bad request: {exc}\n")
                return
            try:
                pdb_text = service.fold_aln_text(text, iterations, minsteps,
                                                 template_ca)
            except ValueError as exc:  # malformed alignment -> client error
                self._send(400, f"bad alignment: {exc}\n")
                return
            except Exception as exc:   # device/compile faults -> server error
                self._send(500, f"internal error: {exc}\n")
                return
            self._send(200, pdb_text, "chemical/x-pdb")

    return Handler


def serve(params, host: str = "0.0.0.0", port: int = 8080,
          precision: str = "bf16", config: FoldConfig | None = None,
          batch_window_s: float = 0.05, max_batch: int = 8,
          max_body_bytes: int = 64 * 2 ** 20,
          read_timeout_s: float = 30.0, mesh=None) -> ThreadingHTTPServer:
    service = FoldService(params, precision, config,
                          batch_window_s=batch_window_s, max_batch=max_batch,
                          max_body_bytes=max_body_bytes,
                          read_timeout_s=read_timeout_s, mesh=mesh)
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
    ap.add_argument("--batch-window-ms", type=float, default=50.0,
                    help="request-coalescing window for batched dispatch")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-body-mb", type=float, default=64.0,
                    help="reject request bodies above this size (413)")
    ap.add_argument("--read-timeout-s", type=float, default=30.0,
                    help="socket read timeout per request (408 on stall)")
    ap.add_argument("--warmup", default="256x96,256x128", metavar="NxL,...",
                    help="comma-separated (nseqs x nres) shapes to precompile "
                         "before accepting traffic — set to the deployment's "
                         "expected bucket mix")
    ap.add_argument("--platform", default=None,
                    help="force the JAX platform (e.g. 'cpu'); needed where "
                         "a sitecustomize pins JAX_PLATFORMS before env "
                         "vars can take effect")
    ap.add_argument("--mesh", default=None, metavar="DATA[xSEQ]",
                    help="serve over a device mesh, e.g. '8' or '4x2': "
                         "coalesced request batches shard data-parallel "
                         "over DATA chips ('auto' = all devices)")
    args = ap.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    mesh = None
    if args.mesh is not None:
        from .parallel.mesh import make_mesh

        if args.mesh == "auto":
            mesh = make_mesh()
        else:
            n_data, _, n_seq = args.mesh.partition("x")
            mesh = make_mesh(int(n_data), int(n_seq or 1))
    warmup_shapes = tuple(
        tuple(int(v) for v in s.split("x")) for s in args.warmup.split(",") if s
    )
    from .utils.cache import enable_persistent_cache

    enable_persistent_cache()
    params = load_weights(args.weights)
    server = serve(params, args.host, args.port, args.precision,
                   batch_window_s=args.batch_window_ms / 1000.0,
                   max_batch=args.max_batch,
                   max_body_bytes=int(args.max_body_mb * 2 ** 20),
                   read_timeout_s=args.read_timeout_s, mesh=mesh)
    # graceful drain on SIGTERM/SIGINT (load balancers send SIGTERM on
    # rollouts): stop accepting work, fail queued requests fast, let the
    # in-flight device batch finish, then return from serve_forever
    import signal
    import sys

    def _graceful(signum, frame):
        print("shutting down (draining in-flight folds)...", file=sys.stderr)
        server.fold_service.close()
        # shutdown() blocks until serve_forever exits — must not run on the
        # signal-handler frame
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, _graceful)
    signal.signal(signal.SIGINT, _graceful)

    # precompile common shape buckets (and the healthz shape) before
    # accepting traffic so the first real requests don't block on minutes of
    # XLA compilation
    print("warming up (precompiling common shape buckets)...")
    server.fold_service.warmup(shapes=warmup_shapes)
    print(f"serving on {args.host}:{args.port}")
    server.serve_forever()
    server.server_close()


if __name__ == "__main__":
    main()
