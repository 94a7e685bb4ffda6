"""HTTP serving load test: sustained folds/s and latency percentiles.

Starts the in-process folding service (same code path as
``python -m dmpfold2_tpu.serve``) with the bench weights, warms the
deployment buckets, then drives it with a closed-loop pool of concurrent
clients posting the bundled PF10963 alignment. Reports sustained
requests/s and p50/p95/p99 latency — the serving-layer numbers that
wall-clock fold benchmarks (bench.py) do not capture: request coalescing,
queueing, and dispatch pipelining under load.

Usage: python scripts/load_test_serve.py [clients] [requests] [iterations]
Prints one JSON line to stdout; progress to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from dmpfold2_tpu.utils import assets

EXAMPLE_ALN = assets.example_aln_path()


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    clients = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    total = int(sys.argv[2]) if len(sys.argv) > 2 else 96
    iterations = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    from bench import get_bench_params
    from dmpfold2_tpu.serve import serve
    from dmpfold2_tpu.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    params = get_bench_params()
    server = serve(params, host="127.0.0.1", port=0, precision="bf16",
                   batch_window_s=0.05, max_batch=16)
    port = server.server_address[1]
    threading.Thread(target=server.serve_forever, daemon=True).start()
    with open(EXAMPLE_ALN, "rb") as fh:
        body = fh.read()

    log("warming up (256x88 bucket + coalesced batch programs)...")
    t0 = time.perf_counter()
    server.fold_service.warmup(shapes=((256, 88),))
    log(f"warmup {time.perf_counter() - t0:.1f}s; "
        f"driving {total} requests with {clients} clients")

    url = f"http://127.0.0.1:{port}/fold?iterations={iterations}&minsteps=100"
    latencies: list[float] = []
    errors: list[str] = []
    lock = threading.Lock()
    remaining = [total]

    def client():
        while True:
            with lock:
                if remaining[0] <= 0:
                    return
                remaining[0] -= 1
            req = urllib.request.Request(url, data=body, method="POST")
            t0 = time.perf_counter()
            try:
                with urllib.request.urlopen(req, timeout=600) as resp:
                    resp.read()
                with lock:
                    latencies.append(time.perf_counter() - t0)
            except Exception as exc:
                with lock:
                    errors.append(str(exc)[:100])

    t_start = time.perf_counter()
    threads = [threading.Thread(target=client) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    elapsed = time.perf_counter() - t_start
    server.fold_service.close()
    server.shutdown()

    latencies.sort()
    pct = lambda p: round(latencies[min(int(p * len(latencies)),
                                        len(latencies) - 1)], 3)
    stats = server.fold_service.batch_stats
    out = {
        "clients": clients,
        "requests": len(latencies),
        "errors": len(errors),
        "seconds": round(elapsed, 2),
        "requests_per_s": round(len(latencies) / elapsed, 2),
        "latency_p50_s": pct(0.50),
        "latency_p95_s": pct(0.95),
        "latency_p99_s": pct(0.99),
        "dispatches": stats["dispatches"],
        "max_coalesced": stats["max_coalesced"],
        "iterations": iterations,
    }
    if errors:
        out["error_sample"] = errors[:3]
    print(json.dumps(out))


if __name__ == "__main__":
    main()
