"""HTTP folding service tests (in-process server, tiny model)."""

import json
import threading
import urllib.request

import pytest
import jax

from dmpfold2_tpu.models import gruresnet
from dmpfold2_tpu.serve import serve


@pytest.fixture(scope="module")
def server_url():
    params = gruresnet.init_params(jax.random.PRNGKey(0), width=32, cwidth=16, num_blocks=2)
    server = serve(params, host="127.0.0.1", port=0, precision="fp32")
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}"
    server.shutdown()


def test_healthz(server_url):
    with urllib.request.urlopen(f"{server_url}/healthz") as resp:
        assert resp.status == 200


def test_fold_roundtrip(server_url):
    aln_text = ">query\nIKLTVGGVDITFEPN\nITLTIAGTDISFEPT\nIVLGVAGTDLTFKPT\n"
    req = urllib.request.Request(
        f"{server_url}/fold?iterations=1&minsteps=2",
        data=aln_text.encode(), method="POST",
    )
    with urllib.request.urlopen(req) as resp:
        body = resp.read().decode()
    assert body.startswith("REMARK  CONF:")
    assert "ATOM" in body and body.rstrip().endswith("END")

    with urllib.request.urlopen(f"{server_url}/stats") as resp:
        stats = json.loads(resp.read())
    assert stats["targets"] >= 1


def test_fold_bad_input(server_url):
    req = urllib.request.Request(f"{server_url}/fold", data=b"", method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as err:
        assert err.code == 400


def test_fold_bad_params_is_400(server_url):
    req = urllib.request.Request(
        f"{server_url}/fold?iterations=ten", data=b"ARND\n", method="POST")
    try:
        urllib.request.urlopen(req)
        assert False
    except urllib.error.HTTPError as err:
        assert err.code == 400


def test_fold_a3m_body(server_url):
    aln_text = ">q\nARNDARND\n>s\nAbRNDARcND\n"  # a3m insertions stripped
    req = urllib.request.Request(
        f"{server_url}/fold?iterations=0&minsteps=0",
        data=aln_text.encode(), method="POST")
    with urllib.request.urlopen(req) as resp:
        assert resp.status == 200


def _template_pdb_text(nres: int, seed: int = 3) -> str:
    """CA-only PDB text with ``nres`` residues (valid fixed columns)."""
    import numpy as np

    from dmpfold2_tpu.utils.pdb import format_pdb

    rng = np.random.default_rng(seed)
    coords = rng.normal(size=(nres, 5, 3)).astype(np.float32) * 3
    confs = np.full((nres,), 0.5, np.float32)
    return "\n".join(format_pdb(coords, confs, np.zeros((nres,), np.int64)))


def test_fold_json_template_roundtrip(server_url):
    """JSON body with a template PDB reaches the template-seeded path
    (CLI -t parity; reference predict.py:106-119)."""
    aln = "IKLTVGGVDITFEPN\nITLTIAGTDISFEPT\n"
    doc = {"aln": aln, "template_pdb": _template_pdb_text(15),
           "iterations": 1, "minsteps": 2}
    req = urllib.request.Request(
        f"{server_url}/fold", data=json.dumps(doc).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req) as resp:
        body = resp.read().decode()
    assert body.startswith("REMARK  CONF:")
    assert body.rstrip().endswith("END")


def test_fold_json_template_affects_result(server_url):
    """The template must actually seed the dmap channel: folding with and
    without it from the same alignment gives different coordinates."""
    aln = "IKLTVGGVDITFEPN\nITLTIAGTDISFEPT\n"
    out = {}
    for name, doc in (
        ("plain", {"aln": aln, "iterations": 0, "minsteps": 0}),
        ("tmpl", {"aln": aln, "template_pdb": _template_pdb_text(15),
                  "iterations": 0, "minsteps": 0}),
    ):
        req = urllib.request.Request(
            f"{server_url}/fold", data=json.dumps(doc).encode(),
            method="POST", headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req) as resp:
            out[name] = resp.read().decode()
    assert out["plain"] != out["tmpl"]


def test_fold_json_template_length_mismatch_400(server_url):
    doc = {"aln": "ARNDARND\n", "template_pdb": _template_pdb_text(5)}
    req = urllib.request.Request(
        f"{server_url}/fold", data=json.dumps(doc).encode(), method="POST",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 400"
    except urllib.error.HTTPError as err:
        assert err.code == 400
        assert "lengths must match" in err.read().decode()


@pytest.fixture(scope="module")
def hardened_url():
    """Server with a tiny body cap and a short read timeout."""
    params = gruresnet.init_params(jax.random.PRNGKey(0), width=16, cwidth=8,
                                   num_blocks=2)
    server = serve(params, host="127.0.0.1", port=0, precision="fp32",
                   max_body_bytes=1000, read_timeout_s=0.5)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{port}", port
    server.shutdown()
    server.fold_service.close()


def test_oversized_body_rejected_413(hardened_url):
    url, _ = hardened_url
    req = urllib.request.Request(f"{url}/fold", data=b"A" * 2000,
                                 method="POST")
    try:
        urllib.request.urlopen(req)
        assert False, "expected HTTP 413"
    except urllib.error.HTTPError as err:
        assert err.code == 413


def test_slow_client_times_out_408(hardened_url):
    """A client that stalls mid-body gets a 408 (and frees the handler
    thread) instead of holding the connection open forever."""
    import socket

    _, port = hardened_url
    with socket.create_connection(("127.0.0.1", port), timeout=10) as sock:
        sock.sendall(b"POST /fold HTTP/1.1\r\nHost: x\r\n"
                     b"Content-Length: 100\r\n\r\npartial")
        sock.settimeout(10)
        data = sock.recv(4096)
    assert b"408" in data.split(b"\r\n", 1)[0]


def test_truncated_body_400(hardened_url):
    """Client closes before sending the promised Content-Length."""
    import socket

    _, port = hardened_url
    with socket.create_connection(("127.0.0.1", port), timeout=10) as sock:
        sock.sendall(b"POST /fold HTTP/1.1\r\nHost: x\r\n"
                     b"Content-Length: 100\r\n\r\npartial")
        sock.shutdown(socket.SHUT_WR)
        sock.settimeout(10)
        data = sock.recv(4096)
    assert b"400" in data.split(b"\r\n", 1)[0]


def test_concurrent_requests_are_batched():
    """Concurrent same-config requests coalesce into one device dispatch
    (the serving layer's batching promise — VERDICT round 1 item 8)."""
    from dmpfold2_tpu.serve import serve as make_server

    params = gruresnet.init_params(jax.random.PRNGKey(0), width=32, cwidth=16,
                                   num_blocks=2)
    # long window so all clients land in one coalescing batch deterministically
    server = make_server(params, host="127.0.0.1", port=0, precision="fp32",
                         batch_window_s=1.0, max_batch=8)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{port}"
    aln_text = ">q\nIKLTVGGVDITFEPN\nITLTIAGTDISFEPT\n"

    bodies, errors = [], []

    def client():
        req = urllib.request.Request(
            f"{url}/fold?iterations=0&minsteps=1",
            data=aln_text.encode(), method="POST")
        try:
            with urllib.request.urlopen(req, timeout=300) as resp:
                bodies.append(resp.read().decode())
        except Exception as exc:  # pragma: no cover - surfaced in assert
            errors.append(exc)

    clients = [threading.Thread(target=client) for _ in range(4)]
    for t in clients:
        t.start()
    for t in clients:
        t.join(timeout=300)
    service = server.fold_service
    server.shutdown()
    service.close()

    assert not errors, errors
    assert len(bodies) == 4
    assert all(b.startswith("REMARK  CONF:") for b in bodies)
    # all four requests must have ridden fewer device dispatches than
    # requests, with at least one multi-target batch
    assert service.batch_stats["requests"] == 4
    assert service.batch_stats["max_coalesced"] >= 2
    assert service.batch_stats["dispatches"] < 4


def test_mesh_sharded_service():
    """Serving over a device mesh: coalesced request batches shard
    data-parallel across chips (the `--mesh` deployment mode); a lone
    request also rides the batched path so no chip idles."""
    from dmpfold2_tpu.parallel.mesh import make_mesh

    params = gruresnet.init_params(jax.random.PRNGKey(0), width=32, cwidth=16,
                                   num_blocks=2)
    mesh = make_mesh(n_data=4, n_seq=2)  # 8 in-process CPU devices
    server = serve(params, host="127.0.0.1", port=0, precision="fp32",
                   batch_window_s=1.0, max_batch=8, mesh=mesh)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{port}"
    aln_text = ">q\nIKLTVGGVDITFEPN\nITLTIAGTDISFEPT\n"

    bodies, errors = [], []

    def client():
        req = urllib.request.Request(
            f"{url}/fold?iterations=0&minsteps=1",
            data=aln_text.encode(), method="POST")
        try:
            with urllib.request.urlopen(req, timeout=300) as resp:
                bodies.append(resp.read().decode())
        except Exception as exc:  # pragma: no cover - surfaced in assert
            errors.append(exc)

    # burst of 4 -> one data-parallel dispatch over the mesh
    clients = [threading.Thread(target=client) for _ in range(4)]
    for t in clients:
        t.start()
    for t in clients:
        t.join(timeout=300)
    # a lone request must also succeed (mesh path, padded batch)
    client()
    service = server.fold_service
    server.shutdown()
    service.close()

    assert not errors, errors
    assert len(bodies) == 5
    assert all(b.startswith("REMARK  CONF:") for b in bodies)
    assert service.batch_stats["requests"] == 5
    assert service.batch_stats["max_coalesced"] >= 2
    # every request (even the lone one) rode the batched mesh path
    assert service.min_batched == 1


def test_sigterm_graceful_shutdown(tmp_path):
    """`python -m dmpfold2_tpu.serve` must drain and exit 0 on SIGTERM
    (load balancers send SIGTERM on rollouts), not die mid-request."""
    import os
    import signal
    import subprocess
    import sys
    import time

    from dmpfold2_tpu.weights import save_params

    params = gruresnet.init_params(jax.random.PRNGKey(0), width=16, cwidth=8,
                                   num_blocks=2)
    wpath = str(tmp_path / "tiny.npz")
    save_params(wpath, params)
    env = dict(os.environ, JAX_PLATFORMS="cpu", DMPFOLD2_TPU_NO_CACHE="1")
    # --platform cpu: the container's sitecustomize re-pins
    # JAX_PLATFORMS=axon inside the child, and a TPU-attached child would
    # hang here whenever another process holds the chip
    proc = subprocess.Popen(
        [sys.executable, "-m", "dmpfold2_tpu.serve", "--host", "127.0.0.1",
         "--port", "0", "--weights", wpath, "--precision", "fp32",
         "--warmup", "8x16", "--platform", "cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
    )
    try:
        # wait for warmup + listening (port 0: we never need the real port —
        # SIGTERM during/after warmup must both drain cleanly). select()
        # before each readline: a silent child must trip the deadline, not
        # block readline forever.
        import select

        deadline = time.time() + 300
        line = ""
        while time.time() < deadline:
            if not select.select([proc.stdout], [], [], 5.0)[0]:
                continue
            line = proc.stdout.readline()
            if "serving on" in line or not line:
                break
        assert "serving on" in line, f"server never came up: {line!r}"
        proc.send_signal(signal.SIGTERM)
        rc = proc.wait(timeout=60)
        assert rc == 0
    finally:
        if proc.poll() is None:
            proc.kill()
