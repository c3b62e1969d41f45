"""Serving-socket hardening (VERDICT r3 weak #2).

The UNIX socket is a local privilege boundary: it must come up owner-only
(0600), client-directed disk writes must be opt-in and confined to the
allowed directory, and an oversize request line must be rejected cleanly
without desynchronizing the protocol stream.
"""

import json
import os
import socket
import stat
import threading

import numpy as np
import pytest

import seekr_tpu.serve as serve_mod
from seekr_tpu.serve import SeekrService, request, serve_forever

K = 3
DIGIT2CHAR = np.array(list("AGTC"))


def _seqs(rng, n, lo=60, hi=200):
    return ["".join(DIGIT2CHAR[rng.integers(0, 4,
                                            size=int(rng.integers(lo, hi)))])
            for _ in range(n)]


@pytest.fixture(scope="module")
def artifacts(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("serve_sec")
    rng = np.random.default_rng(0)
    np.save(tmp / "mean.npy", rng.uniform(0.5, 2.0, 4 ** K))
    np.save(tmp / "std.npy", rng.uniform(0.5, 2.0, 4 ** K))
    (tmp / "targets.fa").write_text(
        "\n".join(f">t{i}\n{s}" for i, s in enumerate(_seqs(rng, 4))) + "\n")
    return tmp


def _svc(tmp):
    return SeekrService(str(tmp / "mean.npy"), str(tmp / "std.npy"), k=K,
                        targets=str(tmp / "targets.fa"))


class _Running:
    """Context manager: serve_forever in a thread, shutdown on exit."""

    def __init__(self, svc, sock, artifact_dir=None):
        self.sock = sock
        ready = threading.Event()
        self.thread = threading.Thread(
            target=serve_forever, args=(svc, sock, ready),
            kwargs={"artifact_dir": artifact_dir}, daemon=True)
        self.thread.start()
        assert ready.wait(10)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        try:
            request(self.sock, {"op": "shutdown"})
        except OSError:
            pass
        self.thread.join(timeout=10)


def test_socket_created_owner_only(artifacts, tmp_path):
    sock = str(tmp_path / "s.sock")
    with _Running(_svc(artifacts), sock):
        mode = stat.S_IMODE(os.stat(sock).st_mode)
        assert mode == 0o600, oct(mode)


def test_artifact_writes_rejected_by_default(artifacts, tmp_path):
    sock = str(tmp_path / "s.sock")
    rng = np.random.default_rng(1)
    with _Running(_svc(artifacts), sock):
        out = request(sock, {"seqs": _seqs(rng, 1), "want": ["sim"],
                             "outfile": str(tmp_path / "res")})
        assert not out["ok"] and "--allow-artifacts" in out["error"]
        out = request(sock, {"op": "save_corpus",
                             "path": str(tmp_path / "c.npz")})
        assert not out["ok"] and "--allow-artifacts" in out["error"]
        assert not (tmp_path / "res_sim.npy").exists()
        assert not (tmp_path / "c.npz").exists()


def test_artifact_writes_confined_to_allowed_dir(artifacts, tmp_path):
    sock = str(tmp_path / "s.sock")
    allowed = tmp_path / "allowed"
    allowed.mkdir()
    rng = np.random.default_rng(2)
    with _Running(_svc(artifacts), sock, artifact_dir=str(allowed)):
        # the VERDICT's exact traversal example
        out = request(sock, {"seqs": _seqs(rng, 1), "want": ["sim"],
                             "outfile": "/etc/cron.d/x"})
        assert not out["ok"] and "outside" in out["error"]
        # dot-dot escape from inside the allowed dir
        out = request(sock, {"seqs": _seqs(rng, 1), "want": ["sim"],
                             "outfile": str(allowed / ".." / "esc")})
        assert not out["ok"] and "outside" in out["error"]
        assert not (tmp_path / "esc_sim.npy").exists()
        # symlink escape: a link inside the dir pointing outside
        evil = tmp_path / "evil"
        evil.mkdir()
        (allowed / "link").symlink_to(evil)
        out = request(sock, {"seqs": _seqs(rng, 1), "want": ["sim"],
                             "outfile": str(allowed / "link" / "res")})
        assert not out["ok"] and "outside" in out["error"]
        assert not list(evil.iterdir())
        # inside the directory: allowed, file written, path echoed back
        out = request(sock, {"seqs": _seqs(rng, 1), "want": ["sim"],
                             "outfile": str(allowed / "res")})
        assert out["ok"]
        assert out["files"]["sim"] == str(allowed / "res_sim.npy")
        assert (allowed / "res_sim.npy").exists()
        # save_corpus under the same policy
        out = request(sock, {"op": "save_corpus",
                             "path": str(allowed / "c.npz")})
        assert out["ok"]
        assert (allowed / "c.npz").exists()
        out = request(sock, {"op": "save_corpus",
                             "path": str(tmp_path / "outside.npz")})
        assert not out["ok"] and "outside" in out["error"]
        assert not (tmp_path / "outside.npz").exists()


def test_oversize_line_rejected_without_desync(artifacts, tmp_path,
                                               monkeypatch):
    """A line over _MAX_REQUEST must produce ONE error and leave the
    stream in sync: the next (valid) request on the same connection is
    answered normally — previously the truncated remainder was parsed
    as the next request (VERDICT r3)."""
    monkeypatch.setattr(serve_mod, "_MAX_REQUEST", 4096)
    sock_path = str(tmp_path / "s.sock")
    with _Running(_svc(artifacts), sock_path):
        big = json.dumps({"seqs": ["A" * 8192], "want": ["sim"]})
        assert len(big) > 4096
        valid = json.dumps({"op": "ping"})
        with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
            s.settimeout(30)
            s.connect(sock_path)
            s.sendall(big.encode() + b"\n" + valid.encode() + b"\n")
            buf = b""
            while buf.count(b"\n") < 2:
                chunk = s.recv(1 << 20)
                if not chunk:
                    break
                buf += chunk
        lines = buf.decode().splitlines()
        assert len(lines) == 2, lines
        first, second = (json.loads(l) for l in lines)
        assert not first["ok"] and "exceeds" in first["error"]
        assert second["ok"] and second["k"] == K  # the ping, in sync


def test_malformed_protocol_fuzz(artifacts, tmp_path):
    """Garbage requests get {"ok": false} replies; the server survives
    all of them and still answers a valid request on a new connection."""
    sock_path = str(tmp_path / "s.sock")
    rng = np.random.default_rng(3)
    garbage = [
        b"not json at all",
        b"\x00\xff\xfe\x80 binary noise",
        b"{\"seqs\": ",                      # truncated JSON
        b"[1, 2, 3]",                          # wrong top-level type
        b"{}",                                  # no seqs
        b"{\"seqs\": 5}",                      # wrong type
        b"{\"seqs\": []}",                     # empty batch
        b"{\"seqs\": [42]}",                   # non-string sequence
        b"{\"seqs\": [\"AGTC\"], \"want\": [\"bogus\"]}",
        b"{\"seqs\": [\"AGTC\"], \"topk\": \"x\"}",
        b"{\"op\": []}",
        b"{\"op\": \"nope\"}",
        b"{\"op\": \"add_targets\"}",
        b"{\"op\": \"save_corpus\"}",
        json.dumps({"seqs": ["AGTC"], "want": ["sim"],
                    "outfile": 123}).encode(),
    ]
    with _Running(_svc(artifacts), sock_path):
        for line in garbage:
            with socket.socket(socket.AF_UNIX, socket.SOCK_STREAM) as s:
                s.settimeout(30)
                s.connect(sock_path)
                s.sendall(line + b"\n")
                buf = b""
                while not buf.endswith(b"\n"):
                    chunk = s.recv(1 << 20)
                    if not chunk:
                        break
                    buf += chunk
            resp = json.loads(buf)
            assert resp["ok"] is False, (line, resp)
            assert resp["error"]
        # the service is still healthy
        out = request(sock_path, {"seqs": _seqs(rng, 2), "want": ["sim"]})
        assert out["ok"] and len(out["sim"]) == 2


def test_prefix_equal_to_allowed_dir_rejected(artifacts, tmp_path):
    """outfile == the allowed directory itself would write sibling
    files OUTSIDE it (prefix + '_sim.npy'); strictly-inside is required
    (review finding)."""
    sock = str(tmp_path / "s.sock")
    allowed = tmp_path / "allowed"
    allowed.mkdir()
    rng = np.random.default_rng(9)
    with _Running(_svc(artifacts), sock, artifact_dir=str(allowed)):
        out = request(sock, {"seqs": _seqs(rng, 1), "want": ["sim"],
                             "outfile": str(allowed)})
        assert not out["ok"] and "outside" in out["error"]
        assert not list(tmp_path.glob("allowed_*.npy"))


def test_planted_final_symlink_rejected(artifacts, tmp_path):
    """A symlink planted at the FINAL artifact path (res_sim.npy) must
    not redirect the write outside the allowed directory — the final
    paths are re-checked at write time (review finding)."""
    sock = str(tmp_path / "s.sock")
    allowed = tmp_path / "allowed"
    allowed.mkdir()
    victim = tmp_path / "victim.bin"
    victim.write_bytes(b"precious")
    (allowed / "res_sim.npy").symlink_to(victim)
    rng = np.random.default_rng(10)
    with _Running(_svc(artifacts), sock, artifact_dir=str(allowed)):
        out = request(sock, {"seqs": _seqs(rng, 1), "want": ["sim"],
                             "outfile": str(allowed / "res")})
        assert not out["ok"] and "outside" in out["error"]
    assert victim.read_bytes() == b"precious"  # untouched
