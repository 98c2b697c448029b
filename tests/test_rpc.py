"""RPC transport tests: zero-copy numpy framing, errors, deadlines.

The graph-engine tests (`test_dist_cpu_graph.py`) exercise the protocol
end-to-end through the service; these cover the framing layer directly —
arrays of every common dtype/shape must round-trip bit-exactly without
going through pickle (the skeleton must contain only placeholders).
"""

import pickle
import threading
import time

import numpy as np
import pytest

from pgl_tpu.distributed.rpc import (RpcClient, RpcServer, _NpRef, _strip,
                                     _fill)


class _EchoService:
    def echo(self, *args, **kwargs):
        return (args, kwargs)

    def boom(self):
        raise ValueError("intentional")

    def slow(self, seconds):
        time.sleep(seconds)
        return "done"


@pytest.fixture(scope="module")
def server():
    srv = RpcServer(_EchoService()).start()
    yield srv
    srv.stop()


@pytest.fixture()
def client(server):
    c = RpcClient(f"{server.host}:{server.port}", timeout=10.0, retries=0)
    yield c
    c.close()


def test_scalar_and_string_round_trip(client):
    args, kwargs = client.call("echo", 1, "two", 3.5, key=[True, None])
    assert args == (1, "two", 3.5)
    assert kwargs == {"key": [True, None]}


@pytest.mark.parametrize("dtype", [np.float32, np.float64, np.int32,
                                   np.int64, np.uint8, np.bool_])
def test_array_round_trip_dtypes(client, dtype):
    arr = np.arange(37).astype(dtype).reshape(1, 37)
    (out,), _ = client.call("echo", arr)
    assert out.dtype == arr.dtype and out.shape == arr.shape
    np.testing.assert_array_equal(out, arr)


def test_nested_structure_round_trip(client):
    payload = {
        "ids": np.arange(1000, dtype=np.int64),
        "feats": [np.random.default_rng(0).normal(size=(64, 16))
                  .astype(np.float32), "tag"],
        "empty": np.zeros((0, 3), np.float32),
        "scalar0d": np.array(2.5),
        "nested": (np.ones(4, np.uint8), {"deep": np.full((2, 2), 7)}),
    }
    (out,), _ = client.call("echo", payload)
    np.testing.assert_array_equal(out["ids"], payload["ids"])
    np.testing.assert_array_equal(out["feats"][0], payload["feats"][0])
    assert out["feats"][1] == "tag"
    assert out["empty"].shape == (0, 3)
    assert out["scalar0d"].shape == () and out["scalar0d"].item() == 2.5
    np.testing.assert_array_equal(out["nested"][0], payload["nested"][0])
    np.testing.assert_array_equal(out["nested"][1]["deep"],
                                  payload["nested"][1]["deep"])


def test_non_contiguous_array(client):
    arr = np.arange(100).reshape(10, 10)[::2, ::3]
    (out,), _ = client.call("echo", arr)
    np.testing.assert_array_equal(out, arr)


def test_large_array_round_trip(client):
    arr = np.random.default_rng(1).integers(0, 1 << 30, size=(1 << 20,)
                                            ).astype(np.int64)
    (out,), _ = client.call("echo", arr)
    np.testing.assert_array_equal(out, arr)


def test_arrays_bypass_pickle():
    """The pickled skeleton must contain placeholders, not array bytes."""
    bufs = []
    arr = np.arange(10000, dtype=np.float64)
    skeleton = _strip({"x": arr, "y": [arr, 1]}, bufs)
    assert len(bufs) == 2
    blob = pickle.dumps(skeleton)
    assert len(blob) < 500  # 160 kB of array data is NOT in the pickle
    restored = _fill(pickle.loads(blob), bufs)
    np.testing.assert_array_equal(restored["x"], arr)
    np.testing.assert_array_equal(restored["y"][0], arr)
    assert restored["y"][1] == 1


def test_object_dtype_falls_back_to_pickle(client):
    arr = np.array(["a", None, 3], dtype=object)
    (out,), _ = client.call("echo", arr)
    assert list(out) == ["a", None, 3]


def test_remote_exception_propagates(client):
    with pytest.raises(RuntimeError, match="intentional"):
        client.call("boom")


def test_deadline_raises(server):
    c = RpcClient(f"{server.host}:{server.port}", timeout=0.3, retries=0,
                  retry_wait=0.0)
    try:
        with pytest.raises(TimeoutError):
            c.call("slow", 5.0)
    finally:
        c.close()
