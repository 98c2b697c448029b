"""Distributed graph service: 2 real servers + 2 clients on localhost in one
process, inline data files — mirroring the reference test harness
(``tests/test_dist_cpu_graph.py:18-143``)."""

import os
import socket

import numpy as np
import pytest

from pgl_tpu.distributed import DistGraphServer, DistGraphClient
from pgl_tpu.distributed.helper import (parse_files, reverse_etype,
                                        get_all_edge_type)

EDGES = """37\t45\t0.34
37\t145\t0.31
37\t112\t0.21
96\t48\t1.4
96\t247\t0.31
96\t111\t1.21
59\t45\t0.34
59\t145\t0.31
59\t122\t0.21
97\t48\t0.34
98\t133\t0.31
7\t133\t0.31
59\t133\t1.21
97\t250\t0.21
"""

NODES = """u\t37
u\t96
u\t59
u\t97
u\t98
u\t7
t\t45
t\t145
t\t112
t\t48
t\t247
t\t111
t\t122
t\t133
t\t250
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.fixture(scope="module")
def service(tmp_path_factory):
    d = tmp_path_factory.mktemp("distgraph")
    (d / "edges.txt").write_text(EDGES)
    (d / "node_types.txt").write_text(NODES)
    config = {
        "etype2files": f"u2e2t:{d}/edges.txt",
        "symmetry": True,
        "ntype2files": f"u:{d}/node_types.txt,t:{d}/node_types.txt",
        "nfeat_info": [["u", "a", "float32", 1]],
    }
    ips = [f"127.0.0.1:{_free_port()}", f"127.0.0.1:{_free_port()}"]
    servers = [DistGraphServer(config, shard_num=4, ip_config=ips,
                               server_id=i) for i in range(2)]
    clients = [DistGraphClient(config, shard_num=4, ip_config=ips,
                               client_id=i) for i in range(2)]
    clients[0].load_edges()
    clients[0].load_node_types()
    yield clients
    for c in clients:
        c.stop_server()
    for s in servers:
        s.stop()


def test_parse_helpers():
    assert parse_files("u2e2t:./e.txt,f2e2t:./f.txt") == {
        "u2e2t": ["./e.txt"], "f2e2t": ["./f.txt"]}
    assert reverse_etype("u2e2t") == "t2e2u"
    assert get_all_edge_type({"u2e2t": []}, True) == ["u2e2t", "t2e2u"]


def test_edge_and_node_types(service):
    c = service[0]
    assert c.get_edge_types() == ["u2e2t", "t2e2u"]
    assert sorted(c.get_node_types()) == ["t", "u"]


def test_sample_successor(service):
    c = service[0]
    out = c.sample_successor([37, 96], max_degree=10, edge_type="u2e2t")
    assert sorted(out[0].tolist()) == [45, 112, 145]
    assert sorted(out[1].tolist()) == [48, 111, 247]
    # bounded fan-out
    out = c.sample_successor([59], max_degree=2, edge_type="u2e2t")
    assert len(out[0]) == 2
    assert set(out[0].tolist()) <= {45, 145, 122, 133}


def test_sample_predecessor_via_reverse(service):
    c = service[1]
    out = c.sample_predecessor([133], max_degree=10, edge_type="u2e2t")
    assert sorted(out[0].tolist()) == [7, 59, 98]


def test_random_sample_nodes(service):
    c = service[0]
    out = c.random_sample_nodes(node_type="u", size=4, seed=0)
    assert len(out) >= 1
    assert set(out.tolist()) <= {37, 96, 59, 97, 98, 7}


def test_node_batch_iter_coverage(service):
    c = service[0]
    seen = []
    for batch in c.node_batch_iter(4, node_type="t", shuffle=True,
                                   shuffle_size=8, seed=1):
        seen.extend(batch.tolist())
    assert sorted(seen) == [45, 48, 111, 112, 122, 133, 145, 247, 250]


def test_node_feat(service):
    c = service[0]
    c.set_node_feat("u", "a", [37, 96], [1.5, 2.5])
    vals = c.get_node_feat([37, 96, 59], "u", "a")
    assert vals[0] == 1.5 and vals[1] == 2.5 and vals[2] is None
