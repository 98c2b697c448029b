"""Example-script smoke tests: run a fast configuration of each CLI in a
subprocess so the runnable surface can't rot. (CPU-forced; tiny settings.)"""

import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_example(rel, *args, timeout=240):
    env = dict(os.environ, PGL_TPU_PLATFORM="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(ROOT, "examples", rel), *args],
        capture_output=True, text=True, timeout=timeout, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return proc.stdout


def test_citation_gcn():
    out = run_example("citation_benchmark/train.py", "--model", "GCN",
                      "--epochs", "30")
    assert "test acc" in out


def test_deploy_roundtrip():
    out = run_example("deploy/export_and_serve.py", "--epochs", "30")
    assert "served: acc" in out
    assert "e-0" in out or "e-1" in out  # tiny served-vs-direct error


def test_gin_graph_classification():
    out = run_example("gin/train.py", "--epochs", "3", "--num-graphs",
                      "128")
    assert "test acc" in out


def test_link_prediction():
    out = run_example("link_prediction/train.py", "--epochs", "40")
    assert "AUC" in out


def test_sag_pool_example():
    out = run_example("sag_pool/train.py", "--epochs", "3", "--num-graphs",
                      "64")
    assert "test acc" in out


def test_lightgcn_example():
    out = run_example("lightgcn/train.py", "--epochs", "20")
    assert "recall@20" in out


def test_node2vec_example():
    out = run_example("node2vec/train.py", "--epochs", "1",
                      "--steps-per-epoch", "80")
    assert "probe acc" in out


def test_clustering_example():
    out = run_example("clustering/train.py", "--steps", "150")
    assert "NMI" in out


def test_r_unimp_example():
    out = run_example("r_unimp/train.py", "--epochs", "2",
                      "--batch-size", "96")
    assert "val acc" in out


def test_ngcf_example():
    out = run_example("ngcf/train.py", "--epochs", "30")
    assert "recall@20" in out


def test_global_pool_example():
    out = run_example("global_pool/train.py", "--pool_type", "sum",
                      "--epochs", "3", "--num-graphs", "64")
    assert "test acc" in out


def test_graphsage_device_sampler():
    out = run_example("graphsage/train.py", "--device-sampler",
                      "--epochs", "4", "--samples", "10", "10")
    assert "device-sampled" in out and "test acc" in out


def test_citation_multi_chip():
    env = dict(os.environ, PGL_TPU_PLATFORM="cpu",
               XLA_FLAGS="--xla_force_host_platform_device_count=8")
    proc = subprocess.run(
        [sys.executable,
         os.path.join(ROOT, "examples/citation_benchmark/"
                            "multi_chip_train.py"),
         "--epochs", "60"],
        capture_output=True, text=True, timeout=300, env=env)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert "halo-sharded GCN" in proc.stdout
    acc = float(proc.stdout.rsplit("test acc ", 1)[1].split()[0])
    assert acc > 0.7, proc.stdout
