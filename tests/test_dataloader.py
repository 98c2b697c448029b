"""Dataloader tests across dataset kinds × worker counts × shuffle modes
(mirroring reference ``tests/test_dataloader.py``)."""

import numpy as np
import pytest

from pgl_tpu.utils.data import (Dataset, StreamDataset, Dataloader, Sampler,
                                WorkerInfo)


class ToyDataset(Dataset):
    def __init__(self, n=20):
        self.data = list(range(n))

    def __getitem__(self, idx):
        return self.data[idx]

    def __len__(self):
        return len(self.data)


class ToyStream(StreamDataset):
    def __init__(self, n=20):
        self.n = n

    def __iter__(self):
        yield from self._shard_iter(range(self.n))


@pytest.mark.parametrize("num_workers", [0, 2])
@pytest.mark.parametrize("shuffle", [False, True])
def test_map_dataloader(num_workers, shuffle):
    loader = Dataloader(ToyDataset(20), batch_size=3, shuffle=shuffle,
                        num_workers=num_workers, seed=0)
    batches = list(loader)
    flat = sorted(x for b in batches for x in b)
    assert flat == list(range(20))
    assert len(loader) == 7


@pytest.mark.parametrize("num_workers", [0, 3])
def test_stream_dataloader(num_workers):
    loader = Dataloader(ToyStream(21), batch_size=4,
                        num_workers=num_workers)
    flat = sorted(x for b in loader for x in b)
    assert flat == list(range(21))


def test_drop_last():
    loader = Dataloader(ToyDataset(10), batch_size=3, drop_last=True)
    batches = list(loader)
    assert all(len(b) == 3 for b in batches)
    assert len(batches) == 3


def test_collate_fn():
    loader = Dataloader(ToyDataset(6), batch_size=2,
                        collate_fn=lambda xs: np.asarray(xs) * 10)
    batches = list(loader)
    np.testing.assert_array_equal(batches[0], [0, 10])


def test_worker_error_propagates():
    class Bad(Dataset):
        def __getitem__(self, idx):
            raise ValueError("boom")

        def __len__(self):
            return 4

    with pytest.raises(RuntimeError, match="boom"):
        list(Dataloader(Bad(), batch_size=2, num_workers=2))


def test_numpy_payloads_cross_process():
    class NpStream(StreamDataset):
        def __iter__(self):
            for i in self._shard_iter(range(8)):
                yield {"x": np.full((3, 2), i), "i": i}

    loader = Dataloader(NpStream(), batch_size=2, num_workers=2)
    items = sorted((b[0]["i"] for b in loader))
    assert len(items) == 4
