"""ShmLoader (producer-process pipeline) equivalence with the in-process
Loader: same batches, same masks, same epoch shuffles, clean teardown.
Parity surface: the host half of the reference DataLoader stack
(/root/reference/modules/base_module.py:51-78); see data/shm_loader.py.
"""

import numpy as np
import pytest

from mono_depth_estimation_tpu.data.loader import Loader
from mono_depth_estimation_tpu.data.shm_loader import ShmLoader


class _ArrayDataset:
    """Tiny deterministic dataset with a transform channel."""

    def __init__(self, n=10, shape=(8, 6, 3)):
        self.n = n
        self.shape = shape

    def __len__(self):
        return self.n

    def get_raw(self, i):
        rng = np.random.default_rng(i)
        return (rng.normal(size=self.shape).astype(np.float32),
                rng.normal(size=self.shape[:2] + (1,)).astype(np.float32))


def _transform(rgb, depth, rng):
    # rng-dependent so determinism-across-processes is actually exercised
    return rgb + rng.normal(), depth * 2.0


def _collect(it):
    out = []
    for batch, mask in it:
        # snapshot at yield time: copy=False views are only valid until the
        # consumer advances (the ShmLoader contract)
        snap = _unmap(batch, np.array)
        out.append((snap, np.asarray(mask)))
    return out


def _unmap(node, f):
    if isinstance(node, dict):
        return {k: _unmap(v, f) for k, v in node.items()}
    if isinstance(node, (tuple, list)):
        return tuple(_unmap(x, f) for x in node)
    return f(node)


def _assert_epochs_equal(a, b):
    assert len(a) == len(b)
    for (ba, ma), (bb, mb) in zip(a, b):
        np.testing.assert_array_equal(ma, mb)
        for la, lb in zip(_leaves(ba), _leaves(bb)):
            np.testing.assert_array_equal(la, lb)


def _leaves(node):
    if isinstance(node, dict):
        return [l for k in sorted(node) for l in _leaves(node[k])]
    if isinstance(node, (tuple, list)):
        return [l for x in node for l in _leaves(x)]
    return [np.asarray(node)]


@pytest.mark.parametrize("copy", [True, False])
def test_shm_loader_bit_equal_two_epochs(copy):
    """Two shuffled epochs through ShmLoader == the same Loader iterated
    directly (bit-equal batches incl. the padded short batch and masks)."""
    mk = lambda: Loader(_ArrayDataset(), batch_size=4, shuffle=True,
                        transform=_transform, num_workers=0,
                        prefetch_batches=0, seed=7)
    direct, shm = mk(), ShmLoader(mk(), slots=2, copy=copy)
    for _ in range(2):  # epoch advance must stay in lockstep
        _assert_epochs_equal(_collect(direct), _collect(shm))


def test_shm_loader_abandoned_epoch_reshuffles():
    """Abandoning an epoch mid-way must still advance the shuffle (the
    Loader's capture-and-advance rule) and leak nothing."""
    mk = lambda: Loader(_ArrayDataset(), batch_size=4, shuffle=True,
                        transform=_transform, num_workers=0,
                        prefetch_batches=0, seed=3)
    direct, shm = mk(), ShmLoader(mk(), slots=2)
    # abandon both after one batch
    for it in (iter(direct), iter(shm)):
        next(it)
        it.close() if hasattr(it, "close") else None
    _assert_epochs_equal(_collect(direct), _collect(shm))


def test_shm_loader_nocopy_views_stable_until_next_fetch():
    """copy=False: the yielded views must keep their contents until the
    consumer advances (slot released only on the next fetch)."""
    loader = Loader(_ArrayDataset(n=8), batch_size=4, shuffle=False,
                    transform=_transform, num_workers=0, prefetch_batches=0)
    want = _collect(loader)
    loader.epoch = 0  # rewind for the shm pass
    got = []
    it = iter(ShmLoader(loader, slots=2, copy=False))
    for (batch, mask), (wbatch, wmask) in zip(it, want):
        for la, lb in zip(_leaves(batch), _leaves(wbatch)):
            np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(np.asarray(mask), wmask)
        got.append(True)
    assert len(got) == len(want)


def test_shm_loader_propagates_producer_error():
    class Boom(_ArrayDataset):
        def get_raw(self, i):
            if i >= 4:
                raise ValueError("boom")
            return super().get_raw(i)

    loader = Loader(Boom(), batch_size=4, shuffle=False,
                    transform=_transform, num_workers=0, prefetch_batches=0)
    with pytest.raises(RuntimeError, match="boom"):
        _collect(ShmLoader(loader, slots=2))
