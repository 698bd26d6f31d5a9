"""Producer-process batch pipeline over shared memory.

VERDICT r3 task #5: the Loader (data/loader.py) already forks sample
workers, but its producer — collation (`_stack`), worker-result unpickling,
queue traffic — still runs INSIDE the TPU process, where on a single-core
host it competes with the tunnel client's threads: the identical loader
loop measured 143 img/s in a CPU-only process vs 34-83 inside the TPU
process (bench_extra.json fed_train*, BASELINE.md). ``ShmLoader`` moves the
ENTIRE producer into one forked OS process that ships READY batches through
a ring of ``multiprocessing.shared_memory`` slots; the TPU process does a
queue read plus (by default) one memcpy per batch — the rest of its core
stays with the tunnel client.

This replaces the host half of the reference's
``DataLoader(num_workers, prefetch_factor=4, pin_memory=True)``
(/root/reference/modules/base_module.py:51-78): torch's workers ship
samples back over pipes and COLLATE IN THE TRAINING PROCESS; here the
collated batch bytes land in shared memory and never transit a pipe.

Protocol
--------
* fork start method: the child inherits the wrapped ``Loader`` by memory
  copy (no pickling); it never touches jax (same safety argument as the
  Loader's fork workers).
* Static shapes (the Loader pads short batches) make the slot layout fixed;
  the child discovers it from the first batch, creates the segments, and
  publishes names + leaf specs through a small metadata queue.
* Ring flow control: child waits on a free-slot queue; parent returns a
  slot after consuming its batch. ``copy=True`` (default) memcpys the batch
  out and releases the slot immediately — always safe. ``copy=False``
  yields numpy views INTO the slot and releases it when the consumer asks
  for the NEXT batch; the consumer must be done reading (e.g. its
  device_put already serialized the buffer) before advancing — the
  train-loop pattern, where step N's dispatch precedes fetching batch N+1.
* Epoch semantics mirror ``Loader``: each ``__iter__`` runs one epoch in a
  fresh child (fork is ~ms); the parent advances ``loader.epoch`` so
  shuffles stay deterministic and identical to iterating the Loader
  directly (bit-equality is tested in tests/test_shm_loader.py).

Measured effect (bench_extra.json fed_train_shm, BASELINE.md round 4): on
THIS 1-core host the shm path measured 6.8 img/s (11.7 with --device_aug)
vs 27 img/s for the in-process producer — the ring's two extra ~96 MB
copies (child write + parent read) land on the same single core and cost
more than the isolation saves (BASELINE.md's fed close-out: the loop is
98.3% CPU-bound either way). The design's win requires a multi-core host,
where the producer's copy runs on its own core; keep ``--shm_loader`` off
on single-core machines.

Tunnel caveat (``copy=False`` only): the axon backend's async dispatch
completion is unreliable (CLAUDE.md), so "step N dispatched before batch
N+1 is fetched" does NOT guarantee the device has finished READING slot N
when the ring reuses it. With ``copy=False`` on the tunnel backend, call
``jax.block_until_ready`` on the device batch before advancing, or use the
default ``copy=True`` (the Trainer and bench both do).
"""

from __future__ import annotations

import multiprocessing
import os
from multiprocessing import shared_memory

import numpy as np

_END, _ERR, _INIT, _BATCH = "end", "err", "init", "batch"


def _dtype_tag(dt: np.dtype) -> str:
    """Round-trippable dtype encoding. ``dt.str`` is NOT enough: ml_dtypes
    types (bfloat16 targets from raw_cache.set_gt_dtype) stringify as raw
    void ('<V2'), which would silently reinterpret the bytes."""
    return dt.name if dt.kind == "V" else dt.str


def _tag_dtype(tag: str) -> np.dtype:
    try:
        return np.dtype(tag)
    except TypeError:
        import ml_dtypes

        return np.dtype(getattr(ml_dtypes, tag))


def _flatten(batch):
    """Batch pytree (nested tuple/dict of arrays) -> (leaves, spec)."""
    leaves: list[np.ndarray] = []

    def rec(node):
        if isinstance(node, dict):
            keys = sorted(node)
            return ("d", keys, [rec(node[k]) for k in keys])
        if isinstance(node, (tuple, list)):
            return ("t", len(node), [rec(x) for x in node])
        a = np.ascontiguousarray(node)
        leaves.append(a)
        return ("l", len(leaves) - 1, None)

    spec = rec(batch)
    return leaves, spec


def _unflatten(spec, leaves):
    tag, meta, children = spec
    if tag == "d":
        return {k: _unflatten(c, leaves) for k, c in zip(meta, children)}
    if tag == "t":
        return tuple(_unflatten(c, leaves) for c in children)
    return leaves[meta]


def _produce(loader, meta_q, free_q, n_slots):
    """Child body: runs the whole Loader epoch, writes batches into the
    shared-memory ring. Never touches jax; exits via os._exit so the
    parent's TPU client/atexit state is untouched (data/loader.py fork
    rationale)."""
    shms = []
    it = iter(loader)
    try:
        layout = None
        for batch, mask in it:
            leaves, spec = _flatten(batch)
            if layout is None:
                layout = [(l.shape, _dtype_tag(l.dtype)) for l in leaves]
                total = sum(l.nbytes for l in leaves)
                for _ in range(n_slots):
                    shm = shared_memory.SharedMemory(create=True, size=total)
                    # the PARENT owns unlink; keep the child's resource
                    # tracker from reaping the segments at child exit
                    try:
                        from multiprocessing import resource_tracker

                        resource_tracker.unregister(shm._name, "shared_memory")
                    except Exception:
                        pass
                    shms.append(shm)
                meta_q.put((_INIT, [s.name for s in shms], (layout, spec)))
            slot = free_q.get()
            if slot is None:  # parent abandoned the epoch
                return
            buf = shms[slot].buf
            off = 0
            for leaf in leaves:
                np.frombuffer(buf, leaf.dtype, leaf.size, off).reshape(
                    leaf.shape
                )[...] = leaf
                off += leaf.nbytes
            meta_q.put((_BATCH, slot, np.asarray(mask)))
        meta_q.put((_END, None, None))
        # no shutdown rendezvous needed: the segments persist after this
        # process exits (the parent holds them open and owns unlink)
    except BaseException as e:  # propagate into the consumer
        try:
            meta_q.put((_ERR, repr(e), None))
        except Exception:
            pass
    finally:
        # shut the wrapped Loader down cleanly (its generator's finally
        # stops the producer thread / worker pool) BEFORE os._exit, which
        # would otherwise orphan them mid-task on the abandoned-epoch path
        try:
            it.close()
        except Exception:
            pass
        for s in shms:
            try:
                s.close()
            except Exception:
                pass
        os._exit(0)


class ShmLoader:
    """Drop-in iterable around a ``Loader`` with the producer isolated in
    its own OS process (module docstring). Yields (batch, mask) like the
    wrapped loader."""

    def __init__(self, loader, slots: int = 3, copy: bool = True):
        assert slots >= 2, "ring needs >=2 slots to overlap producer/consumer"
        self.loader = loader
        self.slots = slots
        self.copy = copy

    def __len__(self):
        return len(self.loader)

    @property
    def batch_size(self):
        return self.loader.batch_size

    def __iter__(self):
        ctx = multiprocessing.get_context("fork")
        # SimpleQueue: SYNCHRONOUS puts (no feeder thread) — the child ends
        # with os._exit, which would kill a regular Queue's feeder before it
        # flushed the last messages into the pipe (observed: the final batch
        # + END never arrived). Flow control doesn't need Queue's maxsize:
        # the ring itself bounds meta_q depth at `slots`.
        meta_q = ctx.SimpleQueue()
        free_q = ctx.SimpleQueue()
        for i in range(self.slots):  # seed the ring before the child starts
            free_q.put(i)
        epoch = self.loader.epoch
        child = ctx.Process(
            target=_produce, args=(self.loader, meta_q, free_q, self.slots),
            daemon=True, name="shm-loader-producer",
        )
        child.start()  # fork snapshots self.loader at epoch `epoch`
        self.loader.epoch = epoch + 1  # parent-side advance (Loader.__iter__)

        shms: list[shared_memory.SharedMemory] = []
        views_per_slot: list[list[np.ndarray]] = []
        views: list[np.ndarray] | None = None
        outstanding: int | None = None
        try:
            tag, names, info = meta_q.get()
            if tag == _ERR:
                raise RuntimeError(f"shm producer failed: {names}")
            if tag == _END:  # empty dataset
                return
            assert tag == _INIT
            layout, spec = info
            for name in names:
                shm = shared_memory.SharedMemory(name=name)
                shms.append(shm)
                views, off = [], 0
                for shape, dtype_str in layout:
                    dt = _tag_dtype(dtype_str)
                    size = int(np.prod(shape))
                    views.append(
                        np.frombuffer(shm.buf, dt, size, off).reshape(shape)
                    )
                    off += size * dt.itemsize
                views_per_slot.append(views)

            while True:
                tag, a, b = meta_q.get()
                if tag == _END:
                    return
                if tag == _ERR:
                    raise RuntimeError(f"shm producer failed: {a}")
                slot, mask = a, b
                if self.copy:
                    batch = _unflatten(
                        spec, [np.array(v) for v in views_per_slot[slot]]
                    )
                    free_q.put(slot)
                    yield batch, mask
                else:
                    if outstanding is not None:
                        free_q.put(outstanding)  # consumer advanced: done
                    outstanding = slot
                    yield _unflatten(spec, views_per_slot[slot]), mask
        finally:
            try:
                free_q.put(None)  # unblock + shut down the child
            except Exception:
                pass
            child.join(timeout=2)
            if child.is_alive():
                child.terminate()
                child.join(timeout=2)
            # drop our views BEFORE closing: mmap.close() refuses while
            # exported buffer pointers exist (copy=False callers may still
            # hold views — then close fails harmlessly and unlink below
            # still releases the memory at last unmap). `views` is the
            # setup loop's local and still pins the LAST slot's arrays —
            # without dropping it that segment's close() fails even with
            # copy=True and resurfaces as a BufferError in __del__ at GC.
            views = None  # noqa: F841
            views_per_slot.clear()
            for shm in shms:
                try:
                    shm.close()
                except BufferError:
                    # a copy=False consumer still holds views into this
                    # segment. Detach the python-side handles so __del__
                    # doesn't retry the failing close at GC (the unraisable
                    # BufferError Weak #5 flagged); the mapping itself is
                    # released when the last view dies — consumer array ->
                    # exported memoryview -> mmap refchain — and unlink
                    # below already freed the name.
                    shm._buf = None
                    shm._mmap = None
                except Exception:
                    pass
                try:
                    shm.unlink()
                except Exception:
                    pass
            for q in (meta_q, free_q):
                try:
                    q.close()
                except Exception:
                    pass
