"""Fixed-shape batching + threaded prefetch.

Replaces the reference's PyTorch DataLoader + ``collate_fn``
(``training.py:28-32``, ``tasks.py:138-158``).  Key differences, all driven
by XLA's static-shape requirement:

* every batch is padded to the SAME width ``seq_len = max_seq_len + 2``
  (the reference pads to the per-batch max caption length + 2,
  ``tasks.py:143-147``, which would trigger a recompile per unique length);
* captions are wrapped ``<S> tokens… <E>`` then padded with ``<PAD>``
  (``tasks.py:155``), tokens truncated at ``max_seq_len``;
* the final partial batch is padded with zero-weighted rows (``weights``)
  instead of shrinking, so eval statistics match the reference exactly while
  shapes stay static;
* worker THREADS (not processes — decode is PIL/numpy, which releases the
  GIL) prefetch batches ahead of the device step.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, Optional

import numpy as np

from gan_image_captioning_tpu.data.vocab import END, PAD, START

# One lock per dataset object guarding its shared precollation cache.
# Stored ON the dataset (like _gic_precollated) so its lifetime tracks the
# dataset's — an id()-keyed registry would leak entries and could hand a
# stale lock to a new object reusing a GC'd id.  The guard only serializes
# lock creation so two Batchers can't mint two locks for one dataset.
_PRE_LOCK_GUARD = threading.Lock()


def _dataset_precollate_lock(dataset) -> threading.Lock:
    with _PRE_LOCK_GUARD:
        lock = getattr(dataset, "_gic_precollate_lock", None)
        if lock is None:
            lock = threading.Lock()
            try:
                dataset._gic_precollate_lock = lock
            except AttributeError:
                pass  # __slots__ dataset: per-call lock; cache is also
                #       per-Batcher there (see _gic_precollated handling)
        return lock


def make_batch(captions_list, images_list, seq_len: int,
               batch_size: Optional[int] = None):
    """Assemble one fixed-shape batch dict from per-sample arrays.

    Args:
      captions_list: list of 1-D int arrays (token ids, no specials).
      images_list: list of [3, S, S] float32 arrays, or None (unconditional).
      seq_len: fixed output width (max_seq_len + 2).
      batch_size: pad the batch to this many rows with zero-weighted
        duplicates of row 0 (None = len(captions_list)).
    """
    n = len(captions_list)
    batch_size = batch_size or n
    captions = np.full((batch_size, seq_len), PAD, dtype=np.int32)
    lengths = np.zeros((batch_size,), np.int32)
    weights = np.zeros((batch_size,), np.float32)
    for i, toks in enumerate(captions_list):
        toks = np.asarray(toks, np.int32)[: seq_len - 2]
        captions[i, 0] = START
        captions[i, 1: 1 + len(toks)] = toks
        captions[i, 1 + len(toks)] = END
        lengths[i] = len(toks) + 2  # tasks.py:156
        weights[i] = 1.0
    batch = {"captions": captions, "lengths": lengths, "weights": weights}
    if images_list is not None and images_list[0] is not None:
        img_shape = images_list[0].shape
        dtype = np.asarray(images_list[0]).dtype
        images = np.zeros((batch_size,) + img_shape, dtype)
        for i, im in enumerate(images_list):
            images[i] = im
        if len(img_shape) == 1:
            # [512] cached frozen-backbone features (SURVEY §7.4)
            batch["backbone_feats"] = images
        elif dtype == np.uint8:
            # uint8 images defer normalization to the device
            # (kernels/image_norm.py)
            batch["images_u8"] = images
        else:
            batch["images"] = images  # pre-normalized float CHW
    return batch


def device_prefetch(iterable, put, size: int = 2):
    """Overlap host→device batch uploads with device compute.

    A single daemon thread pulls host batches from ``iterable``, copies
    each to the device with ``put`` (``jax.device_put`` or a sharded
    variant) and parks up to ``size`` device-resident batches in a
    bounded queue; the consumer then dispatches compute on batch N while
    batch N+1's transfer is in flight.  This is the double-buffered
    input-pipeline stage every TPU feed needs — the reference has no
    equivalent (its DataLoader hands host tensors to a blocking
    ``.to(device)`` per batch, ``training.py:59,139``) and on a
    remote/tunneled chip the per-batch upload RTT otherwise serializes
    with the step (NEXT_STEPS r3 item 5).

    ``size <= 0`` degrades to inline (synchronous) puts.
    """
    if size <= 0:
        for host_batch in iterable:
            yield put(host_batch)
        return

    out: queue.Queue = queue.Queue(maxsize=size)
    stop = threading.Event()
    _END = object()
    failure = []

    def producer():
        try:
            for host_batch in iterable:
                dev_batch = put(host_batch)
                while not stop.is_set():
                    try:
                        out.put(dev_batch, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except BaseException as exc:  # surfaced on the consumer side
            failure.append(exc)
        finally:
            while not stop.is_set():
                try:
                    out.put(_END, timeout=0.1)
                    break
                except queue.Full:
                    continue

    thread = threading.Thread(target=producer, daemon=True,
                              name="device-prefetch")
    thread.start()
    try:
        while True:
            item = out.get()
            if item is _END:
                if failure:
                    raise failure[0]
                return
            yield item
    finally:
        stop.set()


def stack_batches(iterable, k: int):
    """Group ``k`` consecutive host batches into one stacked batch for
    ``--steps-per-call`` (train/steps.py:make_multi_step): every array gains
    a leading step axis ``[k, ...]``; one host→device upload then feeds k
    scanned train steps.  Yields ``(stacked_batch, count)``; the epoch's tail
    group may have ``count < k`` (it compiles its own, smaller program once).

    Length-bucketed loaders emit batches of DIFFERENT widths; a group flushes
    early when the next batch's shapes don't match (stacking needs one shape,
    and each distinct [k, ...] shape is its own compiled program anyway).
    """
    buf = []

    def flush():
        stacked = {key: np.stack([b[key] for b in buf])
                   for key in buf[0]}
        return stacked, len(buf)

    def matches(batch):
        first = buf[0]
        return (batch.keys() == first.keys()
                and all(np.shape(batch[key]) == np.shape(first[key])
                        for key in first))

    for batch in iterable:
        if buf and not matches(batch):
            yield flush()
            buf = []
        buf.append(batch)
        if len(buf) == k:
            yield flush()
            buf = []
    if buf:
        yield flush()


class Batcher:
    """Iterable over fixed-shape batches with threaded prefetch.

    ``dataset`` must expose ``__len__`` and ``sample(i) -> (token_ids,
    image_or_None)``.
    """

    def __init__(self, dataset, batch_size: int, seq_len: int,
                 shuffle: bool = False, seed: int = 0, drop_last: bool = False,
                 pad_final: bool = True, num_workers: int = 2,
                 prefetch: int = 4, bucket_bounds=None, host_shard=None,
                 precollate="auto"):
        self.dataset = dataset
        self.batch_size = batch_size
        # host_shard=(process_index, process_count): each host iterates a
        # disjoint stride of the (shuffled) index space, feeding its local
        # slice of the global data-parallel batch (SURVEY §2.3 DP row:
        # "per-host data loading feeding local shards").  All hosts share
        # the seed, so the global epoch order is consistent.
        self.host_shard = host_shard
        self.seq_len = seq_len
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.pad_final = pad_final
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.epoch = 0
        # Length buckets: upper bounds on PADDED width (tokens + <S>/<E>).
        # Each batch draws from one bucket and pads to that bucket's bound —
        # short captions stop paying full-width decode compute (one compiled
        # program per distinct width).
        self.bucket_bounds = sorted(bucket_bounds) if bucket_bounds else None
        self._lengths = None
        # Precollate: pay the per-item Python work (dataset.sample +
        # collation) ONCE, then every epoch's batch is a numpy row-gather.
        # Safe for every dataset here — host `sample(i)` is deterministic
        # (augmentation runs on device inside the step, ops/augment.py) — but
        # gated by an image-bytes budget so raw-image COCO at full scale
        # doesn't get pinned in host RAM.  "auto" = on iff within budget;
        # True/False force.  The per-batch gather is microseconds, so the
        # worker pool (whose pure-Python collation contends on the GIL with
        # the dispatch thread — the measured in-run cost was ~3 ms/batch)
        # is skipped entirely on this path.
        self.precollate = precollate
        self._pre = None
        self._pre_resolved = False

    def __len__(self):
        n = len(self.dataset)
        if self.host_shard is not None:
            idx, count = self.host_shard
            n = len(range(idx, n, count))
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _caption_lengths(self):
        if self._lengths is None:
            get = getattr(self.dataset, "caption_length", None)
            if get is None:
                get = lambda i: len(self.dataset.sample(i)[0])  # noqa: E731
            self._lengths = np.asarray(
                [get(i) for i in range(len(self.dataset))])
        return self._lengths

    def _host_slice(self, order):
        if self.host_shard is None:
            return order
        idx, count = self.host_shard
        return order[idx::count]

    def _index_batches(self):
        """Yields ``(indices, width)`` per batch."""
        n = len(self.dataset)
        rng = np.random.default_rng(self.seed + self.epoch)
        if not self.bucket_bounds:
            order = np.arange(n)
            if self.shuffle:
                rng.shuffle(order)
            order = self._host_slice(order)
            n = len(order)
            for start in range(0, n, self.batch_size):
                idx = order[start: start + self.batch_size]
                if len(idx) < self.batch_size and self.drop_last:
                    return
                yield idx, self.seq_len
            return

        lengths = self._caption_lengths() + 2  # wrapped width
        bounds = list(self.bucket_bounds)
        if bounds[-1] < self.seq_len:
            bounds.append(self.seq_len)
        # bucket index per item; over-long captions clip to the top bucket
        # (they get truncated there, same as the unbucketed path)
        assignment = np.minimum(np.searchsorted(bounds, lengths),
                                len(bounds) - 1)
        batches = []
        for b, bound in enumerate(bounds):
            members = np.nonzero(assignment == b)[0]
            if self.shuffle:
                rng.shuffle(members)
            members = self._host_slice(members)
            for start in range(0, len(members), self.batch_size):
                idx = members[start: start + self.batch_size]
                if len(idx) < self.batch_size and self.drop_last:
                    break
                batches.append((idx, bound))
        if self.shuffle:
            rng.shuffle(batches)
        yield from batches

    def _pre_width(self) -> int:
        # collation width for the cache: wide enough for every bucket
        w = self.seq_len
        if self.bucket_bounds:
            w = max(w, self.bucket_bounds[-1])
        return w

    def _ensure_precollated(self):
        """Resolve the precollate gate and (if on) build the dataset-wide
        collated arrays once.  Called from the consumer thread in
        ``iter_from`` BEFORE any workers exist.  A dataset-level lock guards
        the shared cache so two Batchers over the same dataset (pretrain/adv,
        different widths, or concurrent threads) never race or rebuild an
        existing width's collation.

        Multi-host note (``host_shard``): the shuffle is applied BEFORE the
        host stride, so the set of rows a host touches changes every epoch —
        each host therefore pins the FULL collated dataset, multiplying host
        RAM by process_count.  The auto budget still applies per host; size
        ``GIC_PRECOLLATE_BUDGET`` accordingly on multi-host runs."""
        if self._pre_resolved:
            return
        self._pre_resolved = True
        mode = self.precollate
        if mode in (False, "off", "0"):
            return
        n = len(self.dataset)
        if n == 0:
            return
        width = self._pre_width()
        lock = _dataset_precollate_lock(self.dataset)
        with lock:
            cache = getattr(self.dataset, "_gic_precollated", None)
            if isinstance(cache, dict) and width in cache:
                self._pre = cache[width]
                return
            budget = int(os.environ.get("GIC_PRECOLLATE_BUDGET", 1 << 30))
            tok0, img0 = self.dataset.sample(0)
            # budget estimate covers BOTH arrays: captions (int32 rows at
            # collation width + lengths/weights/index sidecars) and, when
            # conditional, the per-item image/feature bytes (sample(0)
            # assumed representative)
            est = n * (width * 4 + 12)
            if img0 is not None:
                est += np.asarray(img0).nbytes * n
            if mode == "auto" and est > budget:
                return
            caps = [None] * n
            imgs = [None] * n
            caps[0], imgs[0] = tok0, img0
            # fan the one-time decode across the worker-thread count —
            # dataset.sample is already called concurrently by the normal
            # worker pool, so thread safety is an existing contract
            nw = min(self.num_workers, n - 1)
            if nw > 1:
                def _fill(i):
                    caps[i], imgs[i] = self.dataset.sample(i)
                with ThreadPoolExecutor(nw) as ex:
                    for _ in ex.map(_fill, range(1, n)):
                        pass
            else:
                for i in range(1, n):
                    caps[i], imgs[i] = self.dataset.sample(i)
            if imgs[0] is None:
                imgs = None
            self._pre = make_batch(caps, imgs, width, None)
            try:
                if not isinstance(cache, dict):
                    cache = {}
                    self.dataset._gic_precollated = cache
                cache[width] = self._pre
            except AttributeError:
                pass  # datasets with __slots__ just skip sharing

    def _gather(self, item):
        """Precollated fast path: one fancy-index per array, identical
        output to ``_build`` (same PAD/zero-weighted tail rows)."""
        idx, width = item
        pre = self._pre
        n = len(idx)
        bs = self.batch_size if self.pad_final else n
        captions = np.full((bs, width), PAD, np.int32)
        captions[:n] = pre["captions"][idx, :width]
        lengths = np.zeros((bs,), np.int32)
        lengths[:n] = pre["lengths"][idx]
        weights = np.zeros((bs,), np.float32)
        weights[:n] = pre["weights"][idx]
        batch = {"captions": captions, "lengths": lengths, "weights": weights}
        for key in ("backbone_feats", "images_u8", "images"):
            if key in pre:
                src = pre[key]
                out = np.zeros((bs,) + src.shape[1:], src.dtype)
                out[:n] = src[idx]
                batch[key] = out
        index = np.full((bs,), int(idx[0]), np.int32)
        index[:n] = idx
        batch["index"] = index
        return batch

    def _build(self, item):
        if self._pre is not None:
            return self._gather(item)
        idx, width = item
        samples = [self.dataset.sample(int(i)) for i in idx]
        caps = [s[0] for s in samples]
        imgs = [s[1] for s in samples]
        pad_to = self.batch_size if self.pad_final else None
        if imgs[0] is None:
            imgs = None
        batch = make_batch(caps, imgs, width, pad_to)
        # dataset row per batch row (pad rows repeat row 0, weights mark
        # them) — lets consumers look up per-row metadata (e.g. SCST's
        # multi-reference reward groups rows by image)
        index = np.full((batch["captions"].shape[0],), int(idx[0]), np.int32)
        index[: len(idx)] = idx
        batch["index"] = index
        return batch

    def __iter__(self) -> Iterator[dict]:
        return self.iter_from(0)

    def iter_from(self, start_batch: int) -> Iterator[dict]:
        """Iterate this epoch's batches starting at batch ``start_batch``.

        The epoch's index order is built in full (same seeded shuffle as a
        plain iteration — ``seed + epoch``), then the first ``start_batch``
        batches are dropped WITHOUT being built, so a mid-epoch resume
        (train/schedule.py) replays the identical remainder of the epoch at
        no skipped-batch decode cost.  ``iter_from(0)`` is ``__iter__``.
        """
        batches = list(self._index_batches())[start_batch:]
        self.epoch += 1
        self._ensure_precollated()
        nw = min(self.num_workers, max(len(batches), 1))
        if nw <= 1 or self._pre is not None:
            for idx in batches:
                yield self._build(idx)
            return

        # Thread pool: nw workers claim batch indices and build them
        # concurrently (PIL/libjpeg/numpy release the GIL, so image decode
        # genuinely parallelizes); the consumer emits IN ORDER from a
        # bounded reorder buffer.  One producer thread starves a
        # ~100 steps/s device on conditional data — VERDICT r2 weakness 4.
        cond = threading.Condition()
        results: dict = {}
        state = {"next_task": 0, "stop": False, "error": None}
        total = len(batches)
        high_water = self.prefetch + nw

        def worker():
            while True:
                with cond:
                    while (not state["stop"] and state["error"] is None
                           and state["next_task"] < total
                           and len(results) >= high_water):
                        cond.wait()
                    if (state["stop"] or state["error"] is not None
                            or state["next_task"] >= total):
                        return
                    i = state["next_task"]
                    state["next_task"] += 1
                try:
                    built = self._build(batches[i])
                except BaseException as exc:   # surface worker failures in
                    with cond:                 # the consumer instead of
                        state["error"] = exc   # truncating the epoch
                        cond.notify_all()
                    return
                with cond:
                    results[i] = built
                    cond.notify_all()

        threads = [threading.Thread(target=worker, daemon=True)
                   for _ in range(nw)]
        for t in threads:
            t.start()
        try:
            for i in range(total):
                with cond:
                    while i not in results and state["error"] is None:
                        cond.wait()
                    if state["error"] is not None:
                        raise state["error"]
                    item = results.pop(i)
                    cond.notify_all()
                yield item
        finally:
            with cond:
                state["stop"] = True
                cond.notify_all()
