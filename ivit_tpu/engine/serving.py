"""Serving loop: continuous batching over the integer engine.

Replaces the reference's deployment harnesses (``scripts/inference.py``
latency loop + ``TVM_benchmark/evaluate_latency.py``) with a production
shape: a request queue, a batcher thread that assembles fixed-size device
batches (padding the tail), double-buffered host->device feed via JAX's
async dispatch, per-request latency accounting, and data-parallel scale-out
over a ``jax.sharding.Mesh`` (batch sharded on the data axis, engine params
replicated — SURVEY §5.8's TPU-native design; nothing to port, the
reference's distributed helpers are vestigial).
"""

from __future__ import annotations

import queue as queue_mod
import threading
import time
from concurrent.futures import Future
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import batch_sharding, make_mesh, replicated
from .freeze import EngineSpec
from .vit_int import engine_forward as _vit_forward


def _forward_for(spec):
    """Engine forward matching the spec type (ViT or Swin)."""
    from .swin_int import SwinEngineSpec, swin_engine_forward
    if isinstance(spec, SwinEngineSpec):
        return swin_engine_forward
    return _vit_forward


class ServingMetrics:
    def __init__(self):
        self.lock = threading.Lock()
        self.latencies_ms: list = []
        self.batches = 0
        self.images = 0
        self.rejected = 0
        self.shed_count = 0
        self.started = time.perf_counter()

    def reject(self):
        with self.lock:
            self.rejected += 1

    def shed(self):
        with self.lock:
            self.shed_count += 1

    def record(self, batch_size: int, latencies_ms: Sequence[float]):
        with self.lock:
            self.batches += 1
            self.images += batch_size
            self.latencies_ms.extend(latencies_ms)
            if len(self.latencies_ms) > 100000:
                self.latencies_ms = self.latencies_ms[-50000:]

    def summary(self) -> dict:
        with self.lock:
            lat = np.asarray(self.latencies_ms) if self.latencies_ms else \
                np.zeros(1)
            elapsed = time.perf_counter() - self.started
            return {
                "images": self.images,
                "batches": self.batches,
                "images_per_sec": self.images / max(elapsed, 1e-9),
                "latency_ms_p50": float(np.percentile(lat, 50)),
                "latency_ms_p95": float(np.percentile(lat, 95)),
                "latency_ms_max": float(lat.max()),
                "rejected": self.rejected,
                "shed": self.shed_count,
            }


class QueueFull(RuntimeError):
    """Admission control: the serving queue is at ``max_queue``."""


class DeadlineExceeded(RuntimeError):
    """The request waited longer than ``deadline_ms`` before batching."""


class ServingEngine:
    """Continuous-batching server over a frozen integer engine.

    ``submit(image) -> Future[logits]``; a batcher thread collects requests
    into ``batch_size`` device batches (padding the tail after
    ``max_wait_ms``), keeps up to ``inflight`` batches dispatched (JAX async
    dispatch overlaps host batching, transfer, and device compute), and
    resolves futures as device results land.

    ``mesh``: optional Mesh for data-parallel multi-device serving; the
    batch is sharded over the data axis, parameters replicated.
    """

    def __init__(self, spec: EngineSpec, batch_size: int = 64,
                 max_wait_ms: float = 5.0, inflight: int = 2,
                 mesh=None, devices=None, pallas: Optional[bool] = None,
                 max_queue: Optional[int] = None,
                 deadline_ms: Optional[float] = None):
        self.spec = spec
        self.batch_size = batch_size
        self.max_wait_ms = max_wait_ms
        self.inflight = max(1, inflight)
        # Tail-latency contract (VERDICT r4 item 8; the reference's
        # evaluate_latency.py treats latency as a contract via
        # min_repeat_ms, this is the serving-side analog):
        # * ``max_queue`` bounds admission — at offered load beyond device
        #   capacity an unbounded queue grows without limit and p95 is
        #   queue depth, not the model (SERVING_TPU r4: p95 6.17s at
        #   batch-64 load).  Over-limit submits fail fast with
        #   ``QueueFull`` so the client can shed/retry.
        # * ``deadline_ms`` sheds requests older than the deadline at
        #   batch-assembly time (``DeadlineExceeded``) instead of spending
        #   device time on answers nobody is waiting for.
        self.max_queue = max_queue
        self.deadline_ms = deadline_ms
        self.metrics = ServingMetrics()
        self._queue: queue_mod.Queue = queue_mod.Queue()
        self._stop = threading.Event()

        if mesh is None and devices is not None:
            mesh = make_mesh(dp=len(devices), tp=1, devices=devices)
        self.mesh = mesh
        if mesh is not None:
            self._batch_sharding = batch_sharding(mesh)
            params = jax.device_put(spec.params, replicated(mesh))
            self._params = params
            fwd_fn = _forward_for(spec)
            spec_cls = type(spec)
            self._fwd = jax.jit(
                lambda p, x: fwd_fn(
                    spec_cls(spec.config, p), x, pallas=pallas),
                in_shardings=(replicated(mesh), self._batch_sharding),
                out_shardings=self._batch_sharding)
        else:
            self._batch_sharding = None
            self._params = spec.params
            fwd_fn = _forward_for(spec)
            spec_cls = type(spec)
            self._fwd = jax.jit(lambda p, x: fwd_fn(
                spec_cls(spec.config, p), x, pallas=pallas))

        img = spec.config.img_size
        self._img_shape = (img, img, 3)
        self._batcher = threading.Thread(target=self._run, daemon=True)
        self._batcher.start()

    # -- client API ---------------------------------------------------------

    def submit(self, image: np.ndarray) -> Future:
        """Enqueue one [H, W, 3] float32 image; resolves to logits [C].

        Raises :class:`QueueFull` when admission control is on and the
        queue is at ``max_queue`` (fail fast beats queueing into a
        latency number nobody can meet).
        """
        if self._stop.is_set():
            raise RuntimeError("ServingEngine closed")
        if image.shape != self._img_shape:
            raise ValueError(f"expected {self._img_shape}, got {image.shape}")
        if self.max_queue is not None and self._queue.qsize() >= self.max_queue:
            self.metrics.reject()
            raise QueueFull(f"serving queue at max_queue={self.max_queue}")
        fut: Future = Future()
        self._queue.put((image, fut, time.perf_counter()))
        return fut

    def infer(self, images: np.ndarray) -> np.ndarray:
        """Synchronous batch API."""
        futs = [self.submit(im) for im in images]
        return np.stack([f.result() for f in futs])

    def close(self):
        """Stop the batcher; no future is left unresolved.

        In-flight batches are drained by the batcher loop itself; anything
        still sitting unbatched in the queue (and anything submitted after
        shutdown) is cancelled so blocked ``Future.result()`` calls raise
        instead of hanging forever.
        """
        self._stop.set()
        self._batcher.join(timeout=5)
        self._drain_queue(RuntimeError("ServingEngine closed"))

    def _drain_queue(self, exc: BaseException):
        while True:
            try:
                _, fut, _ = self._queue.get_nowait()
            except queue_mod.Empty:
                return
            if not fut.cancel():
                fut.set_exception(exc)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    # -- batcher ------------------------------------------------------------

    def _admit(self, item) -> bool:
        """Deadline check at batch-assembly time; sheds stale requests."""
        if self.deadline_ms is None:
            return True
        _, fut, t0 = item
        if (time.perf_counter() - t0) * 1e3 <= self.deadline_ms:
            return True
        self.metrics.shed()
        if not fut.cancel():
            fut.set_exception(DeadlineExceeded(
                f"request older than deadline_ms={self.deadline_ms}"))
        return False

    def _collect(self):
        """Block for the first request, then fill up to batch_size or
        max_wait_ms; requests past ``deadline_ms`` are shed, not batched."""
        items: list = []
        while not items:
            try:
                first = self._queue.get(timeout=0.1)
            except queue_mod.Empty:
                return None
            if self._admit(first):
                items.append(first)
        deadline = time.perf_counter() + self.max_wait_ms / 1e3
        while len(items) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                item = self._queue.get(timeout=remaining)
            except queue_mod.Empty:
                break
            if self._admit(item):
                items.append(item)
        return items

    def _run(self):
        pending: list = []
        try:
            while not self._stop.is_set():
                items = self._collect()
                if items is None:
                    while pending:
                        self._resolve(*pending.pop(0))
                    continue
                try:
                    n = len(items)
                    batch = np.zeros((self.batch_size,) + self._img_shape,
                                     np.float32)
                    for i, (im, _, _) in enumerate(items):
                        batch[i] = im
                    x = jnp.asarray(batch)
                    if self._batch_sharding is not None:
                        x = jax.device_put(x, self._batch_sharding)
                    out = self._fwd(self._params, x)   # async dispatch
                except BaseException as exc:
                    for _, fut, _ in items:        # fail this batch, keep serving
                        fut.set_exception(exc)
                    continue
                pending.append((out, items, n))
                while len(pending) >= self.inflight:
                    self._resolve(*pending.pop(0))
            while pending:
                self._resolve(*pending.pop(0))
        except BaseException as exc:
            # batcher died: propagate to every stranded future, in-flight
            # and queued, so no client blocks forever
            for _, items, _ in pending:
                for _, fut, _ in items:
                    if not fut.done():
                        fut.set_exception(exc)
            self._drain_queue(exc)
            raise

    def _resolve(self, out, items, n):
        logits = np.asarray(out)               # blocks until device done
        done = time.perf_counter()
        lats = [(done - t0) * 1e3 for (_, _, t0) in items]
        for i, (_, fut, _) in enumerate(items):
            fut.set_result(logits[i])
        self.metrics.record(n, lats)
