"""Serving loop tests: continuous batching correctness + multi-device mesh."""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "tests")


def build_engine(rng):
    from test_engine import build_calibrated

    from ivit_tpu.engine import freeze_model

    model, variables = build_calibrated(rng)
    return freeze_model(model, variables)


def test_serving_matches_direct(rng):
    from ivit_tpu.engine.serving import ServingEngine
    from ivit_tpu.engine.vit_int import engine_forward
    import jax.numpy as jnp

    spec = build_engine(rng)
    images = rng.normal(size=(10, 64, 64, 3)).astype(np.float32)
    want = np.asarray(engine_forward(spec, jnp.asarray(images), pallas=False))
    with ServingEngine(spec, batch_size=4, max_wait_ms=20,
                       pallas=False) as srv:
        got = srv.infer(images)
        m = srv.metrics.summary()
    np.testing.assert_allclose(got, want, atol=1e-5)
    assert m["images"] == 10
    assert m["batches"] >= 3        # 10 requests / batch 4 -> >= 3 batches
    assert m["latency_ms_p50"] > 0


def test_serving_single_request_padding(rng):
    from ivit_tpu.engine.serving import ServingEngine

    spec = build_engine(rng)
    with ServingEngine(spec, batch_size=8, max_wait_ms=1,
                       pallas=False) as srv:
        img = rng.normal(size=(64, 64, 3)).astype(np.float32)
        out = srv.submit(img).result(timeout=120)
    assert out.shape == (10,)
    assert np.isfinite(out).all()


def test_serving_rejects_bad_shape(rng):
    from ivit_tpu.engine.serving import ServingEngine

    spec = build_engine(rng)
    with ServingEngine(spec, batch_size=2, pallas=False) as srv:
        with pytest.raises(ValueError):
            srv.submit(np.zeros((32, 32, 3), np.float32))


def test_serving_close_resolves_stranded_futures(rng):
    """Shutdown must not strand clients: queued-but-unbatched requests are
    cancelled/failed, and submits after close raise immediately."""
    from ivit_tpu.engine.serving import ServingEngine

    spec = build_engine(rng)
    srv = ServingEngine(spec, batch_size=4, max_wait_ms=1, pallas=False)
    # stop the batcher first so freshly queued requests can never be batched
    srv._stop.set()
    srv._batcher.join(timeout=30)
    futs = []
    for _ in range(3):
        fut_img = rng.normal(size=(64, 64, 3)).astype(np.float32)
        fut = __import__("concurrent.futures", fromlist=["Future"]).Future()
        srv._queue.put((fut_img, fut, 0.0))
        futs.append(fut)
    srv.close()
    for fut in futs:
        assert fut.done()
        if not fut.cancelled():
            with pytest.raises(RuntimeError):
                fut.result(timeout=0)
    with pytest.raises(RuntimeError):
        srv.submit(rng.normal(size=(64, 64, 3)).astype(np.float32))


def test_serving_batcher_exception_fails_batch(rng):
    """A failing forward propagates to that batch's futures; the server
    keeps serving subsequent requests."""
    from ivit_tpu.engine.serving import ServingEngine

    spec = build_engine(rng)
    with ServingEngine(spec, batch_size=2, max_wait_ms=1,
                       pallas=False) as srv:
        good_fwd = srv._fwd

        def bad_fwd(p, x):
            raise RuntimeError("injected device failure")

        srv._fwd = bad_fwd
        img = rng.normal(size=(64, 64, 3)).astype(np.float32)
        fut = srv.submit(img)
        with pytest.raises(RuntimeError, match="injected"):
            fut.result(timeout=120)
        srv._fwd = good_fwd
        out = srv.submit(img).result(timeout=120)
        assert np.isfinite(out).all()


def test_serving_multidevice_mesh(rng):
    """Data-parallel serving over the 8-device CPU mesh."""
    from ivit_tpu.engine.serving import ServingEngine
    from ivit_tpu.engine.vit_int import engine_forward
    from ivit_tpu.parallel import make_mesh
    import jax.numpy as jnp

    assert len(jax.devices()) == 8, jax.devices()
    mesh = make_mesh(dp=8, tp=1)
    spec = build_engine(rng)
    images = rng.normal(size=(16, 64, 64, 3)).astype(np.float32)
    want = np.asarray(engine_forward(spec, jnp.asarray(images), pallas=False))
    with ServingEngine(spec, batch_size=16, max_wait_ms=50, mesh=mesh,
                       pallas=False) as srv:
        got = srv.infer(images)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_serving_swin_engine(rng):
    """ServingEngine dispatches by spec type: Swin specs serve through
    swin_engine_forward (BASELINE matrix: Swin-S serving)."""
    import jax.numpy as jnp
    from test_swin_engine import build_swin

    from ivit_tpu.engine.serving import ServingEngine
    from ivit_tpu.engine.swin_int import (freeze_swin_model,
                                          swin_engine_forward)

    model, variables = build_swin(rng)
    spec = freeze_swin_model(model, variables)
    images = rng.normal(size=(5, 56, 56, 3)).astype(np.float32)
    want = np.asarray(swin_engine_forward(spec, jnp.asarray(images),
                                          pallas=False))
    with ServingEngine(spec, batch_size=4, max_wait_ms=20,
                       pallas=False) as srv:
        got = srv.infer(images)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_serving_admission_control(rng):
    """max_queue bounds admission: over-limit submits raise QueueFull and
    are counted; admitted requests still complete correctly."""
    from ivit_tpu.engine.serving import QueueFull, ServingEngine

    spec = build_engine(rng)
    images = rng.normal(size=(12, 64, 64, 3)).astype(np.float32)
    # batch_size large + long max_wait so the queue actually accumulates
    with ServingEngine(spec, batch_size=4, max_wait_ms=200, pallas=False,
                       max_queue=3) as srv:
        futs, rejected = [], 0
        for im in images:
            try:
                futs.append(srv.submit(im))
            except QueueFull:
                rejected += 1
        got = [f.result(timeout=60) for f in futs]
        m = srv.metrics.summary()
    assert rejected >= 1                     # 12 offered into a 3-deep queue
    assert len(got) == 12 - rejected
    assert m["rejected"] == rejected
    assert all(g.shape == got[0].shape for g in got)


def test_serving_deadline_sheds_stale_requests(rng):
    """Requests older than deadline_ms at batch-assembly time are shed
    with DeadlineExceeded (or cancelled), not run on the device."""
    import time

    from ivit_tpu.engine.serving import DeadlineExceeded, ServingEngine
    from concurrent.futures import CancelledError

    spec = build_engine(rng)
    images = rng.normal(size=(6, 64, 64, 3)).astype(np.float32)
    with ServingEngine(spec, batch_size=4, max_wait_ms=5, pallas=False,
                       deadline_ms=1e9) as srv:
        # sanity: with an infinite deadline nothing is shed
        got = srv.infer(images)
        assert got.shape[0] == 6
        assert srv.metrics.summary()["shed"] == 0
    # now a 0 ms deadline: every request is already stale when batched
    with ServingEngine(spec, batch_size=4, max_wait_ms=5, pallas=False,
                       deadline_ms=0.0) as srv:
        futs = [srv.submit(im) for im in images]
        shed = 0
        for f in futs:
            try:
                f.result(timeout=60)
            except (DeadlineExceeded, CancelledError):
                shed += 1
        m = srv.metrics.summary()
    assert shed == 6
    assert m["shed"] == 6
    assert m["images"] == 0                  # nothing reached the device
