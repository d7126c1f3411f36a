#!/usr/bin/env python
"""True multi-process (multi-host) execution of the ivit_tpu stack.

The reference carries only vestigial ``torch.distributed`` helpers that no
entry point ever calls (``/root/reference/utils/utils.py:171-237``); this
script is the TPU-native replacement's *proof of execution*: it launches N
real OS processes, each owning a disjoint set of devices (4 virtual CPU
devices per process here; one TPU host's chips in production), wires them
into one JAX distributed system via ``jax.distributed.initialize``, and runs
three flows across the process boundary:

1. ``engine_dp`` — the frozen integer engine jit'd over a GLOBAL data-
   parallel mesh spanning both processes.  Input is assembled from
   process-local shards (``jax.make_array_from_process_local_data``), the
   replicated output forces a cross-process all-gather, and every process
   checks the gathered logits BITWISE against its own single-device run of
   the full batch (the bit-exactness doctrine extends across process
   boundaries: every per-image op is context-proof exact-int math).
2. ``sim_tp`` — the QAT sim forward with tensor-parallel parameter
   sharding where the ``model`` axis spans the two processes, so the
   row-sharded proj/fc2 reductions become cross-process psums (Gloo on
   CPU, ICI/DCN collectives on a pod).  Also checked bitwise.
3. ``serving`` — the production serving topology: each host runs its own
   ``ServingEngine`` (continuous batching over its local devices) and
   reports throughput/latency; logits are verified against the golden.

Run (launcher spawns the workers):

    python scripts/multihost_demo.py --full --out MULTIHOST.json

On a real multi-host pod slice the same worker code runs with
``--coordinator host0:port`` per host and no ``--local-devices`` override.
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import time

sys.path.insert(0, ".")


def free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


# ---------------------------------------------------------------------------
# worker
# ---------------------------------------------------------------------------

def build_engine(small, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.engine import freeze_model
    from ivit_tpu.models import VisionTransformer, str2model

    rng = np.random.default_rng(seed)
    if small:
        model = VisionTransformer(
            img_size=64, patch_size=16, embed_dim=64, depth=2, num_heads=2,
            num_classes=10, gelu_type="ivit", softmax_type="ivit",
            layernorm_type="ivit")
        img = 64
    else:
        model = str2model("deit_tiny_patch16_224")(
            gelu_type="ivit", softmax_type="ivit", layernorm_type="ivit")
        img = 224
    x0 = jnp.asarray(rng.normal(size=(4, img, img, 3)).astype(np.float32))
    variables = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x0)
    calib = jax.jit(lambda v, a: model.apply(
        v, a, running_stat=True, mutable=["quant_stats"]))
    qs = variables["quant_stats"]
    for _ in range(2):
        xb = jnp.asarray(rng.normal(size=(4, img, img, 3)).astype(np.float32))
        _, st = calib({"params": variables["params"], "quant_stats": qs}, xb)
        qs = st["quant_stats"]
    tree = {"params": variables["params"], "quant_stats": qs}
    return model, tree, freeze_model(model, tree), img, rng


def worker(args):
    os.environ.setdefault(
        "XLA_FLAGS",
        f"--xla_force_host_platform_device_count={args.local_devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(args.coordinator,
                               num_processes=args.num_processes,
                               process_id=args.process_id)
    # Force the gloo collective context up FRONT: its internal rank-address
    # exchange has a fixed 30s deadline, and the first collective otherwise
    # happens only after the per-worker model build/compiles — on a loaded
    # 4-core host the build skew exceeded the deadline (r4: GetKeyValue
    # timed out with key cpu:gloo/...).  A barrier here costs nothing and
    # removes the skew window.
    from jax.experimental import multihost_utils as _mh
    _mh.sync_global_devices("gloo context init")
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import multihost_utils
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ivit_tpu.engine.serving import ServingEngine
    from ivit_tpu.engine.vit_int import engine_forward
    from ivit_tpu.parallel import (DATA_AXIS, batch_sharding, make_mesh,
                                   param_shardings, replicated)

    pid = args.process_id
    nproc = args.num_processes
    ndev = len(jax.devices())
    nlocal = len(jax.local_devices())
    assert ndev == nproc * args.local_devices, (ndev, nproc)
    rec = {"process_id": pid, "num_processes": nproc,
           "global_devices": ndev, "local_devices": nlocal}

    model, tree, spec, img, rng = build_engine(args.small)
    spec_cls = type(spec)

    # ---- 1. engine over a global data-parallel mesh ----------------------
    batch_global = 2 * ndev
    x_all = rng.normal(size=(batch_global, img, img, 3)).astype(np.float32)
    golden = np.asarray(jax.jit(
        lambda a: engine_forward(spec, a, pallas=False))(jnp.asarray(x_all)))

    mesh = make_mesh(dp=ndev, tp=1)
    b_sh = batch_sharding(mesh)
    shard = x_all[pid * (batch_global // nproc):
                  (pid + 1) * (batch_global // nproc)]
    x_g = jax.make_array_from_process_local_data(b_sh, shard, x_all.shape)
    fwd = jax.jit(
        lambda p, a: engine_forward(spec_cls(spec.config, p), a, pallas=False),
        in_shardings=(replicated(mesh), b_sh),
        out_shardings=replicated(mesh))   # replication = cross-host all-gather
    params_g = jax.device_put(spec.params, replicated(mesh))
    t0 = time.perf_counter()
    out = fwd(params_g, x_g)
    got = np.asarray(jax.device_get(out.addressable_data(0)))
    rec["engine_dp_wall_s"] = time.perf_counter() - t0
    np.testing.assert_array_equal(got, golden)
    rec["engine_dp_bitexact"] = True
    multihost_utils.sync_global_devices("engine_dp done")

    # ---- 2. sim forward, tensor-parallel across the process boundary -----
    # model axis spans processes: device (d, m) = process m's d-th device,
    # so every row-sharded proj/fc2 reduction is a cross-process psum.
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    arr = np.asarray(devs).reshape(nproc, nlocal).T     # [nlocal, nproc]
    tp_mesh = Mesh(arr, (DATA_AXIS, "model"))
    sim = lambda v, a: model.apply(v, a, running_stat=False)
    x_sim = jnp.asarray(x_all[:8])
    want = np.asarray(jax.jit(sim)(tree, x_sim))
    v_sh = param_shardings(tree, tp_mesh)
    tree_g = jax.device_put(tree, v_sh)
    # batch shards live on the data axis; each data row holds one device per
    # process (model axis), so every process addresses the full batch
    xb_sh = batch_sharding(tp_mesh)
    x_simg = jax.make_array_from_process_local_data(
        xb_sh, np.asarray(x_sim), x_sim.shape)
    got_tp = jax.jit(sim, in_shardings=(v_sh, xb_sh),
                     out_shardings=NamedSharding(tp_mesh, P()))(tree_g, x_simg)
    got_tp = np.asarray(jax.device_get(got_tp.addressable_data(0)))
    np.testing.assert_array_equal(got_tp, want)
    rec["sim_tp_bitexact"] = True
    multihost_utils.sync_global_devices("sim_tp done")

    # ---- 2b. ENGINE forward, tensor-parallel across the process boundary -
    # (VERDICT r4 item 9): the frozen integer engine's qkv/fc1 column- and
    # proj/fc2 row-sharded layout on the same cross-process model axis; the
    # row-shard K-reductions psum exact int32 partials over the wire, so
    # the sharded engine is bit-identical to the single-device golden.
    from ivit_tpu.parallel.mesh import shard_engine_params
    eng_params_g, eng_sh = shard_engine_params(spec.params, tp_mesh)
    fwd_tp = jax.jit(
        lambda p, a: engine_forward(spec_cls(spec.config, p), a,
                                    pallas=False),
        in_shardings=(eng_sh, xb_sh),
        out_shardings=NamedSharding(tp_mesh, P()))
    x_eng = jax.make_array_from_process_local_data(
        xb_sh, np.asarray(x_all[:8]), (8, img, img, 3))
    got_etp = np.asarray(jax.device_get(
        fwd_tp(eng_params_g, x_eng).addressable_data(0)))
    np.testing.assert_array_equal(got_etp, golden[:8])
    rec["engine_tp_bitexact"] = True
    multihost_utils.sync_global_devices("engine_tp done")

    # ---- 3. per-host continuous-batched serving ---------------------------
    local_mesh = make_mesh(dp=nlocal, tp=1, devices=jax.local_devices())
    n_req = 4 * nlocal * 2
    images = rng.normal(size=(n_req, img, img, 3)).astype(np.float32)
    want_srv = np.asarray(jax.jit(
        lambda a: engine_forward(spec, a, pallas=False))(jnp.asarray(images)))
    with ServingEngine(spec, batch_size=nlocal * 4, max_wait_ms=20,
                       mesh=local_mesh, pallas=False) as srv:
        got_srv = srv.infer(images)
        summary = srv.metrics.summary()
    np.testing.assert_allclose(got_srv, want_srv, atol=1e-5)
    rec["serving"] = summary
    rec["serving_logits_ok"] = True
    multihost_utils.sync_global_devices("serving done")

    out_path = os.path.join(args.run_dir, f"worker_{pid}.json")
    with open(out_path, "w") as f:
        json.dump(rec, f, indent=1)
    print(f"worker {pid}: OK -> {out_path}", flush=True)


# ---------------------------------------------------------------------------
# launcher
# ---------------------------------------------------------------------------

def launch(args):
    port = free_port()
    os.makedirs(args.run_dir, exist_ok=True)
    procs = []
    for pid in range(args.num_processes):
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={args.local_devices}")
        env.pop("JAX_PLATFORMS", None)
        cmd = [sys.executable, os.path.abspath(__file__),
               "--process-id", str(pid),
               "--coordinator", f"localhost:{port}",
               "--num-processes", str(args.num_processes),
               "--local-devices", str(args.local_devices),
               "--run-dir", args.run_dir]
        if args.small:
            cmd.append("--small")
        procs.append(subprocess.Popen(cmd, env=env))
    rc = [p.wait(timeout=args.timeout) for p in procs]
    if any(rc):
        raise SystemExit(f"worker exit codes {rc}")

    merged = {"num_processes": args.num_processes,
              "local_devices_per_process": args.local_devices,
              "config": "small" if args.small else "deit_tiny_224",
              "workers": []}
    for pid in range(args.num_processes):
        with open(os.path.join(args.run_dir, f"worker_{pid}.json")) as f:
            merged["workers"].append(json.load(f))
    merged["all_bitexact"] = all(
        w["engine_dp_bitexact"] and w["sim_tp_bitexact"]
        and w.get("engine_tp_bitexact", False)
        for w in merged["workers"])
    merged["serving_images_per_sec_total"] = sum(
        w["serving"]["images_per_sec"] for w in merged["workers"])
    if args.out:
        with open(args.out, "w") as f:
            json.dump(merged, f, indent=1)
        print(f"wrote {args.out}")
    print(json.dumps(merged, indent=1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--num-processes", type=int, default=2)
    p.add_argument("--local-devices", type=int, default=4)
    p.add_argument("--small", action="store_true",
                   help="64px depth-2 config (tests); default DeiT-T 224")
    p.add_argument("--timeout", type=float, default=3600)
    p.add_argument("--run-dir", default="runs/multihost")
    p.add_argument("--out", default=None)
    # worker-mode flags
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--coordinator", default=None)
    args = p.parse_args()
    if args.process_id is None:
        launch(args)
    else:
        worker(args)


if __name__ == "__main__":
    main()
