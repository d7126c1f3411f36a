#!/usr/bin/env python
"""One-shot hardware numerics validation (VERDICT round-1 item 1).

The bit-exactness doctrine (ops/quant.py: Dekker rdiv, exact_fma, two-limb
exact sums) claims sim(eager) == sim(jit) == engine(unfused) ==
engine(Pallas/Mosaic) — on every backend, with identical bits across
backends.  This script proves it on hardware:

  # dump per backend (the axon plugin ignores JAX_PLATFORMS env; this
  # script calls jax.config.update itself):
  python scripts/tpu_validate.py dump --backend cpu --out /tmp/val_cpu.pkl
  python scripts/tpu_validate.py dump --backend tpu --out /tmp/val_tpu.pkl
  # then compare bitwise:
  python scripts/tpu_validate.py compare /tmp/val_cpu.pkl /tmp/val_tpu.pkl

Each dump runs the four BASELINE family configs at full model size
(DeiT-T 224 for vit families, Swin-T 224), records the calibrated
quant_stats fingerprint, sim logits (jit), engine logits (unfused and
Pallas), and reports within-backend cross-path diffs.  ``compare`` then
checks the cross-backend bits.  Exit code 0 = everything bit-identical.
"""

import argparse
import pickle
import sys

sys.path.insert(0, ".")


CONFIGS = [
    ("deit_tiny_ivit", "deit_tiny_patch16_224", ("ivit", "ivit", "ivit")),
    ("deit_tiny_ibert", "deit_tiny_patch16_224", ("ibert", "ibert", "ibert")),
    ("deit_tiny_mixed", "deit_tiny_patch16_224", ("ivit", "ibert", "ibert")),
    ("swin_tiny_ivit", "swin_tiny_patch4_window7_224",
     ("ivit", "ivit", "ivit")),
    ("deit_tiny_ppoly", "deit_tiny_patch16_224",
     ("ppoly_backend_ibert", "ppoly_backend_ibert", "ivit")),
]


def build(name, families, rng):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ivit_tpu.models import str2model

    kw = dict(gelu_type=families[0], softmax_type=families[1],
              layernorm_type=families[2])
    if name.startswith("swin"):
        kw["drop_path_rate"] = 0.0
    model = str2model(name)(**kw)
    x = jnp.asarray(rng.normal(size=(4, 224, 224, 3)).astype(np.float32))
    # init on CPU always: random param creation is host-side prep (its
    # trunc-normal rejection-sampling graph also SIGSEGVs the axon remote
    # compile helper intermittently).  Calibration/sim/engine stay on the
    # target backend, so the cross-backend qstats check still covers the
    # calibration math.
    from ivit_tpu.utils.hostdev import host_init
    with host_init():
        variables = jax.jit(lambda a: model.init(
            jax.random.PRNGKey(0), a, running_stat=True))(x)
    variables = jax.device_put(variables)
    # sims run chunked (bit-identical, far smaller modules — the unrolled
    # full-model graph intermittently SIGSEGVs the axon compile helper):
    # ViT as one scan-over-blocks jit, Swin as per-submodule jits
    if name.startswith("swin"):
        from ivit_tpu.models.chunked import swin_chunked_apply
        calib = lambda v, a: swin_chunked_apply(  # noqa: E731
            model, v, a, running_stat=True)
    else:
        from ivit_tpu.models.chunked import scan_apply
        calib = jax.jit(lambda v, a: scan_apply(
            model, v, a, running_stat=True))
    qs = variables["quant_stats"]
    for _ in range(2):
        xb = jnp.asarray(rng.normal(size=(4, 224, 224, 3)).astype(np.float32))
        _, st = calib({"params": variables["params"], "quant_stats": qs}, xb)
        qs = st["quant_stats"]
    tree = {"params": variables["params"], "quant_stats": qs}
    if any(f.startswith("ppoly") for f in families):
        from ivit_tpu.train.ppoly_fit import fit_ppoly_tables
        tree = fit_ppoly_tables(model, tree)
    return model, tree, x


def dump(args):
    import jax
    if args.backend == "cpu":
        jax.config.update("jax_platforms", "cpu")
    # tpu: leave the default so the axon plugin resolves itself
    import numpy as np
    import jax.numpy as jnp

    # --stats-from GOLDEN.pkl: load the golden's calibration tree instead of
    # trusting this backend's own calibration.  Calibration runs FLOAT model
    # forwards, which are not cross-backend bit-identical by nature (e.g.
    # the ibert LN overflow shift is a threshold on a float variance, and
    # TPU float matmul precision differs from CPU) — the framework's actual
    # invariant is that a CHECKPOINT fully determines the integer network
    # (SURVEY §5.4 ingestion contract): same quant_stats -> identical bits
    # on every backend, which is exactly what this mode tests.
    golden = None
    if getattr(args, "stats_from", None):
        with open(args.stats_from, "rb") as f:
            golden = pickle.load(f)

    out = {"backend": args.backend,
           "stats_from": getattr(args, "stats_from", None)}
    for cname, mname, families in CONFIGS:
        # the axon remote-compile helper SIGSEGVs intermittently on ~5MB
        # full-model graphs (one sick helper instance in the round-robin?);
        # per-config retry with a settle sleep is the CLAUDE.md doctrine
        def one_config():
            rng = np.random.default_rng(0)
            model, variables, x = build(mname, families, rng)
            rec = {}
            if golden is not None and cname in golden \
                    and "qstats_tree" in golden[cname]:
                variables = dict(variables)
                variables["quant_stats"] = jax.tree_util.tree_map(
                    jnp.asarray, golden[cname]["qstats_tree"])
            # fingerprint of the stats actually used (trivially equal to the
            # golden under --stats-from; a cross-backend calibration-drift
            # diagnostic otherwise)
            tree = jax.device_get(variables["quant_stats"])
            rec["qstats_tree"] = tree
            leaves = jax.tree_util.tree_leaves(tree)
            rec["qstats"] = np.concatenate([np.ravel(v) for v in leaves])

            if mname.startswith("swin"):
                from ivit_tpu.models.chunked import swin_chunked_apply
                sim_fn = lambda v, a: swin_chunked_apply(  # noqa: E731
                    model, v, a)
            else:
                from ivit_tpu.models.chunked import scan_apply
                sim_fn = jax.jit(lambda v, a: scan_apply(model, v, a))
            rec["sim"] = np.asarray(sim_fn(variables, x))
            if mname.startswith("swin"):
                from ivit_tpu.engine.swin_int import (freeze_swin_model,
                                                      swin_engine_forward)
                spec = freeze_swin_model(model, variables)
                fwd = swin_engine_forward
            else:
                from ivit_tpu.engine import freeze_model
                from ivit_tpu.engine.vit_int import engine_forward
                spec = freeze_model(model, variables)
                fwd = engine_forward
            rec["engine"] = np.asarray(jax.jit(
                lambda a: fwd(spec, a, pallas=False))(x))
            if args.backend == "tpu":
                # both LN placements (ADVICE r4): hoisted (XLA LN feeding
                # the kernels) AND in-kernel chains, each asserted against
                # the unfused engine at full model size — IVIT_HOIST_LN is
                # read at trace time, so toggle around fresh jits
                import os
                for tag, hoist in (("engine_pallas", "1"),
                                   ("engine_pallas_hoist0", "0")):
                    prev = os.environ.get("IVIT_HOIST_LN")
                    os.environ["IVIT_HOIST_LN"] = hoist
                    try:
                        rec[tag] = np.asarray(jax.jit(
                            lambda a: fwd(spec, a, pallas=True))(x))
                    finally:
                        if prev is None:
                            os.environ.pop("IVIT_HOIST_LN", None)
                        else:
                            os.environ["IVIT_HOIST_LN"] = prev
            return rec

        for attempt in range(4):
            try:
                rec = one_config()
                break
            except Exception as exc:  # noqa: BLE001
                print(f"{cname} attempt {attempt}: "
                      f"{repr(exc)[:140]}", flush=True)
                if attempt == 3:
                    raise
                import time
                time.sleep(20)
        d_se = np.abs(rec["sim"] - rec["engine"]).max()
        line = f"{cname}: sim-vs-engine {d_se:g}"
        ok = d_se == 0
        if "engine_pallas" in rec:
            d_p = np.abs(rec["engine"] - rec["engine_pallas"]).max()
            line += f"  engine-vs-pallas {d_p:g}"
            ok = ok and d_p == 0
        if "engine_pallas_hoist0" in rec:
            d_h = np.abs(rec["engine"] - rec["engine_pallas_hoist0"]).max()
            line += f"  engine-vs-pallas[hoist0] {d_h:g}"
            ok = ok and d_h == 0
        print(("PASS " if ok else "FAIL ") + line, flush=True)
        out[cname] = rec
    with open(args.out, "wb") as f:
        pickle.dump(out, f)
    print(f"wrote {args.out}")


def compare(args):
    import numpy as np

    with open(args.a, "rb") as f:
        a = pickle.load(f)
    with open(args.b, "rb") as f:
        b = pickle.load(f)
    rc = 0
    for cname, _, _ in CONFIGS:
        if cname not in a or cname not in b:
            print(f"SKIP {cname} (missing)")
            continue
        for key in ("qstats", "sim", "engine"):
            va, vb = a[cname][key], b[cname][key]
            n_diff = int((va != vb).sum())
            d = float(np.abs(va - vb).max()) if n_diff else 0.0
            status = "PASS" if n_diff == 0 else "FAIL"
            if n_diff:
                rc = 1
            print(f"{status} {cname}.{key}: {n_diff}/{va.size} bits differ "
                  f"(max abs {d:g}) [{a['backend']} vs {b['backend']}]")
    sys.exit(rc)


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    pd = sub.add_parser("dump")
    pd.add_argument("--backend", required=True, choices=["cpu", "tpu"])
    pd.add_argument("--out", required=True)
    pd.add_argument("--stats-from", default=None, dest="stats_from",
                    help="golden pickle whose quant_stats trees replace this"
                         " backend's own calibration (checkpoint-determines"
                         "-the-network invariant)")
    pd.set_defaults(fn=dump)
    pc = sub.add_parser("compare")
    pc.add_argument("a")
    pc.add_argument("b")
    pc.set_defaults(fn=compare)
    args = p.parse_args()
    args.fn(args)


if __name__ == "__main__":
    main()
