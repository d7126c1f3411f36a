"""Cost-aware engine path dispatch (VERDICT r3 item 2).

The engine has two bit-identical execution paths: the fused Pallas block
kernels and the unfused per-op XLA graph.  Which is faster depends on the
model geometry (small-channel models amortize the fused kernels' fixed
per-program cost poorly — round-3: DeiT-T unfused 7,937 vs fused
6,994 img/s).  The Engine must never default to a measured-slower path, so
its ``pallas=None`` default now resolves through this module:

* :func:`static_choice` — a calibration table of hardware A/B measurements
  (provenance: runs/ logs), with a geometry heuristic fallback;
* :func:`timed_choice` — a one-time timed probe of both compiled paths
  (``Engine(spec, probe_images=...)``), for geometries absent from the
  table.

The choice and its source are recorded in ``Engine.fusion["path_choice"]``
and logged; ``scripts/bench_matrix.py`` stores it next to every number.
"""

from __future__ import annotations

import time
from typing import Any, Dict, Tuple

# Hardware A/B calibration table: (arch, embed_dim) -> fused?
# Each row cites its measurement log.  Round-3 state (pre-LUT kernels):
# the small-channel models lost on the fused path.  Rows are re-measured
# after every kernel-default change (the round-2 rule: no default change
# without same-session bench+validate) — scripts/path_compare.py /
# scripts/swin_path_compare.py regenerate them.
MEASURED: Dict[Tuple[str, int], Dict[str, Any]] = {
    # r5 autotune: fused WITH hoisted ivit LN + tuned tiles = 9,513 img/s vs
    # 7,969 unfused (runs/autotune_tiny_r5a/b.log, 32 configs, all bitwise-
    # equal) — the r4 "fused loses at C=192" result predated LN hoisting
    ("vit", 192): {"fused": True,
                   "evidence": "r5 runs/autotune_tiny_r5b.log "
                               "(9,513 fused/hoist vs 7,969 unfused)"},
    # r4: fused 7,053 vs unfused 4,884 (runs/path_compare_small_r4b.log)
    ("vit", 384): {"fused": True,
                   "evidence": "r4 runs/path_compare_small_r4b.log "
                               "(7,053 fused vs 4,884 unfused)"},
    # r3: ViT-B fused 1.162x bf16 (BENCH_MATRIX_r3.json vit_base row)
    ("vit", 768): {"fused": True, "evidence": "BENCH_MATRIX_r3.json vit_base"},
    # swin routes per-stage now (MEASURED_SWIN_STAGE below); this row only
    # feeds the whole-model static_choice fallback
    ("swin", 96): {"fused": True,
                   "evidence": "r5 runs/swin_path_compare_r5.log "
                               "(per-stage mixes all beat unfused)"},
}


def static_choice(cfg) -> Tuple[bool, Dict[str, Any]]:
    """Table lookup -> (use_fused, report).  Geometries absent from the
    table take the embed-dim heuristic the round-3 measurements imply
    (fused kernels amortize their fixed per-program cost at larger C)."""
    arch = "swin" if hasattr(cfg, "depths") else "vit"
    key = (arch, int(cfg.embed_dim))
    row = MEASURED.get(key)
    if row is not None:
        return bool(row["fused"]), {"source": "static-table", "key": str(key),
                                    "evidence": row["evidence"]}
    fused = int(cfg.embed_dim) >= 256 or arch == "swin"
    return fused, {"source": "heuristic", "key": str(key),
                   "evidence": "embed_dim >= 256 amortizes the fused "
                               "kernels' per-program cost (r3 table)"}


def timed_choice(fused_fn, unfused_fn, x, iters: int = 10):
    """One-time timed probe: run both compiled paths, pick the faster.

    ``fused_fn``/``unfused_fn``: callables taking ``x`` (already jitted);
    both are compiled (first call) then timed over ``iters`` dispatches.
    Returns ``(use_fused, report)``.
    """
    import jax

    def _t(fn):
        jax.block_until_ready(fn(x))           # compile + warm
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters

    t_fused = _t(fused_fn)
    t_unfused = _t(unfused_fn)
    return t_fused <= t_unfused, {
        "source": "timed-probe",
        "t_fused_ms": round(t_fused * 1e3, 3),
        "t_unfused_ms": round(t_unfused * 1e3, 3),
    }


# Per-geometry fused-kernel tuning table (VERDICT r4 item 1 — the Ansor
# analog).  Keys mirror MEASURED; values are kernel degrees of freedom the
# autotune sweep (scripts/autotune.py) measured on hardware:
#   img_tile  — images per attention-kernel program (grid collapse axis)
#   mlp_tile  — token rows per MLP-kernel program
# Geometries absent here keep the kernels' built-in defaults (img_tile=2,
# mlp_tile=512, both VMEM-capped per-geometry at call time).  Rows cite
# their sweep log.  IVIT_HEAD_PACK / IVIT_PAD_KV / IVIT_HOIST_LN remain
# env-only A/B axes; their defaults are geometry/family-gated in code.
TUNED: Dict[Tuple[str, int], Dict[str, Any]] = {
    # r5 sweep winner at C=192: img_tile 2, mlp_tile 512, head_pack 1
    # (9,513 img/s vs 9,359 at the head-packed default; packing buys
    # nothing at H=3 where one head always rides alone) —
    # runs/autotune_tiny_r5a.log + _r5b.log
    ("vit", 192): {"img_tile": 2, "mlp_tile": 512, "head_pack": 1,
                   "evidence": "runs/autotune_tiny_r5b.log"},
    # r5 sweep at C=384: the built-in defaults are the measured optimum
    # within tunnel noise (7,216 best-swept vs 7,245-7,301 at defaults,
    # runs/autotune_small_r5a.log + headline_ab_r5.log); no override
}


def kernel_tune(cfg) -> Dict[str, Any]:
    """Autotuned kernel params for this geometry ({} = built-in defaults)."""
    arch = "swin" if hasattr(cfg, "depths") else "vit"
    return TUNED.get((arch, int(cfg.embed_dim)), {})


# Per-stage Swin path table (VERDICT r4 item 3): Swin stage dims span
# exactly the widths where the ViT A/Bs flip between unfused and fused, so
# each stage routes independently.  Keys are stage channel dims; rows cite
# their measurement log (scripts/swin_path_compare.py --stage-ab).
MEASURED_SWIN_STAGE: Dict[int, Dict[str, Any]] = {
    # r5 hardware A/B (runs/swin_path_compare_r5.log, batch 64, all masks
    # bitwise-equal): unfused 1,519 / all-fused 1,602 / stages23 1,624 /
    # stages123 1,643 / stages3 1,551 img/s -> stage0 unfused, 1-3 fused.
    96: {"fused": False, "evidence": "r5 runs/swin_path_compare_r5.log "
                                     "(stages123 1,643 > fused 1,602)"},
    192: {"fused": True, "evidence": "r5 runs/swin_path_compare_r5.log"},
    384: {"fused": True, "evidence": "r5 runs/swin_path_compare_r5.log"},
    768: {"fused": True, "evidence": "r5 runs/swin_path_compare_r5.log"},
}


def swin_stage_choice(cfg) -> Tuple[tuple, Dict[str, Any]]:
    """Per-stage fused/unfused mix for a Swin config."""
    dims = [int(cfg.embed_dim) * 2**i for i in range(len(cfg.depths))]
    paths, src = [], {}
    for d in dims:
        row = MEASURED_SWIN_STAGE.get(d)
        if row is not None:
            paths.append(bool(row["fused"]))
            src[str(d)] = row["evidence"]
        else:
            # ViT A/B heuristic: fused kernels amortize their per-program
            # cost from C>=256 (MEASURED table); below that unfused wins
            paths.append(d >= 256)
            src[str(d)] = "heuristic (vit table: fused iff C >= 256)"
    return tuple(paths), {"source": "swin-stage-table", "evidence": src}
