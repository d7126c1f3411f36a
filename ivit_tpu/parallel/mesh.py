"""Device mesh + sharding layout for data/tensor-parallel training & serving.

The reference has only vestigial ``torch.distributed`` helpers that no entry
point calls (``/root/reference/utils/utils.py:171-237``); this module is the
TPU-native replacement designed from scratch per SURVEY §5.8: a single
``jax.sharding.Mesh`` over the slice with a ``data`` axis (batch-parallel,
the scheme's scaling dimension) and a ``model`` axis (attention-head /
MLP-hidden sharded tensor parallelism), with XLA inserting the ICI
collectives from ``NamedSharding`` annotations.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(dp: Optional[int] = None, tp: int = 1,
              devices: Optional[Sequence] = None) -> Mesh:
    """Mesh over ``devices`` shaped [data, model] (dp defaults to fill)."""
    devices = list(devices if devices is not None else jax.devices())
    if dp is None:
        dp = len(devices) // tp
    if dp * tp != len(devices):
        raise ValueError(f"dp*tp = {dp}*{tp} != {len(devices)} devices")
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


# --- tensor-parallel parameter layout -------------------------------------
#
# ViT blocks: qkv/fc1 kernels are column-sharded (out features follow heads /
# hidden units), proj/fc2 are row-sharded (reduce over the model axis; XLA
# inserts the psum).  Everything else is replicated.

_COL_SHARDED = ("qkv", "fc1")
_ROW_SHARDED = ("proj", "fc2")


def _param_spec(path: tuple, leaf) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    for i, n in enumerate(names):
        if n in _COL_SHARDED and names[-1] == "kernel":
            return P(None, MODEL_AXIS)
        if n in _COL_SHARDED and names[-1] == "bias":
            return P(MODEL_AXIS)
        if n in _ROW_SHARDED and names[-1] == "kernel":
            # patch_embed/proj is a conv kernel [kh,kw,cin,D]: replicate
            if "patch_embed" in names:
                return P()
            return P(MODEL_AXIS, None)
    return P()


def param_shardings(tree, mesh: Mesh):
    """NamedSharding pytree for a QAT model's variables (params+stats)."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _param_spec(path, leaf)), tree)


def shard_variables(variables, mesh: Mesh):
    """Place a variables pytree onto the mesh per the TP layout."""
    shardings = param_shardings(variables, mesh)
    return jax.device_put(variables, shardings), shardings


# --- tensor-parallel layout for the FROZEN ENGINE --------------------------
#
# The integer engine's spec params (engine/freeze.py) get the same TP
# geometry as the sim: qkv/fc1 column-sharded (output features follow heads
# / hidden units), proj/fc2 row-sharded (K-reduction over the model axis —
# XLA inserts the psum over int32 partial accumulators, which is EXACT, so
# the sharded engine is bit-identical to the single-device one;
# tests/test_parallel.py asserts it).  Requant multipliers / biases that
# live on a sharded output axis shard with it; everything else replicates.

_ENGINE_COL = ("qkv_w", "fc1_w")
_ENGINE_COL_VEC = ("qkv_b", "m_qkv", "fc1_b", "m_fc1")
_ENGINE_ROW = ("proj_w", "fc2_w")


def _engine_param_spec(path: tuple) -> P:
    names = [getattr(p, "key", getattr(p, "name", str(p))) for p in path]
    leaf = names[-1] if names else ""
    if leaf in _ENGINE_COL:
        return P(None, MODEL_AXIS)
    if leaf in _ENGINE_COL_VEC:
        return P(MODEL_AXIS)
    if leaf in _ENGINE_ROW:
        return P(MODEL_AXIS, None)
    return P()


def engine_param_shardings(params, mesh: Mesh):
    """NamedSharding pytree for a frozen EngineSpec's params."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(mesh, _engine_param_spec(path)),
        params)


def shard_engine_params(params, mesh: Mesh):
    """Place engine params onto the mesh per the TP layout."""
    shardings = engine_param_shardings(params, mesh)
    return jax.device_put(params, shardings), shardings
