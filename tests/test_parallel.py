"""Mesh-sharded training equivalence: DP/TP must not change the math."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from ivit_tpu.models import VisionTransformer
from ivit_tpu.parallel import (batch_sharding, make_mesh, param_shardings,
                               replicated)
from ivit_tpu.train.steps import init_train_state, make_train_step


def build(rng):
    model = VisionTransformer(
        img_size=32, patch_size=16, embed_dim=64, depth=2, num_heads=2,
        num_classes=10, gelu_type="ivit", softmax_type="ivit",
        layernorm_type="ivit")
    tx = optax.sgd(1e-3)
    batch = {
        "image": jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32)),
        "label": jnp.asarray(rng.integers(0, 10, size=(8,))),
    }
    state = init_train_state(model, tx, jax.random.PRNGKey(0),
                             batch["image"])
    return model, tx, state, batch


@pytest.mark.parametrize("dp,tp", [(8, 1), (4, 2)])
def test_mesh_step_matches_single_device(rng, dp, tp):
    model, tx, state, batch = build(rng)
    step = make_train_step(model, tx, num_classes=10)
    key = jax.random.PRNGKey(7)

    ref_state, ref_metrics = jax.jit(step)(state, batch, key)

    mesh = make_mesh(dp=dp, tp=tp)
    st_sh = {
        "params": param_shardings(state["params"], mesh),
        "quant_stats": param_shardings(state["quant_stats"], mesh),
        "opt_state": param_shardings(state["opt_state"], mesh),
        "step": replicated(mesh),
    }
    b_sh = {"image": batch_sharding(mesh), "label": batch_sharding(mesh)}
    sharded_step = jax.jit(step, in_shardings=(st_sh, b_sh, replicated(mesh)),
                           out_shardings=(st_sh, replicated(mesh)))
    state_m = jax.device_put(state, st_sh)
    batch_m = jax.device_put(batch, b_sh)
    got_state, got_metrics = sharded_step(state_m, batch_m, key)

    np.testing.assert_allclose(float(got_metrics["loss"]),
                               float(ref_metrics["loss"]), rtol=1e-5)
    ref_flat = jax.tree.leaves(ref_state["params"])
    got_flat = jax.tree.leaves(jax.device_get(got_state["params"]))
    for a, b in zip(ref_flat, got_flat):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-6)


def test_tp_param_layout(rng):
    """Column/row sharding rules hit the intended kernels."""
    model, tx, state, batch = build(rng)
    mesh = make_mesh(dp=4, tp=2)
    sh = param_shardings(state["params"], mesh)
    qkv = sh["blocks_0"]["attn"]["qkv"]["kernel"].spec
    proj = sh["blocks_0"]["attn"]["proj"]["kernel"].spec
    fc1 = sh["blocks_0"]["mlp"]["fc1"]["kernel"].spec
    assert tuple(qkv) == (None, "model")
    assert tuple(proj) == ("model", None)
    assert tuple(fc1) == (None, "model")
    # LN weights replicated
    assert tuple(sh["blocks_0"]["norm1"]["weight"].spec) == ()


def test_swin_mesh_forward_matches_single_device(rng):
    """Swin on a dp=4 x tp=2 mesh: the TP layout keys on the shared
    qkv/proj/fc1/fc2 module names, so Swin shards without extra wiring;
    the sharded forward must reproduce single-device logits bit-for-bit."""
    from ivit_tpu.models.swin import SwinTransformer
    from ivit_tpu.parallel import shard_variables

    model = SwinTransformer(
        img_size=56, patch_size=4, embed_dim=32, depths=(2, 2),
        num_heads=(2, 4), window_size=7, num_classes=10,
        drop_path_rate=0.0)
    x = jnp.asarray(rng.normal(size=(8, 56, 56, 3)).astype(np.float32))
    variables = jax.jit(lambda a: model.init(
        jax.random.PRNGKey(0), a, running_stat=True))(x)
    fwd = lambda v, a: model.apply(v, a, running_stat=False)
    want = np.asarray(jax.jit(fwd)(variables, x))

    mesh = make_mesh(dp=4, tp=2)
    v_sh, shardings = shard_variables(variables, mesh)
    x_sh = jax.device_put(x, batch_sharding(mesh))
    got = np.asarray(jax.jit(
        fwd, in_shardings=(shardings, batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh))(v_sh, x_sh))
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("dp,tp", [(4, 2), (2, 4)])
def test_engine_tp_bitexact(rng, dp, tp):
    """Engine-side tensor parallelism (VERDICT r4 item 9): the frozen
    integer engine with qkv/fc1 column-sharded and proj/fc2 row-sharded
    over the model axis must be BIT-identical to the single-device engine
    — the K-reduction psum runs over exact int32 partials."""
    import sys
    sys.path.insert(0, "tests")
    from test_engine import build_calibrated

    from ivit_tpu.engine import freeze_model
    from ivit_tpu.engine.vit_int import engine_forward
    from ivit_tpu.parallel.mesh import shard_engine_params

    model, variables = build_calibrated(rng)
    spec = freeze_model(model, variables)
    x = jnp.asarray(rng.normal(size=(8, 64, 64, 3)).astype(np.float32))
    want = np.asarray(jax.jit(
        lambda i: engine_forward(spec, i, pallas=False))(x))

    mesh = make_mesh(dp=dp, tp=tp)
    params, shardings = shard_engine_params(spec.params, mesh)
    spec_cls = type(spec)
    fwd = jax.jit(
        lambda p, i: engine_forward(spec_cls(spec.config, p), i,
                                    pallas=False),
        in_shardings=(shardings, batch_sharding(mesh)),
        out_shardings=batch_sharding(mesh))
    xs = jax.device_put(x, batch_sharding(mesh))
    got = np.asarray(fwd(params, xs))
    np.testing.assert_array_equal(got, want)
    # the weight shards actually live on the model axis
    qkv = params["blocks"][0]["qkv_w"]
    assert qkv.sharding.spec == jax.sharding.PartitionSpec(None, "model")
