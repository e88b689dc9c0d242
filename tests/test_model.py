"""Model tests (mirrors reference tests/test_model.py coverage: shrink /
activations, MLP shapes + batch independence + last_relu, LISTA shapes /
sparsity, GenericKM full API incl. ball norm, LISTAKM sparse encode +
dict decode, factory incl. SparseKM alias, gradient flow to every
parameter incl. kmat and dict)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from kmpc_tpu.config import Config, get_config
from kmpc_tpu.models import (
    KoopmanModel,
    get_activation,
    lista_apply,
    lista_init,
    make_model,
    mlp_apply,
    mlp_init,
    shrink,
    spectral_metrics,
)


# ---------------------------------------------------------------------------
# shrink & activations
# ---------------------------------------------------------------------------


def test_shrink_soft_threshold():
    x = jnp.array([-2.0, -0.5, 0.0, 0.5, 2.0])
    out = np.asarray(shrink(x, 1.0))
    assert np.allclose(out, [-1.0, 0.0, 0.0, 0.0, 1.0])


def test_shrink_zero_threshold_identity():
    x = jnp.array([-1.0, 2.0, 3.0])
    assert np.allclose(np.asarray(shrink(x, 0.0)), np.asarray(x))


@pytest.mark.parametrize("name", ["relu", "tanh", "gelu"])
def test_activations(name):
    fn = get_activation(name)
    out = fn(jnp.array([-1.0, 0.0, 1.0]))
    assert out.shape == (3,)


def test_unknown_activation_raises():
    with pytest.raises(ValueError):
        get_activation("swish")


# ---------------------------------------------------------------------------
# MLPCoder equivalent
# ---------------------------------------------------------------------------


def test_mlp_shapes():
    params = mlp_init(jax.random.PRNGKey(0), 4, 8, [16, 16], use_bias=True)
    x = jnp.ones((5, 4))
    y = mlp_apply(params, x)
    assert y.shape == (5, 8)
    # Arbitrary leading axes
    y2 = mlp_apply(params, jnp.ones((2, 3, 4)))
    assert y2.shape == (2, 3, 8)


def test_mlp_no_hidden_is_linear():
    params = mlp_init(jax.random.PRNGKey(0), 4, 2, [], use_bias=False)
    x = jnp.eye(4)
    y = mlp_apply(params, x)
    assert np.allclose(np.asarray(y), np.asarray(params[0]["w"]), atol=1e-6)


def test_mlp_batch_independence():
    params = mlp_init(jax.random.PRNGKey(1), 3, 3, [8], use_bias=True)
    x = jax.random.normal(jax.random.PRNGKey(2), (4, 3))
    full = mlp_apply(params, x)
    single = mlp_apply(params, x[1])
    assert np.allclose(np.asarray(full[1]), np.asarray(single), atol=1e-6)


def test_mlp_last_relu_nonnegative():
    params = mlp_init(jax.random.PRNGKey(3), 6, 6, [8], use_bias=True)
    x = jax.random.normal(jax.random.PRNGKey(4), (10, 6))
    y = mlp_apply(params, x, last_relu=True)
    assert float(jnp.min(y)) >= 0.0


def test_mlp_bias_toggle():
    p_nb = mlp_init(jax.random.PRNGKey(0), 4, 4, [8], use_bias=False)
    assert all("b" not in layer for layer in p_nb)
    p_b = mlp_init(jax.random.PRNGKey(0), 4, 4, [8], use_bias=True)
    assert all("b" in layer for layer in p_b)


# ---------------------------------------------------------------------------
# LISTA
# ---------------------------------------------------------------------------


def _lista_params(xdim=6, zdim=12, L=10.0, linear=True, key=0):
    k = jax.random.PRNGKey(key)
    Wd = 0.1 * jax.random.normal(k, (xdim, zdim))
    params = lista_init(
        jax.random.PRNGKey(key + 1), xdim, zdim, Wd, L,
        linear_encoder=linear, encoder_layers=[8], encoder_use_bias=True,
    )
    return params, Wd


def test_lista_shapes_linear():
    params, _ = _lista_params()
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 6))
    z = lista_apply(params, x, num_loops=5, alpha=1.0, L=10.0)
    assert z.shape == (5, 12)


def test_lista_shapes_mlp_encoder():
    params, _ = _lista_params(linear=False)
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 6))
    z = lista_apply(params, x, num_loops=5, alpha=1.0, L=10.0)
    assert z.shape == (5, 12)


def test_lista_init_formulas():
    params, Wd = _lista_params(L=10.0)
    assert np.allclose(np.asarray(params["We"]), np.asarray(Wd) / 10.0, atol=1e-6)
    expected_S = np.eye(12) - np.asarray(Wd.T @ Wd) / 10.0
    assert np.allclose(np.asarray(params["S"]), expected_S, atol=1e-5)


def test_lista_produces_sparsity():
    # Large alpha/L threshold should produce exact zeros.
    params, _ = _lista_params(L=1.0)
    x = 0.01 * jax.random.normal(jax.random.PRNGKey(5), (20, 6))
    z = lista_apply(params, x, num_loops=10, alpha=1.0, L=1.0)
    assert float(jnp.mean((z == 0).astype(jnp.float32))) > 0.5


def test_lista_init_wrong_shape_asserts():
    with pytest.raises(AssertionError):
        lista_init(
            jax.random.PRNGKey(0), 6, 12, jnp.zeros((12, 6)), 1.0,
            linear_encoder=True, encoder_layers=[], encoder_use_bias=False,
        )


# ---------------------------------------------------------------------------
# GenericKM
# ---------------------------------------------------------------------------


def _generic_model(obs=4, z=8, norm="id", last_relu=False):
    cfg = get_config("generic")
    cfg.MODEL.TARGET_SIZE = z
    cfg.MODEL.NORM_FN = norm
    cfg.MODEL.ENCODER.LAYERS = [16]
    cfg.MODEL.ENCODER.LAST_RELU = last_relu
    cfg.MODEL.ENCODER.USE_BIAS = True
    model = make_model(cfg, obs)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_generic_km_api():
    model, params = _generic_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 4))
    z = model.encode(params, x)
    assert z.shape == (5, 8)
    xr = model.decode(params, z)
    assert xr.shape == (5, 4)
    assert model.kmatrix(params).shape == (8, 8)
    nz = model.step_latent(params, z)
    assert nz.shape == z.shape
    nx = model.step_env(params, x)
    assert nx.shape == x.shape


def test_generic_km_kmat_init_identity():
    model, params = _generic_model()
    assert np.allclose(np.asarray(params["kmat"]), np.eye(8))
    # With K = I, step_latent is identity.
    z = jax.random.normal(jax.random.PRNGKey(2), (3, 8))
    assert np.allclose(np.asarray(model.step_latent(params, z)), np.asarray(z), atol=1e-6)


def test_generic_km_ball_norm():
    model, params = _generic_model(norm="ball")
    x = jax.random.normal(jax.random.PRNGKey(3), (6, 4))
    z = model.encode(params, x)
    norms = np.asarray(jnp.linalg.norm(z, axis=-1))
    assert np.allclose(norms, 1.0, atol=1e-5)


def test_generic_km_residual_and_reconstruction():
    model, params = _generic_model()
    x = jax.random.normal(jax.random.PRNGKey(4), (5, 4))
    nx = jax.random.normal(jax.random.PRNGKey(5), (5, 4))
    r = model.residual(params, x, nx)
    assert r.shape == (5,)
    assert float(jnp.min(r)) >= 0
    rec = model.reconstruction(params, x)
    assert rec.shape == x.shape
    # K=I: residual(x, x) == 0
    assert np.allclose(np.asarray(model.residual(params, x, x)), 0.0, atol=1e-5)


def test_loss_and_metrics_keys():
    model, params = _generic_model()
    x = jax.random.normal(jax.random.PRNGKey(6), (8, 4))
    nx = jax.random.normal(jax.random.PRNGKey(7), (8, 4))
    total, metrics = model.loss(params, x, nx)
    assert total.shape == ()
    for key in [
        "loss", "residual_loss", "reconst_loss",
        "prediction_loss", "sparsity_loss", "sparsity_ratio",
    ]:
        assert key in metrics
    # Weighted sum identity
    expected = (
        model.res_coeff * metrics["residual_loss"]
        + model.reconst_coeff * metrics["reconst_loss"]
        + model.pred_coeff * metrics["prediction_loss"]
        + model.sparsity_coeff * metrics["sparsity_loss"]
    )
    assert np.allclose(float(total), float(expected), rtol=1e-5)


def test_rollout_latent_discrete_matches_powers():
    model, params = _generic_model()
    K = 0.5 * jax.random.normal(jax.random.PRNGKey(8), (8, 8))
    params = dict(params, kmat=K)
    z0 = jax.random.normal(jax.random.PRNGKey(9), (3, 8))
    traj = model.rollout_latent_discrete(params, z0, 4)
    assert traj.shape == (3, 5, 8)
    expected = np.asarray(z0)
    for i in range(5):
        assert np.allclose(np.asarray(traj[:, i]), expected, atol=1e-4)
        expected = expected @ np.asarray(K)


def test_rollout_sequence_shape():
    model, params = _generic_model()
    x0 = jax.random.normal(jax.random.PRNGKey(10), (3, 4))
    traj = model.rollout_sequence(params, x0, 6)
    assert traj.shape == (3, 7, 4)


def test_loss_sequence():
    model, params = _generic_model()
    x_seq = jax.random.normal(jax.random.PRNGKey(11), (4, 6, 4))
    total, metrics = model.loss_sequence(params, x_seq)
    assert total.shape == ()
    assert all(np.isfinite(float(v)) for v in metrics.values())
    expected = (
        model.res_coeff * metrics["residual_loss"]
        + model.reconst_coeff * metrics["reconst_loss"]
        + model.pred_coeff * metrics["prediction_loss"]
        + model.sparsity_coeff * metrics["sparsity_loss"]
    )
    assert np.allclose(float(total), float(expected), rtol=1e-5)


def test_loss_sequence_hand_computed_linear_case():
    """Closed-form check with a purely linear model (no hidden layers)."""
    cfg = get_config("generic")
    cfg.MODEL.TARGET_SIZE = 3
    cfg.MODEL.ENCODER.LAYERS = []
    cfg.MODEL.DECODER.LAYERS = []
    cfg.MODEL.ENCODER.USE_BIAS = False
    cfg.MODEL.RES_COEFF = 1.0
    cfg.MODEL.RECONST_COEFF = 1.0
    cfg.MODEL.PRED_COEFF = 1.0
    cfg.MODEL.SPARSITY_COEFF = 1.0
    model = make_model(cfg, 3)
    params = model.init(jax.random.PRNGKey(0))
    # Make everything identity: E = D = K = I.
    params["encoder"][0]["w"] = jnp.eye(3)
    params["decoder"][0]["w"] = jnp.eye(3)

    x_seq = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 3))
    total, m = model.loss_sequence(params, x_seq)

    xs = np.asarray(x_seq)
    # z = x; zhat_t = x_0 for all t (K = I).
    z_hat = np.repeat(xs[:, :1], 4, axis=1)
    align = np.mean(np.sum(np.sum((z_hat[:, 1:] - xs[:, 1:]) ** 2, -1), 1))
    pred = align  # decode is identity
    reconst = 0.0
    sparsity = np.mean(np.sum(np.abs(xs), -1))
    assert np.allclose(float(m["residual_loss"]), align, rtol=1e-5)
    assert np.allclose(float(m["prediction_loss"]), pred, rtol=1e-5)
    assert np.allclose(float(m["reconst_loss"]), reconst, atol=1e-6)
    assert np.allclose(float(m["sparsity_loss"]), sparsity, rtol=1e-5)
    assert np.allclose(float(total), align + pred + reconst + sparsity, rtol=1e-5)


def test_ode_rollout():
    model, params = _generic_model()
    x0 = jax.random.normal(jax.random.PRNGKey(12), (2, 4))
    traj = model.rollout_sequence_ode(params, x0, 5, dt=0.1)
    assert traj.shape == (6, 2, 4)
    traj_rk4 = model.integrate_latent_ode(
        params, model.encode(params, x0), jnp.arange(6, dtype=jnp.float32) * 0.1,
        method="rk4",
    )
    assert traj_rk4.shape == (6, 2, 8)


# ---------------------------------------------------------------------------
# LISTAKM
# ---------------------------------------------------------------------------


def _listakm_model(obs=6, z=16):
    cfg = get_config("lista")
    cfg.MODEL.TARGET_SIZE = z
    cfg.MODEL.ENCODER.LISTA.NUM_LOOPS = 4
    cfg.MODEL.ENCODER.LISTA.L = 1.0
    cfg.MODEL.ENCODER.LISTA.ALPHA = 0.01
    model = make_model(cfg, obs)
    params = model.init(jax.random.PRNGKey(0))
    return model, params


def test_listakm_api():
    model, params = _listakm_model()
    x = jax.random.normal(jax.random.PRNGKey(1), (5, 6))
    z = model.encode(params, x)
    assert z.shape == (5, 16)
    xr = model.decode(params, z)
    assert xr.shape == (5, 6)
    assert params["dict"].shape == (16, 6)


def test_listakm_decode_normalized_dictionary():
    model, params = _listakm_model()
    z = jnp.eye(16)
    decoded = np.asarray(model.decode(params, z))
    wd = np.asarray(params["dict"])
    wd_norm = wd / np.maximum(np.linalg.norm(wd, axis=1, keepdims=True), 1e-4)
    assert np.allclose(decoded, wd_norm, atol=1e-5)


def test_listakm_sparsity_scaled_by_alpha():
    model, params = _listakm_model()
    x = jax.random.normal(jax.random.PRNGKey(2), (5, 6))
    z = model.encode(params, x)
    l1 = float(jnp.mean(jnp.sum(jnp.abs(z), axis=-1)))
    s = float(model.sparsity_loss(params, x))
    assert np.allclose(s, model.lista_alpha * l1, rtol=1e-5)


def test_listakm_loss_runs():
    model, params = _listakm_model()
    x_seq = jax.random.normal(jax.random.PRNGKey(3), (2, 5, 6))
    total, metrics = model.loss_sequence(params, x_seq)
    assert np.isfinite(float(total))


# ---------------------------------------------------------------------------
# Factory & gradient flow
# ---------------------------------------------------------------------------


def test_factory_sparse_km_alias():
    cfg = get_config("generic")
    cfg.MODEL.MODEL_NAME = "SparseKM"
    model = make_model(cfg, 4)
    assert isinstance(model, KoopmanModel)
    params = model.init(jax.random.PRNGKey(0))
    assert "encoder" in params and "kmat" in params


def test_factory_unknown_raises():
    cfg = get_config("generic")
    cfg.MODEL.MODEL_NAME = "NopeKM"
    with pytest.raises(ValueError):
        make_model(cfg, 4)


@pytest.mark.parametrize("preset,obs", [("generic", 4), ("lista", 6)])
def test_gradient_flow_all_params(preset, obs):
    """Every parameter (incl. kmat / dict / S) receives nonzero gradient
    (reference: test_model.py:489-527)."""
    cfg = get_config(preset)
    cfg.MODEL.TARGET_SIZE = 12
    cfg.MODEL.ENCODER.LISTA.NUM_LOOPS = 3
    cfg.MODEL.ENCODER.LISTA.L = 1.0
    cfg.MODEL.ENCODER.LISTA.ALPHA = 0.01
    if preset == "generic":
        cfg.MODEL.ENCODER.LAYERS = [8]
        cfg.MODEL.PRED_COEFF = 0.5
    model = make_model(cfg, obs)
    params = model.init(jax.random.PRNGKey(0))
    # Perturb kmat so residual gradients are nonzero.
    params["kmat"] = params["kmat"] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), params["kmat"].shape
    )

    x = jax.random.normal(jax.random.PRNGKey(2), (8, obs))
    nx = jax.random.normal(jax.random.PRNGKey(3), (8, obs))

    grads = jax.grad(lambda p: model.loss(p, x, nx)[0])(params)
    flat, _ = jax.tree_util.tree_flatten_with_path(grads)
    for path, g in flat:
        assert float(jnp.max(jnp.abs(g))) > 0, f"zero grad at {path}"


def test_spectral_metrics():
    model, params = _generic_model()
    m = spectral_metrics(params)
    assert np.allclose(m["A_max_eigenvalue"], 1.0, atol=1e-6)
    assert np.allclose(m["A_max_eigenvalue_real"], 1.0, atol=1e-6)


def test_model_jittable():
    model, params = _generic_model()
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 4))
    nx = jax.random.normal(jax.random.PRNGKey(1), (4, 4))
    loss_jit = jax.jit(lambda p, a, b: model.loss(p, a, b)[0])
    val = loss_jit(params, x, nx)
    assert np.isfinite(float(val))


def test_lista_loss_gradients_finite_with_dead_codes():
    """Regression: a sample whose sparse codes are fully soft-thresholded
    to zero makes the residual row exactly 0; jnp.linalg.norm would
    backpropagate NaN there (torch zero-subgradients it), which diverged
    the z=2048 'lista' preset at step 1. The safe norm must keep every
    gradient finite and the loss value identical."""
    import jax

    from kmpc_tpu.config import get_config

    cfg = get_config("lista")
    cfg.MODEL.TARGET_SIZE = 64
    model = make_model(cfg, 2)
    params = model.init(jax.random.PRNGKey(0))
    # One normal sample + one tiny sample that thresholds to all-zero
    # codes (alpha/L = 0.05 vs |We x| ~ 1e-4 * |x|).
    x = jnp.asarray([[1.0, -0.7], [1e-6, -1e-6]], jnp.float32)
    nx = jnp.asarray([[0.99, -0.69], [1e-6, -1e-6]], jnp.float32)
    z = model.encode(params, x)
    assert float(jnp.sum(jnp.abs(z[1]))) == 0.0, "test premise: dead codes"

    (loss, metrics), grads = jax.value_and_grad(
        lambda p: model.loss(p, x, nx), has_aux=True
    )(params)
    assert np.isfinite(float(loss))
    for leaf in jax.tree_util.tree_leaves(grads):
        assert bool(jnp.all(jnp.isfinite(leaf))), "NaN gradient"


# ---------------------------------------------------------------------------
# Mixed precision (cfg.TRAIN.DTYPE = "bfloat16")
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("preset,obs", [("generic", 6), ("lista", 6)])
def test_bfloat16_compute_dtype(preset, obs):
    """bf16 mixed precision: activations/latents ride bfloat16, losses
    reduce in float32, values stay within bf16 resolution of the f32
    model, and gradients (w.r.t. the float32 master params) are finite
    float32."""
    cfg = get_config(preset)
    cfg.MODEL.TARGET_SIZE = 16
    model32 = make_model(cfg, obs)
    cfg.TRAIN.DTYPE = "bfloat16"
    model16 = make_model(cfg, obs)
    assert model16.compute_dtype == "bfloat16"

    params = model32.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4, obs), jnp.float32)

    z16 = model16.encode(params, x)
    assert z16.dtype == jnp.bfloat16
    assert model16.decode(params, z16).dtype == jnp.bfloat16
    assert model16.step_env(params, x).shape == x.shape

    l32, m32 = model32.loss_sequence(params, x)
    l16, m16 = model16.loss_sequence(params, x)
    assert l16.dtype == jnp.float32  # reductions stay f32
    assert np.isfinite(float(l16))
    # bf16 has ~3 decimal digits; the losses must agree to that scale.
    assert abs(float(l16) - float(l32)) <= 0.05 * max(abs(float(l32)), 1.0)

    grads = jax.grad(lambda p: model16.loss_sequence(p, x)[0])(params)
    for leaf in jax.tree_util.tree_leaves(grads):
        assert leaf.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(leaf)))


def test_bfloat16_single_step_loss_and_ode_path():
    cfg = get_config("generic")
    cfg.MODEL.TARGET_SIZE = 8
    cfg.TRAIN.DTYPE = "bfloat16"
    model = make_model(cfg, 4)
    params = model.init(jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 4), jnp.float32)
    nx = x + 0.01
    loss, metrics = model.loss(params, x, nx)
    assert loss.dtype == jnp.float32 and np.isfinite(float(loss))
    # The continuous-time path INTEGRATES in float32 regardless (the
    # final decode still rides the compute dtype, like every decode).
    z0 = model.encode(params, x)
    t_span = jnp.arange(4, dtype=jnp.float32) * 0.1
    z_traj = model.integrate_latent_ode(params, z0, t_span)
    assert z_traj.dtype == jnp.float32
    traj = model.rollout_sequence_ode(params, x, num_steps=3, dt=0.1)
    assert traj.dtype == jnp.bfloat16
    assert bool(jnp.all(jnp.isfinite(traj.astype(jnp.float32))))


def test_unknown_compute_dtype_raises():
    model = KoopmanModel(
        model_name="GenericKM", observation_size=4, target_size=8,
        compute_dtype="float16",
    )
    params = model.init(jax.random.PRNGKey(0))
    with pytest.raises(ValueError, match="compute_dtype"):
        model.encode(params, jnp.ones((2, 4)))


def test_kpower_rollout_matches_scan():
    """rollout_impl="kpower" (round-3 VERDICT weak #6 A/B candidate)
    must match the scan rollout up to f32 matmul reassociation, through
    rollout_latent_discrete AND the full sequence loss."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from kmpc_tpu import get_config
    from kmpc_tpu.models import make_model

    cfg = get_config("generic")
    cfg.MODEL.TARGET_SIZE = 24
    model = make_model(cfg, 6)
    model_kp = dataclasses.replace(model, rollout_impl="kpower")
    params = model.init(jax.random.PRNGKey(0))
    # Make K non-trivial (identity init would hide association errors).
    params = dict(params)
    params["kmat"] = params["kmat"] + 0.01 * jax.random.normal(
        jax.random.PRNGKey(1), params["kmat"].shape
    )

    z0 = jax.random.normal(jax.random.PRNGKey(2), (8, 24))
    tr_scan = model.rollout_latent_discrete(params, z0, 7)
    tr_kp = model_kp.rollout_latent_discrete(params, z0, 7)
    assert tr_scan.shape == tr_kp.shape == (8, 8, 24)
    np.testing.assert_allclose(np.asarray(tr_scan), np.asarray(tr_kp),
                               atol=2e-5)

    x_seq = jax.random.normal(jax.random.PRNGKey(3), (4, 6, 6))
    l_scan, m_scan = model.loss_sequence(params, x_seq)
    l_kp, m_kp = model_kp.loss_sequence(params, x_seq)
    np.testing.assert_allclose(float(l_scan), float(l_kp), rtol=1e-5)
