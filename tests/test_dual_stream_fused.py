"""Fused dual-stream execution == the literal two-forward protocol.

`steps._fused_dual_stream_apply` executes the reference's dual-loader
forward — model(real) then model(render), per-stream train-BN statistics,
two sequential running-stat EMA updates (learnGeodesicBDModel.py:116-121)
— as ONE vmapped full-batch forward with the EMA chain composed
algebraically (r_b = mut_b + m*(mut_a - r)). The semantics are identical;
only the arithmetic order differs. This certifies the equivalence by
measurement, per step from a common state:

  * metrics (loss/Lc/Lr/s) agree to reduction-order rounding,
  * GRADIENTS agree elementwise — probed through plain-SGD steps so the
    parameter delta IS lr * grad (Adam would amplify reduction noise on
    near-zero-gradient elements into full +/-lr sign flips),
  * the composed running-stat EMA matches the literal two-update chain.

Covered configs: the flagship per-class BD model (geodesic_bd: warmup MSE
phase and the argmax-decode main phase), the multires model (in-forward
argmax delta selection under vmap), and a fixed-weight stream-sum config
(loss_stream_sum's factor-2 scale composing with the fused forward).

The strict multi-step certification of the fused path against the
reference's OWN torch loops lives in tests/test_torch_dynamics.py (the
dual-stream x64 tests run the trainer default, which is fused); this file
pins fused == sequential so the opt-out (`bn_stream_fused=False`) stays a
pure execution-strategy switch.
"""

import numpy as np
import optax
import jax
import jax.numpy as jnp

from multi_modal_regression_tpu.dictionary.kmeans import KMeansDictionary
from multi_modal_regression_tpu.parallel.mesh import (
    make_mesh,
    replicated_sharding,
)
from multi_modal_regression_tpu.train import get_config
from multi_modal_regression_tpu.train.steps import make_train_step
from multi_modal_regression_tpu.train.trainer import Trainer

C, K = 12, 8
SIZE, B = 32, 24
N_STEPS = 3
# large enough that the f32 parameter-delta reconstruction of the gradient
# is exact to ~1e-7 of the gradient scale (ulp(param)/PROBE_LR), small
# enough that three probe steps stay in the same loss landscape
PROBE_LR = 1e-2


def _centers():
    rng = np.random.default_rng(3)
    return (0.8 * rng.standard_normal((K, 3))).astype(np.float32)


def _batches(n):
    rng = np.random.default_rng(11)
    out = []
    for _ in range(n):
        out.append(
            {
                "xdata": rng.integers(0, 256, (B, SIZE, SIZE, 3), np.uint8),
                "euler": rng.uniform(-60, 60, (B, 3)).astype(np.float32),
                "label": (np.arange(B) % C).astype(np.int32),
            }
        )
    return out


def _trainer(preset, **overrides):
    cfg = get_config(
        preset,
        feature_network="resnet18",
        N0=512, N1=32, N2=16, dict_size=K, image_size=SIZE,
        compute_dtype="float32",
        **overrides,
    )
    return Trainer(
        cfg,
        dictionary=KMeansDictionary(cluster_centers=_centers()),
        mesh=make_mesh(jax.devices("cpu")[:1]),
    )


def _probe_step(trainer, phase, fused):
    """The trainer's dual-stream step with plain SGD(PROBE_LR) swapped in:
    new_params = params - PROBE_LR * grads, so the parameter delta exposes
    the gradient itself."""
    cfg = trainer.config
    tx = optax.sgd(PROBE_LR)
    step = jax.jit(
        make_train_step(
            trainer.apply_fn, trainer.problem, tx,
            phase=phase,
            alpha=cfg.alpha if phase == "main" else cfg.warmup_alpha,
            dual_stream_bn=True,
            dual_loss_sum=cfg.loss_stream_sum,
            dual_stream_fused=fused,
            **trainer._step_kwargs,
        )
    )
    return step, tx


def _copy(state):
    return jax.tree.map(jnp.array, state)


def _grads_from_delta(old_params, new_params):
    return jax.tree.map(
        lambda o, n: (np.asarray(o, np.float64) - np.asarray(n, np.float64))
        / PROBE_LR,
        old_params, new_params,
    )


def _leaf_close(a, b, rtol, atol_of_scale, what):
    flat_a = jax.tree.leaves(a)
    flat_b, _ = jax.tree_util.tree_flatten_with_path(b)
    for la, (path, lb) in zip(flat_a, flat_b):
        la, lb = np.asarray(la), np.asarray(lb)
        atol = atol_of_scale * (np.abs(lb).max() + 1e-12)
        np.testing.assert_allclose(
            la, lb, rtol=rtol, atol=atol,
            err_msg=f"{what}: {jax.tree_util.keystr(path)}",
        )


def _assert_fused_matches_sequential(trainer):
    state = trainer.init_state()
    state = jax.device_put(state, replicated_sharding(trainer.mesh))
    batches = _batches(N_STEPS)
    for phase in ("warmup", "main"):
        step_f, tx = _probe_step(trainer, phase, fused=True)
        step_s, _ = _probe_step(trainer, phase, fused=False)
        phase_state = _copy(state).replace(
            opt_state=tx.init(state.params)
        )
        for b in batches:
            sb = trainer.shard_batch(b)
            st_f, m_f = step_f(_copy(phase_state), sb)
            st_s, m_s = step_s(_copy(phase_state), sb)
            for k in m_s:
                np.testing.assert_allclose(
                    float(m_f[k]), float(m_s[k]), rtol=2e-5, atol=1e-7,
                    err_msg=f"{phase} metric {k}",
                )
            # gradient agreement: elementwise, with a per-leaf floor at
            # 0.2% of the leaf's gradient scale (reduction-order noise
            # through the f32 resnet trunk)
            _leaf_close(
                _grads_from_delta(phase_state.params, st_f.params),
                _grads_from_delta(phase_state.params, st_s.params),
                rtol=5e-3, atol_of_scale=2e-3, what=f"{phase} grads",
            )
            # the composed EMA vs the literal two-update chain
            _leaf_close(
                st_f.batch_stats, st_s.batch_stats,
                rtol=1e-4, atol_of_scale=1e-5, what=f"{phase} batch_stats",
            )
            # carry the sequential result as the canonical next state so
            # every comparison starts from a bit-identical common state
            phase_state = st_s


def test_geodesic_bd_fused_matches_sequential():
    trainer = _trainer("geodesic_bd")
    assert trainer.config.bn_per_stream and trainer.config.bn_stream_fused
    _assert_fused_matches_sequential(trainer)


def test_multires_fused_matches_sequential():
    _assert_fused_matches_sequential(
        _trainer("geodesic_bd_multires", N3=12)
    )


def test_stream_sum_fused_matches_sequential():
    # a fixed-weight stream-sum family member (loss_real + loss_render):
    # the factor-2 scale must compose identically with both executions
    trainer = _trainer("geodesic_regression")
    assert trainer.config.loss_stream_sum
    _assert_fused_matches_sequential(trainer)
