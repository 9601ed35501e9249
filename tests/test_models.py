import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from exemplars_vc_tpu.config import load_config
from exemplars_vc_tpu.io import ArtifactStore
from exemplars_vc_tpu.models import (
    WarpingNetConfig,
    init_warping_params,
    warping_forward,
    warping_forward_batch,
)

DATA = "/root/reference/data"


def test_forward_shapes():
    cfg = WarpingNetConfig()
    params = init_warping_params(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((37, 20))
    y = warping_forward(params, x)
    assert y.shape == (37, 20)
    xb = jnp.ones((3, 37, 20))
    yb = warping_forward_batch(params, xb)
    assert yb.shape == (3, 37, 20)
    np.testing.assert_allclose(np.asarray(yb[0]), np.asarray(y), atol=1e-6)


def test_forward_deep_head():
    cfg = WarpingNetConfig(deep_head=True, fc_neurons=64)
    params = init_warping_params(jax.random.PRNGKey(1), cfg)
    y = warping_forward(params, jnp.ones((5, 20)))
    assert y.shape == (5, 20)
    assert bool(jnp.isfinite(y).all())


def test_lstm_state_propagates():
    # output at t>0 must depend on earlier inputs (recurrence works)
    cfg = WarpingNetConfig(nb_lstm_layers=1)
    params = init_warping_params(jax.random.PRNGKey(2), cfg)
    x1 = jnp.zeros((10, 20)).at[0].set(1.0)
    x2 = jnp.zeros((10, 20))
    y1 = warping_forward(params, x1)
    y2 = warping_forward(params, x2)
    assert float(jnp.abs(y1[5] - y2[5]).max()) > 1e-6


def test_net_can_learn_identity():
    import optax

    cfg = WarpingNetConfig(in_size=4, hidden_size=16, out_size=4)
    params = init_warping_params(jax.random.PRNGKey(3), cfg)
    opt = optax.adam(1e-2)
    state = opt.init(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 30, 4)), jnp.float32)

    @jax.jit
    def step(params, state, x):
        def loss_fn(p):
            return jnp.mean((warping_forward_batch(p, x) - x) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, state2 = opt.update(g, state, params)
        return optax.apply_updates(params, up), state2, loss

    losses = []
    for _ in range(150):
        params, state, loss = step(params, state, x)
        losses.append(float(loss))
    assert losses[-1] < 0.25 * losses[0]


@pytest.mark.skipif(not os.path.isdir(os.path.join(DATA, "SF1")), reason="no data")
def test_train_warping_net_end_to_end(tmp_path):
    from exemplars_vc_tpu.models.train import apply_warping_net, train_warping_net

    cfg = load_config(overrides=[
        "data.tar=TF1", "misc.nb_file=3", "net.nb_epoch=5", "net.patience=30",
    ])
    store = ArtifactStore(str(tmp_path))
    metrics = train_warping_net(cfg, store, DATA, nb_file=3)
    assert metrics["epochs_run"] == 5
    assert np.isfinite(metrics["best_test_loss"])
    assert store.has("checkpoint_warping")
    # losses should improve over training
    h = metrics["history"]
    assert h[-1]["test_loss"] <= h[0]["test_loss"]
    # inference path
    out = apply_warping_net(store, cfg, jnp.ones((2, 40, 20)))
    assert out.shape == (2, 40, 20)


def test_freq_warp_amf_and_dfw():
    from exemplars_vc_tpu.pipelines.freq_warp import (
        amf_warping,
        apply_warping,
        dfw_warping,
        warping_curve_from_path,
    )

    rng = np.random.default_rng(5)
    t = np.arange(400) / 16000
    src = np.stack([np.sin(2 * np.pi * 500 * t), np.sin(2 * np.pi * 700 * t)]).astype(np.float32)
    tar = np.stack([np.sin(2 * np.pi * 650 * t), np.sin(2 * np.pi * 900 * t)]).astype(np.float32)
    anchors = amf_warping(jnp.asarray(src), jnp.asarray(tar), order=8)
    assert anchors.shape == (2, 2, 10)
    a = np.asarray(anchors)
    assert (np.diff(a[0, 0]) >= -1e-6).all()  # monotone anchor frequencies

    spec = jnp.asarray(np.abs(rng.standard_normal(129)), jnp.float32)
    warped = apply_warping(spec, anchors[0])
    assert warped.shape == spec.shape
    assert bool(jnp.isfinite(warped).all())

    s_spec = np.abs(rng.standard_normal((3, 65))).astype(np.float32) + 0.1
    pi, pj = dfw_warping(jnp.asarray(s_spec), jnp.asarray(s_spec))
    curve = warping_curve_from_path(pi[0], pj[0], 65)
    # identical spectra → identity warping
    np.testing.assert_allclose(curve, np.arange(65), atol=1e-6)


def test_bidirectional_forward_and_future_dependence():
    cfg = WarpingNetConfig(nb_lstm_layers=1, bidirectional=True)
    params = init_warping_params(jax.random.PRNGKey(5), cfg)
    x1 = jnp.zeros((10, 20)).at[9].set(1.0)   # change only the LAST frame
    x2 = jnp.zeros((10, 20))
    y1 = warping_forward(params, x1)
    y2 = warping_forward(params, x2)
    assert y1.shape == (10, 20)
    # with a backward pass, early outputs depend on future inputs
    assert float(jnp.abs(y1[0] - y2[0]).max()) > 1e-6


def test_orbax_checkpoint_roundtrip(tmp_path):
    from exemplars_vc_tpu.models.train import load_params, save_params

    cfg = WarpingNetConfig(in_size=4, hidden_size=8, out_size=4, nb_lstm_layers=1)
    params = init_warping_params(jax.random.PRNGKey(0), cfg)
    store = ArtifactStore(str(tmp_path))
    save_params(store, "ck", params, backend="orbax")
    like = init_warping_params(jax.random.PRNGKey(1), cfg)
    back = load_params(store, "ck", like, backend="orbax")
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(back)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(not os.path.isdir(os.path.join(DATA, "SF1")), reason="no data")
def test_train_warping_net_data_parallel(tmp_path):
    """Data-parallel training over the 8 virtual devices must run and reach
    losses comparable to the single-device path."""
    from exemplars_vc_tpu.models.train import train_warping_net

    cfg = load_config(overrides=[
        "data.tar=TF1", "misc.nb_file=4", "net.nb_epoch=3", "net.batch_size=8",
    ])
    store = ArtifactStore(str(tmp_path))
    metrics = train_warping_net(cfg, store, DATA, nb_file=4, data_parallel=True)
    assert metrics["epochs_run"] == 3
    assert np.isfinite(metrics["best_test_loss"])
    assert store.has("checkpoint_warping")


@pytest.mark.skipif(not os.path.isdir(os.path.join(DATA, "SF1")), reason="no data")
def test_train_warping_net_spectral_features(tmp_path):
    """features="stft": the net trains on aligned spectral pairs (in/out
    sizes from the data, feature-suffixed artifacts) and the inference path
    round-trips — the direct-neural-conversion capability the reference's
    broken eval script was reaching for."""
    from exemplars_vc_tpu.models.train import apply_warping_net, train_warping_net

    cfg = load_config(overrides=[
        "data.tar=TF1", "misc.nb_file=3", "net.nb_epoch=2", "net.patience=30",
        "net.hidden_size=16", "data.use_stft=True",
    ])
    store = ArtifactStore(str(tmp_path))
    metrics = train_warping_net(cfg, store, DATA, nb_file=3, features="stft")
    assert np.isfinite(metrics["best_test_loss"])
    assert store.has("checkpoint_warping_stft")
    assert store.has("warping_norm_stft")
    # the reference-parity MFCC artifacts are untouched
    assert not store.has("checkpoint_warping")
    n_bins = cfg.mcep.frame_length // 2 + 1
    out = apply_warping_net(store, cfg, jnp.ones((1, 30, n_bins)),
                            features="stft")
    assert out.shape == (1, 30, n_bins)
    assert np.isfinite(np.asarray(out)).all()
