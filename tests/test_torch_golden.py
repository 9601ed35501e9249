"""Golden parity vs the reference's actual neural component (PyTorch).

torch (CPU) IS installed in this image, so the warping net is the one
component whose reference implementation can be run directly as an oracle.
The reference ``Net`` (``/root/reference/models.py:59-100``) is, effectively:
``nn.LSTM(20, 20, num_layers=2, batch_first=False)`` on ``x.view(T, 1, -1)``
with a FRESH zero hidden state (the ``h_state`` argument is not passed to the
LSTM call), followed by a per-frame ``fc4 = nn.Linear(20, 20)`` head; trained
with ``nn.L1Loss(size_average=False)`` and
``optim.RMSprop(lr=5e-3, weight_decay=1e-4)``
(``/root/reference/02_freq_warping_neural.py:150-189``).

These tests transplant torch-initialized weights into the scan-LSTM
(`exemplars_vc_tpu/models/warping.py`) and assert:

1. forward parity <= 1e-5 over real MFCC features from the bundled audio,
2. the L1-sum losses agree,
3. one full RMSprop training step produces the same parameters (trajectory
   parity for `models.train.reference_rmsprop`).
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from exemplars_vc_tpu.models.train import reference_rmsprop
from exemplars_vc_tpu.models.warping import (
    WarpingNetConfig,
    init_warping_params,
    warping_forward,
)

IN, HID, OUT, LAYERS = 20, 20, 20, 2


class TorchOracle(torch.nn.Module):
    """Minimal torch net with the reference's effective forward semantics."""

    def __init__(self):
        super().__init__()
        self.lstm = torch.nn.LSTM(IN, HID, num_layers=LAYERS, batch_first=False)
        self.fc4 = torch.nn.Linear(HID, OUT)

    def forward(self, x):  # x: (T, IN)
        out, _ = self.lstm(x.view(len(x), 1, -1))  # fresh zero hidden state
        return self.fc4(out)  # (T, 1, OUT)


def transplant(net: TorchOracle) -> dict:
    """torch parameters → scan-LSTM pytree.

    torch LSTM layer k: weight_ih_l{k} (4H, d_in), weight_hh_l{k} (4H, H),
    two bias vectors, gate order [i, f, g, o] — the same gate order as
    warping.py's fused W (d_in+H, 4H), b (4H,)."""
    params = init_warping_params(
        __import__("jax").random.PRNGKey(0),
        WarpingNetConfig(IN, HID, OUT, LAYERS),
    )
    # explicit copies: .numpy() views share storage with the live torch net
    sd = {k: np.array(v.detach().numpy(), copy=True)
          for k, v in net.state_dict().items()}
    for k in range(LAYERS):
        W = np.concatenate(
            [sd[f"lstm.weight_ih_l{k}"].T, sd[f"lstm.weight_hh_l{k}"].T], axis=0
        )
        b = sd[f"lstm.bias_ih_l{k}"] + sd[f"lstm.bias_hh_l{k}"]
        params["lstm"][k]["fwd"] = {"W": jnp.asarray(W), "b": jnp.asarray(b)}
    params["head"]["fc4"] = {
        "W": jnp.asarray(sd["fc4.weight"].T),
        "b": jnp.asarray(sd["fc4.bias"]),
    }
    return params


@pytest.fixture(scope="module")
def features(sf1_wav):
    """Real 20-dim MFCCs (the features the reference trains on)."""
    audio, sr = sf1_wav
    from exemplars_vc_tpu.dsp.mel import mfcc

    f = np.asarray(mfcc(jnp.asarray(audio), sr=sr, n_mfcc=20))[:200]
    # standardize like models/train.py does — keeps activations in range
    return (f - f.mean(0)) / (f.std(0) + 1e-6)


@pytest.fixture(scope="module")
def oracle():
    torch.manual_seed(7)
    return TorchOracle()


def test_forward_parity(oracle, features):
    x_t = torch.tensor(features, dtype=torch.float32)
    with torch.no_grad():
        y_torch = oracle(x_t).squeeze(1).numpy()

    params = transplant(oracle)
    y_jax = np.asarray(warping_forward(params, jnp.asarray(features, jnp.float32)))

    assert y_torch.shape == y_jax.shape == (features.shape[0], OUT)
    assert np.max(np.abs(y_torch - y_jax)) <= 1e-5


def test_l1_sum_loss_parity(oracle, features):
    rng = np.random.default_rng(3)
    target = rng.standard_normal(features.shape).astype(np.float32)

    x_t = torch.tensor(features, dtype=torch.float32)
    y_t = torch.tensor(target).view(len(target), 1, -1)
    crit = torch.nn.L1Loss(reduction="sum")  # == L1Loss(size_average=False)
    with torch.no_grad():
        loss_torch = float(crit(oracle(x_t), y_t))

    params = transplant(oracle)
    pred = warping_forward(params, jnp.asarray(features, jnp.float32))
    loss_jax = float(jnp.sum(jnp.abs(pred - jnp.asarray(target))))
    assert abs(loss_torch - loss_jax) <= 1e-2 * max(1.0, abs(loss_torch))


def _torch_grads(oracle, features, target):
    """L1-sum gradients from torch autograd, keyed like the state_dict."""
    oracle.zero_grad()
    crit = torch.nn.L1Loss(reduction="sum")
    loss = crit(
        oracle(torch.tensor(features, dtype=torch.float32)),
        torch.tensor(target).view(len(target), 1, -1),
    )
    loss.backward()
    return {n: p.grad.detach().clone() for n, p in oracle.named_parameters()}


def test_gradient_parity(oracle, features):
    """Backprop through the scan-LSTM matches torch autograd on the L1-sum
    loss (value tolerance — the two stacks accumulate float32 differently)."""
    import jax

    rng = np.random.default_rng(4)
    target = rng.standard_normal(features.shape).astype(np.float32)
    g_torch = _torch_grads(oracle, features, target)

    params0 = transplant(oracle)

    def loss_fn(p):
        pred = warping_forward(p, jnp.asarray(features, jnp.float32))
        return jnp.sum(jnp.abs(pred - jnp.asarray(target)))

    g_jax = jax.grad(loss_fn)(params0)

    for k in range(LAYERS):
        gW = np.concatenate(
            [g_torch[f"lstm.weight_ih_l{k}"].numpy().T,
             g_torch[f"lstm.weight_hh_l{k}"].numpy().T], axis=0
        )
        # torch keeps two bias vectors whose gradients are identical (both
        # enter the gates additively); the fused bias's gradient equals each
        gb = g_torch[f"lstm.bias_ih_l{k}"].numpy()
        jW = np.asarray(g_jax["lstm"][k]["fwd"]["W"])
        jb = np.asarray(g_jax["lstm"][k]["fwd"]["b"])
        scale = max(np.abs(gW).max(), 1.0)
        np.testing.assert_allclose(jW, gW, rtol=0, atol=1e-3 * scale)
        np.testing.assert_allclose(jb, gb, rtol=0, atol=1e-3 * scale)
    np.testing.assert_allclose(
        np.asarray(g_jax["head"]["fc4"]["W"]), g_torch["fc4.weight"].numpy().T,
        rtol=0, atol=1e-3 * max(float(np.abs(g_torch["fc4.weight"]).max()), 1.0),
    )


def test_rmsprop_trajectory_parity(oracle):
    """Three optimizer steps with IDENTICAL injected gradients: torch
    RMSprop(lr=5e-3, weight_decay=1e-4) vs models.train.reference_rmsprop
    produce the same parameters — exact optimizer-semantics parity
    (coupled L2, alpha=0.99, eps outside the sqrt). The jax side runs over a
    pytree shaped exactly like torch's named_parameters so every parameter
    (including the separate LSTM bias vectors) is compared one-to-one."""
    import optax

    # copy=True: on the CPU backend jnp.asarray can ZERO-COPY a numpy view of
    # torch's parameter storage, so opt_t.step() would mutate the jax params
    params = {n: jnp.asarray(np.array(p.detach().numpy(), copy=True))
              for n, p in oracle.named_parameters()}
    opt_t = torch.optim.RMSprop(oracle.parameters(), lr=5e-3, weight_decay=1e-4)
    optimizer = reference_rmsprop(5e-3, 1e-4)
    opt_state = optimizer.init(params)

    gen = torch.Generator().manual_seed(11)
    for _ in range(3):
        g_t = {n: torch.randn(p.shape, generator=gen)
               for n, p in oracle.named_parameters()}
        opt_t.zero_grad()
        for n, p in oracle.named_parameters():
            p.grad = g_t[n].clone()
        opt_t.step()

        g_jax = {n: jnp.asarray(g.numpy()) for n, g in g_t.items()}
        updates, opt_state = optimizer.update(g_jax, opt_state, params)
        params = optax.apply_updates(params, updates)

    for n, p in oracle.named_parameters():
        np.testing.assert_allclose(
            np.asarray(params[n]), p.detach().numpy(), rtol=0, atol=1e-6,
            err_msg=n,
        )

