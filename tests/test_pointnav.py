import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from vlfm_tpu.models import pointnav as PN
from vlfm_tpu.models.torch_import import convert_torch_state_dict

jax.config.update("jax_default_device", jax.devices("cpu")[0])


def test_conv_gn_pool_parity_with_torch():
    """Stem path numerics: conv7x7/s2/p3 + GN + relu + maxpool3/s2/p1."""
    torch.manual_seed(0)
    conv = tnn.Conv2d(1, 32, 7, stride=2, padding=3, bias=False)
    gn = tnn.GroupNorm(16, 32, eps=1e-5)
    x = torch.randn(2, 1, 64, 64)
    with torch.no_grad():
        want = tnn.functional.max_pool2d(torch.relu(gn(conv(x))), 3, 2, 1).numpy()

    import flax.linen as nn

    class Stem(nn.Module):
        @nn.compact
        def __call__(self, x):
            x = nn.Conv(32, (7, 7), strides=2, padding=3, use_bias=False, name="c")(x)
            x = nn.GroupNorm(num_groups=16, epsilon=1e-5, name="g")(x)
            x = nn.relu(x)
            return nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

    params = {
        "c": {"kernel": jnp.asarray(conv.weight.detach().numpy().transpose(2, 3, 1, 0))},
        "g": {
            "scale": jnp.asarray(gn.weight.detach().numpy()),
            "bias": jnp.asarray(gn.bias.detach().numpy()),
        },
    }
    got = Stem().apply({"params": params}, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    assert np.allclose(got, want, atol=1e-4), np.abs(got - want).max()


def test_lstm_parity_with_torch():
    torch.manual_seed(1)
    rnn = tnn.LSTM(input_size=8, hidden_size=16, num_layers=2)
    x = torch.randn(1, 3, 8)  # (T=1, B=3, I)
    h0 = torch.randn(2, 3, 16)
    c0 = torch.randn(2, 3, 16)
    with torch.no_grad():
        out, (h1, c1) = rnn(x, (h0, c0))

    params = {}
    for layer in range(2):
        params[f"layer{layer}"] = {
            "w_ih": jnp.asarray(getattr(rnn, f"weight_ih_l{layer}").detach().numpy()),
            "w_hh": jnp.asarray(getattr(rnn, f"weight_hh_l{layer}").detach().numpy()),
            "b_ih": jnp.asarray(getattr(rnn, f"bias_ih_l{layer}").detach().numpy()),
            "b_hh": jnp.asarray(getattr(rnn, f"bias_hh_l{layer}").detach().numpy()),
        }
    got_out, got_h, got_c = PN.lstm_step(
        params, jnp.asarray(x[0].numpy()), jnp.asarray(h0.numpy()), jnp.asarray(c0.numpy())
    )
    assert np.allclose(np.asarray(got_out), out[0].numpy(), atol=1e-5)
    assert np.allclose(np.asarray(got_h), h1.numpy(), atol=1e-5)
    assert np.allclose(np.asarray(got_c), c1.numpy(), atol=1e-5)


def _synthetic_reference_state_dict(discrete: bool):
    """Random tensors with the reference checkpoint's names and shapes."""
    rng = np.random.default_rng(0)

    def t(*shape):
        return rng.normal(size=shape).astype(np.float32) * 0.05

    sd = {}
    enc = "net.visual_encoder"
    sd[f"{enc}.backbone.conv1.0.weight"] = t(32, 1, 7, 7)
    sd[f"{enc}.backbone.conv1.1.weight"] = t(32)
    sd[f"{enc}.backbone.conv1.1.bias"] = t(32)
    inp = 32
    for li, planes in enumerate([32, 64, 128, 256], start=1):
        for bi in range(2):
            pre = f"{enc}.backbone.layer{li}.{bi}"
            cin = inp if bi == 0 else planes
            sd[f"{pre}.convs.0.weight"] = t(planes, cin, 3, 3)
            sd[f"{pre}.convs.1.weight"] = t(planes)
            sd[f"{pre}.convs.1.bias"] = t(planes)
            sd[f"{pre}.convs.3.weight"] = t(planes, planes, 3, 3)
            sd[f"{pre}.convs.4.weight"] = t(planes)
            sd[f"{pre}.convs.4.bias"] = t(planes)
            if bi == 0 and (cin != planes):
                sd[f"{pre}.downsample.0.weight"] = t(planes, cin, 1, 1)
                sd[f"{pre}.downsample.1.weight"] = t(planes)
                sd[f"{pre}.downsample.1.bias"] = t(planes)
        inp = planes
    sd[f"{enc}.compression.0.weight"] = t(128, 256, 3, 3)
    sd[f"{enc}.compression.1.weight"] = t(128)
    sd[f"{enc}.compression.1.bias"] = t(128)
    sd["net.visual_fc.1.weight"] = t(512, 2048)
    sd["net.visual_fc.1.bias"] = t(512)
    sd["net.tgt_embeding.weight"] = t(32, 3)
    sd["net.tgt_embeding.bias"] = t(32)
    if discrete:
        sd["net.prev_action_embedding_discrete.weight"] = t(5, 32)
        sd["action_distribution.linear.weight"] = t(4, 512)
        sd["action_distribution.linear.bias"] = t(4)
    else:
        sd["net.prev_action_embedding_cont.weight"] = t(32, 2)
        sd["net.prev_action_embedding_cont.bias"] = t(32)
        sd["action_distribution.mu_maybe_std.weight"] = t(4, 512)
        sd["action_distribution.mu_maybe_std.bias"] = t(4)
    for layer in range(2):
        in_sz = 576 if layer == 0 else 512
        sd[f"net.state_encoder.rnn.weight_ih_l{layer}"] = t(2048, in_sz)
        sd[f"net.state_encoder.rnn.weight_hh_l{layer}"] = t(2048, 512)
        sd[f"net.state_encoder.rnn.bias_ih_l{layer}"] = t(2048)
        sd[f"net.state_encoder.rnn.bias_hh_l{layer}"] = t(2048)
    return sd


@pytest.mark.parametrize("discrete", [True, False])
def test_converted_params_run_policy(discrete):
    sd = _synthetic_reference_state_dict(discrete)
    params = convert_torch_state_dict(sd, discrete=discrete)
    policy = PN.PointNavPolicy(params, discrete=discrete)
    # structure must match a freshly-initialized tree
    ref = policy.init_params(jax.random.PRNGKey(0))
    got_leaves = jax.tree_util.tree_flatten_with_path(params)[0]
    want_leaves = jax.tree_util.tree_flatten_with_path(ref)[0]
    got_map = {jax.tree_util.keystr(p): l.shape for p, l in got_leaves}
    want_map = {jax.tree_util.keystr(p): l.shape for p, l in want_leaves}
    assert got_map == want_map

    batch = 3
    state = PN.initial_state(batch, discrete=discrete)
    depth = jnp.ones((batch, 224, 224, 1)) * 0.5
    goal = jnp.tile(jnp.array([[2.0, 0.3]]), (batch, 1))
    action, state = policy.act(depth, goal, state)
    if discrete:
        assert action.shape == (batch, 1)
        assert ((action >= 0) & (action < 4)).all()
    else:
        assert action.shape == (batch, 2)
        assert (jnp.abs(action) <= 1.0).all()
    assert bool(state.not_done.all())
    # second step with recurrence
    action2, state2 = policy.act(depth, goal, state)
    assert state2.h.shape == (2, batch, 512)
    # resetting an episode zeroes its hidden state
    state3 = PN.reset_episodes(state2, jnp.array([True, False, False]))
    assert not np.asarray(state3.h[:, 0]).any()
    assert np.asarray(state3.h[:, 1]).any()


def test_mask_resets_hidden_inside_act():
    sd = _synthetic_reference_state_dict(True)
    params = convert_torch_state_dict(sd, discrete=True)
    policy = PN.PointNavPolicy(params, discrete=True)
    depth = jnp.ones((1, 224, 224, 1)) * 0.3
    goal = jnp.array([[1.0, 0.0]])
    s0 = PN.initial_state(1)
    # two fresh starts must agree even if stale state differs
    stale = s0._replace(h=jnp.ones_like(s0.h), c=jnp.ones_like(s0.c))
    a1, _ = policy.act(depth, goal, s0)
    a2, _ = policy.act(depth, goal, stale)
    assert np.array_equal(np.asarray(a1), np.asarray(a2))
