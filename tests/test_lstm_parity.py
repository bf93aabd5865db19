"""EnvLSTM numerics parity vs torch.nn.LSTM (weight-mapped oracle)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch

import flax.linen as nn


def torch_to_flax_lstm(cell_params, lstm: torch.nn.LSTM, layer: int = 0):
    """Map torch LSTM weights (gate order i,f,g,o) onto OptimizedLSTMCell."""
    w_ih = lstm.state_dict()[f"weight_ih_l{layer}"].numpy()  # (4H, D)
    w_hh = lstm.state_dict()[f"weight_hh_l{layer}"].numpy()  # (4H, H)
    b_ih = lstm.state_dict()[f"bias_ih_l{layer}"].numpy()
    b_hh = lstm.state_dict()[f"bias_hh_l{layer}"].numpy()
    hdim = w_hh.shape[1]
    gates = {"i": 0, "f": 1, "g": 2, "o": 3}
    out = dict(cell_params)
    for g, idx in gates.items():
        sl = slice(idx * hdim, (idx + 1) * hdim)
        out[f"i{g}"] = {"kernel": jnp.asarray(w_ih[sl].T)}
        out[f"h{g}"] = {
            "kernel": jnp.asarray(w_hh[sl].T),
            # torch adds both biases; flax puts one bias on the h-projection
            "bias": jnp.asarray(b_ih[sl] + b_hh[sl]),
        }
    return out


def test_lstm_cell_matches_torch(rng):
    d, h, b, t = 4, 8, 2, 5
    tl = torch.nn.LSTM(d, h, 1, batch_first=True)
    x = rng.randn(b, t, d).astype(np.float32)
    with torch.no_grad():
        ref, _ = tl(torch.from_numpy(x))
    ref = ref.numpy()

    cell = nn.OptimizedLSTMCell(h)
    carry = cell.initialize_carry(jax.random.PRNGKey(0), (b, d))
    params = cell.init(jax.random.PRNGKey(0), carry, jnp.zeros((b, d)))["params"]
    params = torch_to_flax_lstm(params, tl)

    outs = []
    c = carry
    for i in range(t):
        c, y = cell.apply({"params": params}, c, jnp.asarray(x[:, i]))
        outs.append(np.asarray(y))
    got = np.stack(outs, axis=1)
    np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-5)


def test_env_lstm_head_shape():
    from ealdm_tpu.models import EnvLSTM

    m = EnvLSTM(hidden_size=8, output_size=6, num_layers=2)
    x = jnp.ones((3, 4, 5))
    params = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(params, x)
    assert out.shape == (12, 6)  # (B*T, emb) — reference head contract
