"""Weight converter parity vs real torch: a small CNN's torch state_dict
converted through convert_weights must reproduce torch's outputs in flax
(validates OIHW->HWIO, Linear transpose, BN running-stat mapping — the
transforms needed to load reference zoo checkpoints)."""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as tnn
from flax import linen as nn

from basedet_tpu.utils.convert_weights import load_reference_checkpoint


class TorchNet(tnn.Module):
    def __init__(self):
        super().__init__()
        self.conv = tnn.Conv2d(3, 8, 3, padding=1, bias=False)
        self.bn = tnn.BatchNorm2d(8)
        self.fc = tnn.Linear(8, 4)

    def forward(self, x):
        x = torch.relu(self.bn(self.conv(x)))
        x = x.mean(dim=(2, 3))
        return self.fc(x)


class FlaxNet(nn.Module):
    @nn.compact
    def __call__(self, x):  # NHWC
        x = nn.Conv(8, (3, 3), padding=1, use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=True, name="bn")(x)
        x = jax.nn.relu(x)
        x = x.mean(axis=(1, 2))
        return nn.Dense(4, name="fc")(x)


def test_torch_state_dict_roundtrip_parity():
    torch.manual_seed(0)
    tnet = TorchNet().eval()
    # non-trivial BN stats
    with torch.no_grad():
        tnet.bn.running_mean.uniform_(-1, 1)
        tnet.bn.running_var.uniform_(0.5, 2.0)

    fnet = FlaxNet()
    variables = fnet.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
    loaded = load_reference_checkpoint(variables, tnet.state_dict())

    x = np.random.RandomState(1).rand(2, 16, 16, 3).astype(np.float32)
    with torch.no_grad():
        ref = tnet(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    got = np.asarray(fnet.apply(loaded, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-5)
