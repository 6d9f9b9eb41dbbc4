import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sixdof_tpu.models.networks import RefineNet, ScoreNetMultiPair, sinusoidal_position_embedding


def test_refine_net_shapes():
    model = RefineNet(c_in=6)
    A = jnp.zeros((2, 160, 160, 6))
    B = jnp.zeros((2, 160, 160, 6))
    params = model.init(jax.random.PRNGKey(0), A, B)["params"]
    out = model.apply({"params": params}, A, B)
    assert out["trans"].shape == (2, 3)
    assert out["rot"].shape == (2, 3)


def test_refine_net_6d_rot():
    model = RefineNet(c_in=6, rot_rep="6d")
    A = jnp.zeros((1, 160, 160, 6))
    params = model.init(jax.random.PRNGKey(0), A, A)["params"]
    out = model.apply({"params": params}, A, A)
    assert out["rot"].shape == (1, 6)


def test_score_net_shapes():
    model = ScoreNetMultiPair(c_in=6)
    L = 4
    A = jnp.zeros((L, 160, 160, 6))
    B = jnp.zeros((L, 160, 160, 6))
    params = model.init(jax.random.PRNGKey(0), A, B, L)["params"]
    out = model.apply({"params": params}, A, B, L=L)
    assert out["score_logit"].shape == (1, L)


def test_positional_embedding_matches_torch_formula():
    pe = sinusoidal_position_embedding(10, 8)[0]
    import math

    # token 3, dim pair 1: sin/cos(3 * exp(-log(10000)*2/8))
    div = math.exp(-math.log(10000.0) * 2 / 8)
    np.testing.assert_allclose(pe[3, 2], math.sin(3 * div), atol=1e-6)
    np.testing.assert_allclose(pe[3, 3], math.cos(3 * div), atol=1e-6)


def test_torch_checkpoint_conversion_roundtrip():
    """Build the torch reference nets, convert weights, compare outputs."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(0)
    import torch.nn as tnn

    class ConvBNReLU(tnn.Module):
        def __init__(self, C_in, C_out, k=3, s=1):
            super().__init__()
            self.net = tnn.Sequential(
                tnn.Conv2d(C_in, C_out, k, s, (k - 1) // 2, bias=True), tnn.ReLU()
            )

        def forward(self, x):
            return self.net(x)

    class ResBlock(tnn.Module):
        def __init__(self, planes):
            super().__init__()
            self.conv1 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=True)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=True)
            self.relu = tnn.ReLU()

        def forward(self, x):
            out = self.relu(self.conv1(x))
            out = self.conv2(out)
            return self.relu(out + x)

    class TorchRefineNet(tnn.Module):
        def __init__(self, c_in=6):
            super().__init__()
            self.encodeA = tnn.Sequential(
                ConvBNReLU(c_in, 64, 7, 2), ConvBNReLU(64, 128, 3, 2),
                ResBlock(128), ResBlock(128),
            )
            self.encodeAB = tnn.Sequential(
                ResBlock(256), ResBlock(256), ConvBNReLU(256, 512, 3, 2),
                ResBlock(512), ResBlock(512),
            )
            self.trans_head = tnn.Sequential(
                tnn.TransformerEncoderLayer(512, 4, 512, batch_first=True), tnn.Linear(512, 3)
            )
            self.rot_head = tnn.Sequential(
                tnn.TransformerEncoderLayer(512, 4, 512, batch_first=True), tnn.Linear(512, 3)
            )

        def forward(self, A, B):
            import math

            bs = len(A)
            x = torch.cat([A, B], dim=0)
            x = self.encodeA(x)
            a, b = x[:bs], x[bs:]
            ab = self.encodeAB(torch.cat([a, b], 1))
            ab = ab.reshape(bs, ab.shape[1], -1).permute(0, 2, 1)
            # positional embedding
            n, d = ab.shape[1], ab.shape[2]
            pe = torch.zeros(n, d)
            position = torch.arange(0, n).float().unsqueeze(1)
            div_term = (torch.arange(0, d, 2).float() * -(math.log(10000.0) / d)).exp()[None]
            pe[:, 0::2] = torch.sin(position * div_term)
            pe[:, 1::2] = torch.cos(position * div_term)
            ab = ab + pe[None]
            return {
                "trans": self.trans_head(ab).mean(dim=1),
                "rot": self.rot_head(ab).mean(dim=1),
            }

    tmodel = TorchRefineNet().eval()
    rng = np.random.RandomState(0)
    # small input so the conv stack stays fast: 32x32 -> 4x4 = 16 tokens
    A = rng.rand(2, 6, 32, 32).astype(np.float32)
    B = rng.rand(2, 6, 32, 32).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(A), torch.from_numpy(B))

    from sixdof_tpu.models.torch_convert import convert_refine_net

    params = convert_refine_net(tmodel.state_dict())
    jmodel = RefineNet(c_in=6)
    jout = jmodel.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(A.transpose(0, 2, 3, 1)),
        jnp.asarray(B.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(jout["trans"]), tout["trans"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(jout["rot"]), tout["rot"].numpy(), atol=2e-4)


def test_torch_scorenet_conversion_roundtrip():
    """Torch ScoreNetMultiPair (reference layout) -> flax, output parity."""
    torch = pytest.importorskip("torch")
    torch.manual_seed(1)
    import math

    import torch.nn as tnn

    class ConvBNReLU(tnn.Module):
        def __init__(self, C_in, C_out, k=3, s=1):
            super().__init__()
            self.net = tnn.Sequential(
                tnn.Conv2d(C_in, C_out, k, s, (k - 1) // 2, bias=True), tnn.ReLU()
            )

        def forward(self, x):
            return self.net(x)

    class ResBlock(tnn.Module):
        def __init__(self, planes):
            super().__init__()
            self.conv1 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=True)
            self.conv2 = tnn.Conv2d(planes, planes, 3, 1, 1, bias=True)
            self.relu = tnn.ReLU()

        def forward(self, x):
            out = self.relu(self.conv1(x))
            out = self.conv2(out)
            return self.relu(out + x)

    class TorchScoreNet(tnn.Module):
        def __init__(self, c_in=6):
            super().__init__()
            self.encoderA = tnn.Sequential(
                ConvBNReLU(c_in, 64, 7, 2), ConvBNReLU(64, 128, 3, 2),
                ResBlock(128), ResBlock(128),
            )
            self.encoderAB = tnn.Sequential(
                ResBlock(256), ResBlock(256), ConvBNReLU(256, 512, 3, 2),
                ResBlock(512), ResBlock(512),
            )
            self.att = tnn.MultiheadAttention(512, 4, bias=True, batch_first=True)
            self.att_cross = tnn.MultiheadAttention(512, 4, bias=True, batch_first=True)
            self.linear = tnn.Linear(512, 1)

        def forward(self, A, B, L):
            bs = A.shape[0]
            x = torch.cat([A, B], dim=0)
            x = self.encoderA(x)
            a, b = x[:bs], x[bs:]
            ab = self.encoderAB(torch.cat([a, b], dim=1))
            ab = ab.reshape(bs, ab.shape[1], -1).permute(0, 2, 1)
            n, d = ab.shape[1], ab.shape[2]
            pe = torch.zeros(n, d)
            position = torch.arange(0, n).float().unsqueeze(1)
            div_term = (torch.arange(0, d, 2).float() * -(math.log(10000.0) / d)).exp()[None]
            pe[:, 0::2] = torch.sin(position * div_term)
            pe[:, 1::2] = torch.cos(position * div_term)
            ab = ab + pe[None]
            ab, _ = self.att(ab, ab, ab)
            feats = ab.mean(dim=1).reshape(bs, -1)
            x2 = feats.reshape(bs // L, L, -1)
            x2, _ = self.att_cross(x2, x2, x2)
            return self.linear(x2)[..., 0]

    tmodel = TorchScoreNet().eval()
    rng = np.random.RandomState(1)
    L = 3
    A = rng.rand(L, 6, 32, 32).astype(np.float32)
    B = rng.rand(L, 6, 32, 32).astype(np.float32)
    with torch.no_grad():
        tout = tmodel(torch.from_numpy(A), torch.from_numpy(B), L)

    from sixdof_tpu.models.networks import ScoreNetMultiPair
    from sixdof_tpu.models.torch_convert import convert_score_net

    params = convert_score_net(tmodel.state_dict())
    jmodel = ScoreNetMultiPair(c_in=6)
    jout = jmodel.apply(
        {"params": jax.tree.map(jnp.asarray, params)},
        jnp.asarray(A.transpose(0, 2, 3, 1)), jnp.asarray(B.transpose(0, 2, 3, 1)), L=L,
    )
    np.testing.assert_allclose(
        np.asarray(jout["score_logit"]).reshape(-1), tout.numpy().reshape(-1), atol=2e-4
    )
