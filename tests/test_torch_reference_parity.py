"""Conversion fidelity proven against the ACTUAL reference torch modules.

Imports /root/reference/learning/models/{refine_network,score_network}.py
directly (stubbing their unavailable CUDA-era deps), random-inits them,
runs state_dict() through models/torch_convert.py, and asserts forward-output
parity with our flax networks (reference refine_network.py:26-93,
score_network.py:27-90, network_modules.py:37-137).  Retires SURVEY.md hard
part #2 (torch->JAX weight-conversion fidelity).
"""
import importlib.util
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_MODELS = "/root/reference/learning/models"


class _Cfg(dict):
    """OmegaConf stand-in: the reference accesses cfg both as attribute
    (cfg.use_BN) and item (cfg['rot_rep'])."""

    __getattr__ = dict.__getitem__


@pytest.fixture(scope="module")
def ref_modules():
    import os

    if not os.path.isdir(REF_MODELS):
        pytest.skip("reference snapshot not mounted")
    # The reference modules do `from Utils import *` where Utils pulls in
    # warp/nvdiffrast/open3d.  None of the network classes use anything from
    # it, so satisfy the import with an empty stub.
    created_stub = False
    if "Utils" not in sys.modules:
        sys.modules["Utils"] = types.ModuleType("Utils")
        created_stub = True
    mods = {}
    try:
        for name in ("network_modules", "refine_network", "score_network"):
            spec = importlib.util.spec_from_file_location(name, f"{REF_MODELS}/{name}.py")
            mod = importlib.util.module_from_spec(spec)
            sys.modules[name] = mod
            spec.loader.exec_module(mod)
            mods[name] = mod
        yield mods
    finally:
        for name in ("network_modules", "refine_network", "score_network"):
            sys.modules.pop(name, None)
        if created_stub:
            sys.modules.pop("Utils", None)


def _rand_inputs(n, c_in=6, hw=40, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, c_in, hw, hw).astype(np.float32) * 0.3
    B = rng.randn(n, c_in, hw, hw).astype(np.float32) * 0.3
    return A, B


@pytest.mark.parametrize("rot_rep", ["axis_angle", "6d"])
def test_refine_net_forward_parity(ref_modules, rot_rep):
    import jax.numpy as jnp

    from sixdof_tpu.models.networks import RefineNet
    from sixdof_tpu.models.torch_convert import convert_refine_net

    cfg = _Cfg(use_BN=False, rot_rep=rot_rep)
    torch.manual_seed(0)
    tnet = ref_modules["refine_network"].RefineNet(cfg=cfg, c_in=6).eval()

    A, B = _rand_inputs(3)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(A), torch.from_numpy(B))

    params = convert_refine_net(tnet.state_dict())
    jnet = RefineNet(c_in=6, rot_rep=rot_rep, dtype=jnp.float32)
    jout = jnet.apply(
        {"params": params},
        jnp.asarray(A.transpose(0, 2, 3, 1)),
        jnp.asarray(B.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(jout["trans"]), tout["trans"].numpy(), atol=1e-4, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(jout["rot"]), tout["rot"].numpy(), atol=1e-4, rtol=1e-4
    )


def test_score_net_forward_parity(ref_modules):
    import jax.numpy as jnp

    from sixdof_tpu.models.networks import ScoreNetMultiPair
    from sixdof_tpu.models.torch_convert import convert_score_net

    cfg = _Cfg(use_BN=False)
    torch.manual_seed(1)
    tnet = ref_modules["score_network"].ScoreNetMultiPair(cfg=cfg, c_in=6).eval()

    L = 4
    A, B = _rand_inputs(2 * L, seed=1)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(A), torch.from_numpy(B), L=L)

    params = convert_score_net(tnet.state_dict())
    jnet = ScoreNetMultiPair(c_in=6, dtype=jnp.float32)
    jout = jnet.apply(
        {"params": params},
        jnp.asarray(A.transpose(0, 2, 3, 1)),
        jnp.asarray(B.transpose(0, 2, 3, 1)),
        L=L,
    )
    np.testing.assert_allclose(
        np.asarray(jout["score_logit"]), tout["score_logit"].numpy(), atol=1e-4, rtol=1e-4
    )


def test_full_checkpoint_roundtrip_parity(ref_modules, tmp_path):
    """Save a torch checkpoint the way the reference does ({'model': sd},
    predict_pose_refine.py:138-143) and load it through the predictor path."""
    import jax.numpy as jnp

    from sixdof_tpu.models.networks import RefineNet
    from sixdof_tpu.models.torch_convert import convert_refine_net, load_torch_checkpoint

    cfg = _Cfg(use_BN=False, rot_rep="axis_angle")
    torch.manual_seed(2)
    tnet = ref_modules["refine_network"].RefineNet(cfg=cfg, c_in=6).eval()
    path = tmp_path / "model_best.pth"
    torch.save({"model": tnet.state_dict()}, str(path))

    params = convert_refine_net(load_torch_checkpoint(str(path)))
    A, B = _rand_inputs(2, seed=3)
    with torch.no_grad():
        tout = tnet(torch.from_numpy(A), torch.from_numpy(B))
    jnet = RefineNet(c_in=6, rot_rep="axis_angle", dtype=jnp.float32)
    jout = jnet.apply(
        {"params": params},
        jnp.asarray(A.transpose(0, 2, 3, 1)),
        jnp.asarray(B.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(jout["trans"]), tout["trans"].numpy(), atol=1e-4, rtol=1e-4
    )
