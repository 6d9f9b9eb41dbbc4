"""Device-mesh construction + sharding rules for multi-chip execution.

The reference is single-GPU (SURVEY.md §2.3: torch.distributed imported but
never used).  The TPU-native scale-out maps the workload's real parallel axes
onto a `jax.sharding.Mesh`:

- **hypothesis axis** (the 252-pose batch of register()) shards across chips
  for render-and-compare — embarrassingly parallel, collective-free until the
  final argmax;
- **data axis** for training batches (DP, gradient psum over ICI);
- **model axis** for tensor-parallel sharding of the 512-wide transformer /
  conv channels (TP) — more than this net needs at 25M params, but wired so
  the same code scales to larger heads.

All sharding goes through NamedSharding/PartitionSpec; XLA inserts the
collectives (all-reduce over `data`, all-gather/reduce-scatter over `model`).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_data=None, n_model=1, devices=None):
    """(data, model) mesh over available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    devs = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(devs, axis_names=("data", "model"))


def data_sharding(mesh):
    """Shard the leading (batch / hypothesis) axis over `data`."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def param_shardings(params, mesh, min_size=256):
    """TP rule: shard the last (output-feature) dim of large >=2-D kernels
    over `model`; everything else replicated.  Returns a pytree of
    NamedShardings matching `params`."""
    n_model = mesh.shape["model"]

    def rule(leaf):
        if (
            n_model > 1
            and hasattr(leaf, "ndim")
            and leaf.ndim >= 2
            and leaf.shape[-1] >= min_size
            and leaf.shape[-1] % n_model == 0
        ):
            spec = [None] * (leaf.ndim - 1) + ["model"]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, params)


def shard_batch(batch, mesh):
    """Place a host batch onto the mesh, sharded over `data`."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def pad_hypotheses(poses, mesh):
    """Pad the hypothesis batch to a multiple of the mesh's data axis by
    repeating the first pose (duplicates refine/score identically; callers
    slice back to the original count)."""
    import jax.numpy as jnp

    n = poses.shape[0]
    m = mesh.shape["data"]
    pad = (-n) % m
    if pad:
        poses = jnp.concatenate([poses, jnp.broadcast_to(poses[:1], (pad, 4, 4))])
    return poses, n


def shard_restarts(init_tfs, max_dists, mesh):
    """Shard the ICP random-restart axis (SURVEY.md §2.3 "hypothesis axis")
    over `data`: pad to a multiple of the data axis by repeating the last
    restart (duplicates converge identically; callers slice fit/rmse/tf back
    to n).  Each restart's point-to-plane solve reads the replicated clouds,
    so GSPMD runs the restarts collective-free until the best-pick argmin."""
    import jax.numpy as jnp

    n = init_tfs.shape[0]
    m = mesh.shape["data"]
    pad = (-n) % m
    if pad:
        init_tfs = jnp.concatenate([init_tfs, jnp.broadcast_to(init_tfs[-1:], (pad, 4, 4))])
        max_dists = jnp.concatenate([max_dists, jnp.broadcast_to(max_dists[-1:], (pad,))])
    sh = data_sharding(mesh)
    return jax.device_put(init_tfs, sh), jax.device_put(max_dists, sh), n


def shard_rays(dirs, mask, mesh):
    """Shard the defect-ray axis over `data`: pad with masked-off rays (the
    raytrace returns +inf for them) and place both arrays sharded."""
    import jax.numpy as jnp

    n = dirs.shape[0]
    m = mesh.shape["data"]
    pad = (-n) % m
    if pad:
        dirs = jnp.concatenate([dirs, jnp.zeros((pad, 3), dirs.dtype)])
        mask = jnp.concatenate([mask, jnp.zeros((pad,), mask.dtype)])
    sh = data_sharding(mesh)
    return jax.device_put(dirs, sh), jax.device_put(mask, sh), n


def shard_field_rays(batch, mesh):
    """Shard an object-field ray minibatch (R,11) over `data` — DP for the
    neural-object-field train step (SURVEY.md §2.3 "shard ray batches";
    reference nerf_runner.py:507-585 is single-GPU).

    Each device samples/renders/backprops its ray slice; the per-level
    hash-table gradient scatters (object_field.hash_grid_encode's custom
    vjp) stay device-local over the slice, and XLA all-reduces the
    replicated-parameter gradients over ICI.  R must divide the data axis:
    the loss is a mean over rays, so padded rows would bias it rather than
    being benign duplicates.
    """
    if batch.shape[0] % mesh.shape["data"]:
        raise ValueError(
            f"ray batch of {batch.shape[0]} does not divide the data axis "
            f"({mesh.shape['data']}); pick n_rand as a multiple"
        )
    return jax.device_put(batch, data_sharding(mesh))


def shard_hypotheses(poses, mesh):
    """Place a (N,4,4) hypothesis batch sharded over the `data` axis.

    Everything downstream of the poses input — crop transforms, hypothesis
    renders, network forward, pose update — is per-hypothesis, so GSPMD
    propagates this sharding through the whole register pipeline with zero
    collectives until the host reads the scores (SURVEY.md §2.3: "shard the
    hypothesis axis")."""
    padded, n = pad_hypotheses(poses, mesh)
    return jax.device_put(padded, data_sharding(mesh)), n
