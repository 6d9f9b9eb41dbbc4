"""Measure the object-field train step on the real device (synced timing).

The r3 campaign measured 6.5 s/step at 2048 rays x 256 samples with the
unrolled 16x8 encode, ~5.5 s of it the hash-table scatter-add backward.
This probe times the CURRENT encode across a config matrix so each lever
(vectorized single-scatter encode, hashmap size, sample count) gets a real
number before a 1000-step campaign is launched.

Timing technique: chain steps through donated carries and read ONE scalar
at the end (tunnel-safe; block_until_ready alone returns early over axon —
see tools/profile_raster_chunk.py notes).

Usage: python tools/profile_field_step.py [n_steps_per_probe]
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
import optax

from sixdof_tpu.models.object_field import (
    FieldParams, HashGridSpec, ObjectFieldConfig, init_field, make_loss_fn,
)
from sixdof_tpu.utils import enable_compile_cache


def synth_rays(n_rows=400_000, n_frames=8, seed=0):
    """Synthetic ray table in the make_frame_rays layout (object_field.py)."""
    r = np.random.RandomState(seed)
    o = r.uniform(-0.9, 0.9, (n_rows, 3))
    d = r.normal(size=(n_rows, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rgb = r.uniform(0, 1, (n_rows, 3))
    depth = r.uniform(0.1, 1.2, (n_rows, 1))
    depth[r.uniform(size=(n_rows, 1)) < 0.1] = 99.0  # BAD_DEPTH rays
    fid = r.randint(0, n_frames, (n_rows, 1)).astype(np.float64)
    return np.concatenate([o, d, rgb, depth, fid], axis=-1).astype(np.float32)


def probe(cfg: ObjectFieldConfig, spec: HashGridSpec, rays, n_steps=10, seed=0):
    n_frames = int(rays[:, 10].max()) + 1
    params = init_field(jax.random.PRNGKey(seed), spec, n_frames,
                        cfg.frame_feat_dim, cfg.sh_degree)
    tx = optax.adam(cfg.lrate)
    opt_state = tx.init(params)
    loss_fn = make_loss_fn(cfg, spec, 1.0)
    n_rand = int(cfg.n_rand)

    def step(params, opt_state, rays, key):
        kidx, key = jax.random.split(key)
        idx = jax.random.randint(kidx, (n_rand,), 0, rays.shape[0])
        batch = rays[idx]
        (loss, parts), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, batch, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    step_j = jax.jit(step, donate_argnums=(0, 1))
    rays_dev = jnp.asarray(rays)
    key = jax.random.PRNGKey(1)

    t0 = time.perf_counter()
    params, opt_state, loss = step_j(params, opt_state, rays_dev, key)
    float(loss)  # sync: compile + first step
    t_compile = time.perf_counter() - t0

    t0 = time.perf_counter()
    for i in range(n_steps):
        key, sub = jax.random.split(key)
        params, opt_state, loss = step_j(params, opt_state, rays_dev, sub)
    lf = float(loss)  # one scalar readback syncs the whole chain
    t_steps = (time.perf_counter() - t0) / n_steps
    table_mb = params.table.size * 4 / 1e6
    del params, opt_state
    return {"compile_s": round(t_compile, 2), "step_s": round(t_steps, 4),
            "loss": round(lf, 4), "table_mb": round(table_mb, 1)}


def main(n_steps=10):
    enable_compile_cache()
    rays = synth_rays()
    print(f"device: {jax.devices()[0].device_kind}", flush=True)

    matrix = [
        ("log2=22 (reference cfg)", ObjectFieldConfig(), HashGridSpec()),
        ("log2=19", ObjectFieldConfig(), HashGridSpec(log2_hashmap_size=19)),
        ("log2=19 bf16-ok?", ObjectFieldConfig(),
         HashGridSpec(log2_hashmap_size=19, finest_res=256, n_levels=14)),
        ("log2=22 half-samples", ObjectFieldConfig(n_samples=64, n_samples_around_depth=64),
         HashGridSpec()),
    ]
    results = {}
    for name, cfg, spec in matrix:
        try:
            r = probe(cfg, spec, rays, n_steps)
        except Exception as e:  # OOM etc — record and continue
            r = {"error": str(e)[:200]}
        results[name] = r
        print(json.dumps({name: r}), flush=True)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 10)
