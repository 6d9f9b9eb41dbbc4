"""Microbench: the field-backward scatter-add at campaign scale, 4 ways.

The object-field train step is dominated by the hash-table gradient: a
duplicate-index scatter-add of (8, L, N) = 67M rows into the (total, 2)
table (r3s4 notes; reference torch-ngp does this with fp16 atomicAdd,
gridencoder.cu:248 — TPUs have no atomics, so the lowering strategy is the
whole game).  This probe times the candidate lowerings on REAL index
distributions (hash_grid_indices of box-band sample points, so duplicate
density matches training):

  a) f32 .at[idx].add per feature column            (current autodiff path)
  b) bf16 scatter, f32 accumulate-after             (lane-packed updates)
  c) one global sort_key_val + sorted segment_sum   (r3's 128-sort attempt,
                                                     redone as ONE sort)
  d) 16 per-level scatters                          (smaller index spaces)

Usage: python tools/exp_scatter.py [n_iters]
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

from sixdof_tpu.models.object_field import HashGridSpec, hash_grid_indices
from sixdof_tpu.utils import enable_compile_cache


def real_indices(spec, n_pts=524288, seed=0):
    """Index distribution matching training: points along rays in the box.
    Arrays STAY on device — (8,L,N) int32 is 268 MB, a death sentence to pull
    through the axon tunnel."""
    r = np.random.RandomState(seed)
    o = r.uniform(-0.9, 0.9, (2048, 3)).astype(np.float32)
    d = r.normal(size=(2048, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t = np.linspace(0, 1.2, n_pts // 2048, dtype=np.float32)
    pts = (o[:, None] + d[:, None] * t[None, :, None]).reshape(-1, 3)
    pts = np.clip(pts, -0.999, 0.999)
    idx, w = jax.jit(hash_grid_indices, static_argnums=1)(jnp.asarray(pts), spec)
    return idx, w  # device-resident (8,L,N)


def timeit(fn, args, n_iters=8, label=""):
    """n async dispatches drain serially on device; ONE scalar readback syncs."""
    f = jax.jit(fn)
    out = f(*args)
    float(jnp.sum(out[:8].astype(jnp.float32)))  # compile + settle
    t0 = time.perf_counter()
    for _ in range(n_iters):
        out = f(*args)
    float(jnp.sum(out[:8].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n_iters
    print(json.dumps({label: round(dt, 4)}), flush=True)
    return dt


def main(n_iters=8):
    enable_compile_cache()
    results = {}
    for log2 in (22, 19):
        spec = HashGridSpec(log2_hashmap_size=log2)
        total = spec.offsets[-1]
        idx_d, w = real_indices(spec)
        cot = jax.random.normal(jax.random.PRNGKey(1), idx_d.shape, jnp.float32)
        flat_idx = idx_d.reshape(-1)
        flat_cot = cot.reshape(-1)
        sizes = [spec.level_size(l) for l in range(spec.n_levels)]
        offs = spec.offsets

        def scat_f32(fi, fc):
            return jnp.zeros((total,), jnp.float32).at[fi].add(fc)

        def scat_bf16(fi, fc):
            return jnp.zeros((total,), jnp.bfloat16).at[fi].add(
                fc.astype(jnp.bfloat16)).astype(jnp.float32)

        def sort_seg(fi, fc):
            si, sc = jax.lax.sort((fi, fc), num_keys=1)
            return jax.ops.segment_sum(sc, si, num_segments=total,
                                       indices_are_sorted=True)

        def per_level(i8ln, c8ln):
            outs = []
            for l in range(spec.n_levels):
                li = (i8ln[:, l] - offs[l]).reshape(-1)
                lc = c8ln[:, l].reshape(-1)
                outs.append(jnp.zeros((sizes[l],), jnp.float32).at[li].add(lc))
            return jnp.concatenate(outs)

        r = {}
        r["a_f32_scatter"] = timeit(scat_f32, (flat_idx, flat_cot), n_iters,
                                    f"log2={log2} a_f32_scatter")
        r["b_bf16_scatter"] = timeit(scat_bf16, (flat_idx, flat_cot), n_iters,
                                     f"log2={log2} b_bf16_scatter")
        r["c_sort_segsum"] = timeit(sort_seg, (flat_idx, flat_cot), n_iters,
                                    f"log2={log2} c_sort_segsum")
        r["d_per_level"] = timeit(per_level, (idx_d, cot), n_iters,
                                  f"log2={log2} d_per_level")
        results[f"log2={log2}"] = r
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8)
