"""Isolated maxsim_residual_pallas timing vs the factored codebook split.

Sweep the codebook split to see how much of the kernel's time the
in-VMEM TWO-HOT selector ((T, k1+k2) iota+compare lanes per tile, i.e.
B*C*Ld*(k1+k2) VPU lanes per batch) actually costs. Codec content is
irrelevant for timing, so the codebooks are random; correctness lives in
tests/test_factored_codec and scripts/smoke_residual_kernel.py.

Measured (one v5e chip, B=32, Lq=32, Ld=64, dim=128, nbits=2, tile_c=32):

    k1 x k2      C=256        C=1024
    64 x 64     1.51 ms      3.91 ms
    128x128     1.66 ms      4.22 ms
    256x256     1.78 ms      4.64 ms

So the selector is NOT the dominant term either: quartering k1+k2
(512 -> 128 columns) recovers only ~0.7 ms of the 4.64 ms at C=1024.
The kernel's floor is per-grid-invocation overhead + the narrow
per-plane work at tile_c=32 (grid B * C/tile_c = 1024 invocations);
see the tile_c sweep in scripts/micro_factored_tile.py.

Run: python scripts/micro_factored_k.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from ravqa_tpu.ops.residual import maxsim_residual_pallas

B, LQ, DIM, LD, NBITS = 32, 32, 128, 64, 2
rng = np.random.default_rng(0)
q = jnp.asarray(rng.normal(size=(B, LQ, DIM)).astype(np.float32))
weights = jnp.asarray(np.array([-0.1, -0.02, 0.02, 0.1], np.float32))

print("backend:", jax.default_backend(), flush=True)

for k1, k2 in ((64, 64), (128, 128), (256, 256)):
    coarse = jnp.asarray(rng.normal(size=(k1, DIM)).astype(np.float32))
    fine = jnp.asarray(rng.normal(size=(k2, DIM)).astype(np.float32))
    centroids = jnp.zeros((k1 * k2, DIM), jnp.float32)  # shape-only
    for C in (256, 1024):
        cg = jnp.asarray(rng.integers(0, k1 * k2, (B, C, LD))
                         .astype(np.int32))
        pg = jnp.asarray(rng.integers(0, 256, (B, C, LD, DIM * NBITS // 8))
                         .astype(np.uint8))
        mg = jnp.ones((B, C, LD), jnp.int8)
        sg = jnp.asarray(rng.uniform(0.5, 1.5, (B, C, LD))
                         .astype(np.float32))

        @jax.jit
        def run(qq, cg=cg, pg=pg, mg=mg, sg=sg, centroids=centroids,
                coarse=coarse, fine=fine):
            def body(carry, _):
                qv, seed = carry
                sc = maxsim_residual_pallas(
                    qv, cg, pg, mg, centroids, weights, sg, coarse, fine,
                    nbits=NBITS, tile_c=32)
                m = jnp.max(sc, axis=1)
                return (qv + (m * 1e-9)[:, None, None], seed + 1), ()
            (qv, _), _ = jax.lax.scan(body, (qq, jnp.int32(0)), None,
                                      length=32)
            return qv[:1, :1, :1]

        _ = np.asarray(run(q))
        t0 = time.perf_counter()
        _ = np.asarray(run(q))
        dt = (time.perf_counter() - t0) / 32
        print(f"k{k1}x{k2} C{C}: {dt * 1e3:.2f} ms/batch", flush=True)
