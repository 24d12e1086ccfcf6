"""maxsim_residual_pallas timing vs tile_c (candidate docs per grid step).

micro_factored_k.py showed the two-hot selector width explains only
~0.7 ms of the kernel's 4.6 ms at (B=32, C=1024, 256x256); the FLOP/VPU
model sums to ~2 ms, leaving ~2.5 ms unexplained — consistent with
per-grid-invocation overhead at grid = B * C/tile_c = 1024 steps.
Doubling tile_c halves the step count (VMEM permitting: the kernel's
(tile_c*Ld, k1+k2) selector temporary is the limiting block).

Run: python scripts/micro_factored_tile.py
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

for k1, k2 in ((64, 64), (256, 256)):
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
        for tc in (32, 64, 128):
            if C % tc:
                continue

            @jax.jit
            def run(qq, cg=cg, pg=pg, mg=mg, sg=sg, centroids=centroids,
                    coarse=coarse, fine=fine, tc=tc):
                def body(carry, _):
                    qv, seed = carry
                    sc = maxsim_residual_pallas(
                        qv, cg, pg, mg, centroids, weights, sg, coarse,
                        fine, nbits=NBITS, tile_c=tc)
                    m = jnp.max(sc, axis=1)
                    return (qv + (m * 1e-9)[:, None, None], seed + 1), ()
                (qv, _), _ = jax.lax.scan(body, (qq, jnp.int32(0)), None,
                                          length=32)
                return qv[:1, :1, :1]

            try:
                _ = np.asarray(run(q))
            except Exception as e:                 # VMEM overflow etc.
                print(f"k{k1}x{k2} C{C} tc{tc}: FAILED "
                      f"({type(e).__name__}: {str(e)[:120]})", flush=True)
                continue
            t0 = time.perf_counter()
            _ = np.asarray(run(q))
            dt = (time.perf_counter() - t0) / 32
            print(f"k{k1}x{k2} C{C} tc{tc}: {dt * 1e3:.2f} ms/batch",
                  flush=True)
