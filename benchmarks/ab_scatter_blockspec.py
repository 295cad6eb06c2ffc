"""Same-session A/B: zero-copy BlockSpec patch scatter vs the XLA
relayout-copy path, at the bench config (2.4K faces) and 158K faces.

The "old" arm reproduces the copy path exactly: the (16,128) patch
transpose as XLA ops, then the strip kernel via ``patch=None`` on the
reordered arrays.

Usage: PYTHONPATH=. python benchmarks/ab_scatter_blockspec.py
"""

import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

TEAPOT = "/root/reference/tests_torch/data/teapot.obj"


def main():
    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        resolve_gather_pallas, scatter_to_faces_pallas,
    )
    from scaling import subdivide

    def device_time(step, carry, n1=24, n2=120):
        def wall(N):
            @jax.jit
            def run(v):
                def body(v, _):
                    return step(v), None
                v, _ = jax.lax.scan(body, v, None, length=N)
                return v
            o = run(carry + jnp.float32(1e-5))
            jax.block_until_ready(o)
            _ = float(jnp.sum(o))
            best = float("inf")
            for r in range(3):
                vi = carry + jnp.float32(1e-6 * r)
                jax.block_until_ready(vi)
                t0 = time.perf_counter()
                o = run(vi)
                jax.block_until_ready(o)
                _ = float(jnp.sum(o))
                best = min(best, time.perf_counter() - t0)
            return best
        w1, w2 = wall(n1), wall(n2)
        return max(w2 - w1, 0.0) / (n2 - n1) * 1e3

    eye = np.array(nr.get_points_from_angles(2.732, 30, 0), "float32")

    for level, nn in [(0, (48, 240)), (3, (24, 120))]:
        v, f = nr.load_obj(TEAPOT)
        for _ in range(level):
            v, f = subdivide(v, f)
        nf = f.shape[0]
        S = 512
        tv = perspective(look_at(jnp.asarray(v[None]), jnp.asarray(eye)),
                         angle=30.0)
        fv = jnp.asarray(np.asarray(jnp.take(tv, jnp.asarray(f), axis=1)))
        fim = np.asarray(resolve_gather_pallas(fv, None, S)[0])
        D = 6
        g = jnp.asarray(
            np.random.RandomState(0).randn(1, D, S, S).astype("f"))
        ph, pw = 16, 128
        ny, nx = S // ph, S // pw

        def new_step(x):
            return x * (1.0 + 1e-12 * scatter_to_faces_pallas(
                x, fim, nf, planar=True).sum())

        def old_step(x):
            fim_r = fim.reshape(1, ny, ph, nx, pw).transpose(0, 1, 3, 2, 4)
            xr = x.reshape(1, D, ny, ph, nx, pw).transpose(
                0, 1, 2, 4, 3, 5).reshape(1, D, ny * nx * ph, pw)
            out = scatter_to_faces_pallas(
                xr, np.ascontiguousarray(fim_r), nf, planar=True, patch=None)
            return x * (1.0 + 1e-12 * out.sum())

        n1, n2 = nn
        t_new = device_time(new_step, g, n1, n2)
        t_old = device_time(old_step, g, n1, n2)
        # interleave a second round to bound drift
        t_new2 = device_time(new_step, g, n1, n2)
        t_old2 = device_time(old_step, g, n1, n2)
        print("faces %6d: blockspec %.3f/%.3f ms  copy-path %.3f/%.3f ms"
              % (nf, t_new, t_new2, t_old, t_old2))


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "benchmarks")
    main()
