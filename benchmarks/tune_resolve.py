"""Sweep the windowed-resolve scheduling space on device.

(row_window, group_size) trade vector-window granularity against
union-bbox growth and setup amortization: tiny faces (large meshes)
want 8-row windows + wide groups, big faces (small meshes) want narrow
groups.  Prints resolve-forward and full-step device times per config
so the defaults in resolve_gather_pallas can be set from measurement.

Usage: PYTHONPATH=. python benchmarks/tune_resolve.py [--levels 0 2 3]
"""

import argparse
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

TEAPOT = "/root/reference/tests_torch/data/teapot.obj"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--levels", type=int, nargs="*", default=[0, 2, 3],
                    help="subdivision levels (0=2.4K, 2=39K, 3=158K, 4=631K)")
    ap.add_argument("--iters", type=int, nargs=2, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
    from neural_renderer_v2_pytorch_tpu.ops.rasterize import (
        RasterizeHyperparam, rasterize_silhouettes,
    )
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        resolve_gather_pallas,
    )
    from scaling import subdivide

    print("platform:", jax.default_backend())
    eye = np.array(nr.get_points_from_angles(2.732, 30, 0), "float32")

    def device_time(step, carry, n1, n2):
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
            for r in range(2):
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

    v0, f0 = nr.load_obj(TEAPOT)
    S = 512

    for lvl in sorted(set(args.levels)):
        v, f = v0, f0
        for _ in range(lvl):
            v, f = subdivide(v, f)
        nf = f.shape[0]
        n1, n2 = args.iters or ((30, 120) if nf < 50_000 else (6, 24))

        r = nr.Renderer()
        r.viewpoints = nr.get_points_from_angles(2.732, 30, 0)
        tv = jax.device_put(r.transform_vertices(jnp.asarray(v[None])))
        fv = jax.device_put(jnp.take(tv, jnp.asarray(f), axis=1))

        print("== %dK faces (level %d), 512^2 silhouette ==" % (nf // 1000, lvl))
        for rw in (8, 16):
            for G in (2, 4, 8, 16):
                def fwd(x, rw=rw, G=G):
                    fim, fvm, _ = resolve_gather_pallas(
                        x, None, S, 0.1, 100.0, True,
                        row_window=rw, group_size=G, latch_z=False,
                    )
                    return x * (1.0 + 1e-9 * jnp.sum(fvm))
                t = device_time(fwd, fv, n1, n2)
                print("  rw=%2d G=%2d  resolve fwd %8.3f ms" % (rw, G, t))

        # full step at the per-level best is measured by scaling.py once
        # defaults are updated; here only the current-default step as a
        # sanity anchor
        F = np.asarray(f)
        hp = RasterizeHyperparam(image_size=S, anti_aliasing=False)

        def step(x):
            def loss(x):
                tvv = perspective(look_at(x, eye), angle=30.0)
                return jnp.sum(rasterize_silhouettes(tvv, F, None, hp) ** 2)
            return x - 1e-9 * jax.grad(loss)(x)
        Vs = jnp.asarray(v[None])
        print("  current-default full step %8.3f ms"
              % device_time(step, Vs, n1, n2))


if __name__ == "__main__":
    main()
