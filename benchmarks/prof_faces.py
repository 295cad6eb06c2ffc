"""Component profile along the face-count axis (the 631K superlinear hunt).

N-difference-times each per-face pipeline component at subdivision levels
of the teapot, so the superlinear terms of the 512^2 silhouette step can
be attributed: resolve fwd, face-vertex gather fwd, slot scatter bwd,
pixel->face scatter bwd, camera transform, constants chunking, occupancy
build.

Usage: PYTHONPATH=. python benchmarks/prof_faces.py [--levels 3 4]
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
    ap.add_argument("--levels", type=int, nargs="*", default=[3, 4])
    ap.add_argument("--iters", type=int, nargs=2, default=[6, 24])
    args = ap.parse_args()
    n1, n2 = args.iters

    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops import gather_resolve as gr
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
    from neural_renderer_v2_pytorch_tpu.ops.rasterize import (
        RasterizeHyperparam, rasterize_silhouettes,
    )
    from neural_renderer_v2_pytorch_tpu.ops.resolve import face_constants
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        resolve_gather_pallas, scatter_to_faces_pallas,
    )
    from scaling import subdivide

    print("platform:", jax.default_backend())
    eye = np.array(nr.get_points_from_angles(2.732, 30, 0), "float32")
    S = 512

    def device_time(step, carry):
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
    for lvl in sorted(set(args.levels)):
        v, f = v0, f0
        for _ in range(lvl):
            v, f = subdivide(v, f)
        nf, nv = f.shape[0], v.shape[0]
        print("== level %d: %dK faces, %dK vertices ==" % (lvl, nf // 1000, nv // 1000))

        r = nr.Renderer()
        r.viewpoints = nr.get_points_from_angles(2.732, 30, 0)
        tv = jax.device_put(r.transform_vertices(jnp.asarray(v[None])))
        F = np.asarray(f)
        fv0 = jax.device_put(jnp.take(tv, jnp.asarray(F), axis=1))
        V = jnp.asarray(v[None])

        def rep(name, t):
            print("  %-36s %9.3f ms  (%6.3f us/face)" % (name, t, t * 1e3 / nf))

        # camera: look_at + perspective on [1, nv, 3]
        def cam(x):
            o = perspective(look_at(x, eye), angle=30.0)
            return x * (1.0 + 1e-9 * jnp.sum(o))
        rep("camera (look_at+perspective)", device_time(cam, V))

        # face-vertex gather fwd (the production path incl. backend pick)
        occ = gr.slot_occupancy(F, nv)
        def gath(x):
            o = gr.gather_face_vertices(
                x, jnp.asarray(F), "pallas" if occ is not None else "xla", occ
            )
            return x * (1.0 + 1e-9 * jnp.sum(o))
        rep("face-vertex gather fwd", device_time(gath, tv))

        # slot scatter bwd (vertex-gradient transpose)
        def slotbwd(x):
            g = jax.grad(
                lambda t: jnp.sum(
                    gr.gather_face_vertices(
                        t, jnp.asarray(F),
                        "pallas" if occ is not None else "xla", occ,
                    ) ** 2
                )
            )(x)
            return x + 1e-9 * g
        rep("gather fwd+slot scatter bwd", device_time(slotbwd, tv))

        # per-face constants + chunk layout (the kernel's XLA prep)
        def consts(x):
            cs = face_constants(x)
            pad = (-nf) % 256
            g = jnp.pad(cs, ((0, 0), (0, pad), (0, 0)))
            ch = g.reshape(1, -1, 256, 17).transpose(0, 1, 3, 2)
            return x * (1.0 + 1e-9 * jnp.sum(ch))
        rep("face_constants + chunk layout", device_time(consts, fv0))

        # resolve fwd (xy latch, current defaults)
        def res(x):
            fim, fvm, _ = resolve_gather_pallas(
                x, None, S, 0.1, 100.0, True, latch_z=False,
            )
            return x * (1.0 + 1e-9 * jnp.sum(fvm))
        rep("resolve+latch fwd (defaults)", device_time(res, fv0))

        # pixel->face scatter bwd incl. on-device occupancy build
        fim0 = jax.jit(
            lambda x: resolve_gather_pallas(x, None, S, 0.1, 100.0, True,
                                            latch_z=False)[0]
        )(fv0)
        g6 = jax.device_put(
            jnp.asarray(np.random.RandomState(0).rand(1, 6, S, S).astype("f"))
        )
        fim_np = np.asarray(fim0)

        def pixscat(x):
            o = scatter_to_faces_pallas(x, jnp.asarray(fim_np), nf, planar=True)
            return x * (1.0 + 1e-9 * jnp.sum(o))
        rep("pixel->face scatter bwd (6 pl)", device_time(pixscat, g6))

        # full silhouette step
        hp = RasterizeHyperparam(image_size=S, anti_aliasing=False)

        def step(x):
            def loss(x):
                tvv = perspective(look_at(x, eye), angle=30.0)
                return jnp.sum(rasterize_silhouettes(tvv, F, None, hp) ** 2)
            return x - 1e-9 * jax.grad(loss)(x)
        rep("FULL silhouette step", device_time(step, V))


if __name__ == "__main__":
    main()
