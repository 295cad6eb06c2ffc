"""Batch-axis component profiler: where does per-image cost grow with bs?

Observed (scaling.py): silhouette 256^2 AA per-image step cost is
~0.51 ms at bs=8 but ~0.75 ms at bs=30.  This harness times the pipeline
stages at several batch sizes with the same chained-scan protocol as
benchmarks/scaling.py (see README "Measurement caveats") to attribute
the growth.

Usage: python benchmarks/prof_batch.py [--bs 1 8 30] [--image-size 256]
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
    p = argparse.ArgumentParser()
    p.add_argument("--bs", type=int, nargs="+", default=[1, 8, 30])
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--iters", type=int, nargs=2, default=[30, 120])
    args = p.parse_args()
    n1, n2 = args.iters

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

    print("platform:", jax.default_backend())

    def device_time(step, carry, cycles=3):
        # interleaved best-of-N differencing (bench.py protocol; single
        # cycles swing +-15% on the shared tunneled chip)
        def make(N):
            @jax.jit
            def run(v):
                def body(v, _):
                    return step(v), None
                v, _ = jax.lax.scan(body, v, None, length=N)
                return v
            return run
        runs = {N: make(N) for N in (n1, n2)}
        for run in runs.values():
            o = run(carry + jnp.float32(1e-5))
            jax.block_until_ready(o)
            _ = float(jnp.sum(o))

        def wall(N, cyc):
            best = float("inf")
            for r in range(2):
                vi = carry + jnp.float32(1e-6 * (2 * cyc + r + 1))
                jax.block_until_ready(vi)
                t0 = time.perf_counter()
                o = runs[N](vi)
                jax.block_until_ready(o)
                _ = float(jnp.sum(o))
                best = min(best, time.perf_counter() - t0)
            return best

        best = float("inf")
        for cyc in range(cycles):
            w1, w2 = wall(n1, cyc), wall(n2, cyc)
            best = min(best, max(w2 - w1, 0.0) / (n2 - n1) * 1e3)
        return best

    v0, f0 = nr.load_obj(TEAPOT)
    F = np.asarray(f0)
    hp = RasterizeHyperparam(image_size=args.image_size)
    S = args.image_size * 2  # internal render size with AA

    for bs in args.bs:
        eyes = np.stack([
            np.array(nr.get_points_from_angles(2.732, 30, a), "float32")
            for a in np.linspace(0, 360, bs, endpoint=False)])
        if bs == 1:
            eyes = eyes[0]
        V = jnp.asarray(np.tile(v0[None], (bs, 1, 1)))
        print("== bs=%d ==" % bs)

        def rep(name, t):
            print("  %-34s %9.3f ms  (%7.3f ms/img)" % (name, t, t / bs))

        # full fwd+bwd step (scaling.py's headline row)
        def full(v):
            def loss(v):
                tv = perspective(look_at(v, eyes), angle=30.0)
                return jnp.sum(rasterize_silhouettes(tv, F, None, hp) ** 2)
            return v - 1e-9 * jax.grad(loss)(v)
        rep("full step fwd+bwd", device_time(full, V))

        # forward only
        def fwd(v):
            tv = perspective(look_at(v, eyes), angle=30.0)
            o = rasterize_silhouettes(tv, F, None, hp)
            return v * (1.0 + 1e-9 * jnp.sum(o))
        rep("forward only", device_time(fwd, V))

        # resolve only (fused kernel on pre-gathered faces)
        r = nr.Renderer()
        r.viewpoints = eyes
        tv0 = jax.device_put(
            perspective(look_at(V, eyes), angle=30.0))
        fv0 = jax.device_put(jnp.take(tv0, jnp.asarray(F), axis=1))
        def res(fv):
            idx, coords, _ = resolve_gather_pallas(
                fv, None, image_size=S, latch_z=False)
            return fv * (1.0 + 1e-9 * (jnp.sum(coords)
                                       + jnp.sum(idx.astype(jnp.float32))))
        rep("resolve (fused kernel, %d^2)" % S, device_time(res, fv0))

        # rasterize fwd+bwd on pre-transformed vertices (drops camera)
        def rast(tv):
            def loss(tv):
                return jnp.sum(rasterize_silhouettes(tv, F, None, hp) ** 2)
            return tv - 1e-9 * jax.grad(loss)(tv)
        rep("rasterize fwd+bwd (no camera)", device_time(rast, tv0))

        # rasterize fwd+bwd, AA off at same internal size
        hp_noaa = RasterizeHyperparam(
            image_size=S, anti_aliasing=False)
        def rast_noaa(tv):
            def loss(tv):
                return jnp.sum(rasterize_silhouettes(tv, F, None, hp_noaa) ** 2)
            return tv - 1e-9 * jax.grad(loss)(tv)
        rep("rasterize fwd+bwd %d^2 no-AA" % S, device_time(rast_noaa, tv0))

        # NMR differentiation op alone, fwd+bwd on [bs, 1, S, S] images
        # (coordinates derived from the carry so nothing device-resident
        # is closure-captured -- see README measurement caveats)
        from neural_renderer_v2_pytorch_tpu.ops.differentiation import (
            differentiation,
        )
        base = jnp.ones((bs, 1, S, S), jnp.float32) * 0.5
        def nmr(x):
            def loss(x):
                coords = jnp.concatenate([x, x], axis=1)
                o = differentiation(x, coords)
                return jnp.sum(o ** 2)
            return x - 1e-9 * jax.grad(loss)(x)
        rep("NMR differentiation fwd+bwd", device_time(nmr, base))

        # resolve custom-vjp boundary alone: fwd + pixel->face scatter bwd
        from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import (
            resolve_and_gather,
        )
        def resbwd(fv):
            def loss(fv):
                _, fvm, _ = resolve_and_gather(
                    fv, None, 0, S, 0.1, 100.0, True, "pallas", None, False)
                return jnp.sum(fvm ** 2)
            return fv - 1e-9 * jax.grad(loss)(fv)
        rep("resolve fwd + px->face bwd", device_time(resbwd, fv0))


if __name__ == "__main__":
    main()
