"""Chained-step component profiler (scan-differenced device times).

Every iteration's input depends on the previous output (a tiny additive
perturbation), so no host/relay layer can elide, cache, or reorder the
device work.  Each stage runs as ONE jitted ``lax.scan`` chain at two
lengths and the difference is divided out -- pure device time, no
per-step dispatch (the old per-call loop buried sub-ms stages under the
~1 ms tunnel dispatch cost).

Usage: PYTHONPATH=. python benchmarks/prof.py [--image-size 256] [--iters 24]
"""

import argparse
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

DEFAULT_OBJ = "/root/reference/tests_torch/data/teapot.obj"


def main():
    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops import shading
    from neural_renderer_v2_pytorch_tpu.ops.differentiation import differentiation
    from neural_renderer_v2_pytorch_tpu.ops.rasterize import (
        RasterizeHyperparam,
        rasterize_silhouettes,
        rasterize_rgb,
        RasterizeParam,
    )
    from neural_renderer_v2_pytorch_tpu.ops.resolve import weight_planes_from_gathered
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        compute_face_index_map_pallas,
        resolve_gather_pallas,
    )

    p = argparse.ArgumentParser()
    p.add_argument("--obj", default=DEFAULT_OBJ)
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=24)
    args = p.parse_args()

    v, f = nr.load_obj(args.obj)
    fj = jnp.asarray(f)
    r = nr.Renderer()
    r.viewpoints = nr.get_points_from_angles(2.732, 30, 45)
    tv0 = jax.device_put(r.transform_vertices(jnp.asarray(v[None])))
    fv0 = jax.device_put(jnp.take(tv0, fj, axis=1))
    S = args.image_size * 2  # render size with AA
    N = args.iters

    def chain(label, step, x0):
        """step: x -> x_next; scan-differenced device time per step."""
        def wall(n):
            @jax.jit
            def run(x):
                def body(x, _):
                    return step(x), None
                x, _ = jax.lax.scan(body, x, None, length=n)
                return x
            o = run(x0 + jnp.float32(1e-5))
            jax.block_until_ready(o)
            _ = float(jnp.sum(o))
            best = float("inf")
            for r in range(2):
                xi = x0 + jnp.float32(1e-6 * r)
                jax.block_until_ready(xi)
                t0 = time.perf_counter()
                o = run(xi)
                jax.block_until_ready(o)
                _ = float(jnp.sum(o))
                best = min(best, time.perf_counter() - t0)
            return best
        t = max(wall(5 * N) - wall(N), 0.0) / (4 * N) * 1e3
        print("%-40s %8.3f ms" % (label, t))

    def perturb(x, probe):
        # large enough to actually change x's bits (defeats relay-side
        # memoization of identical (program, input) pairs), small enough
        # to not change the workload
        return x * (1.0 + 1e-6 * jnp.sin(probe.astype(jnp.float32)))

    # --- resolve kernels ---
    def s_resolve(x):
        fim = compute_face_index_map_pallas(x, S, 0.1, 100.0, True)
        return perturb(x, jnp.sum(fim))

    chain("resolve (index only)", s_resolve, fv0)

    def s_rg(x):
        fim, fvm, _ = resolve_gather_pallas(x, None, S, 0.1, 100.0, True)
        return perturb(x, jnp.sum(fvm))

    chain("resolve_gather (9 coords)", s_rg, fv0)

    attrs0 = jnp.ones((1, f.shape[0], 6), jnp.float32)

    def s_rg6(x):
        fim, fvm, am = resolve_gather_pallas(x, attrs0, S, 0.1, 100.0, True)
        return perturb(x, jnp.sum(fvm) + jnp.sum(am))

    chain("resolve_gather (+6 attrs)", s_rg6, fv0)

    # --- downstream maps ---
    fim0, fvm0, _ = jax.jit(
        lambda x: resolve_gather_pallas(x, None, S, 0.1, 100.0, True)
    )(fv0)

    def s_wm(x):
        wm = weight_planes_from_gathered(x, fim0, S)
        cm = shading.coordinate_planes(x, wm)
        return perturb(x, jnp.sum(cm))

    chain("weight+coordinate from gathered", s_wm, fvm0)

    # --- backward scatters -------------------------------------------------
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        scatter_to_faces_pallas,
    )

    fim_np = np.asarray(fim0)  # numpy closure (see README caveats)
    g6 = jnp.asarray(
        np.random.RandomState(0).randn(1, 6, S, S).astype("float32")
    )

    def s_scatter(x):
        out = scatter_to_faces_pallas(x, fim_np, f.shape[0], planar=True)
        return perturb(x, jnp.sum(out))

    chain("pixel->face scatter bwd (6 planes)", s_scatter, g6)

    from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import (
        gather_face_vertices, slot_occupancy,
    )

    occ0 = slot_occupancy(np.asarray(f), v.shape[0], planar=True)

    def s_gather_fb(x):
        g = jax.grad(
            lambda t: jnp.sum(
                gather_face_vertices(t, fj, "pallas", occ0, True) ** 2
            )
        )(x)
        return perturb(x, jnp.sum(g))

    chain("vertex gather fwd + slot-scatter bwd", s_gather_fb, tv0)

    sil0 = (fim0 >= 0).astype(jnp.float32)[:, None]
    cm0 = shading.coordinate_planes(
        fvm0, weight_planes_from_gathered(fvm0, fim0, S)
    )

    def s_diff_bwd(x):
        g = jax.grad(lambda c: jnp.sum(differentiation(sil0, c) ** 2))(x)
        return perturb(x, jnp.sum(g))

    chain("differentiation bwd", s_diff_bwd, cm0)

    # --- full pipelines ---
    hp = RasterizeHyperparam(image_size=args.image_size)

    def s_sil_fwd(x):
        img = rasterize_silhouettes(x, fj, None, hp)
        return perturb(x, jnp.sum(img))

    chain("silhouette pipeline fwd", s_sil_fwd, tv0)

    def s_sil_fb(x):
        g = jax.grad(lambda t: jnp.sum(rasterize_silhouettes(t, fj, None, hp) ** 2))(x)
        return x - 1e-9 * g

    chain("silhouette pipeline fwd+bwd", s_sil_fb, tv0)

    vt, ft, tex = nr.create_textures(f.shape[0], texture_size=2)
    params = RasterizeParam(
        vertices_textures=jnp.asarray(vt[None]),
        faces_textures=jnp.asarray(ft),
        textures=jnp.asarray(tex[None]),
    )

    def s_rgb_fwd(x):
        img = rasterize_rgb(x, fj, params, hp)
        return perturb(x, jnp.sum(img))

    chain("textured pipeline fwd", s_rgb_fwd, tv0)

    def s_rgb_fb(x):
        g = jax.grad(lambda t: jnp.sum(rasterize_rgb(t, fj, params, hp) ** 2))(x)
        return x - 1e-9 * g

    chain("textured pipeline fwd+bwd", s_rgb_fb, tv0)


if __name__ == "__main__":
    main()
