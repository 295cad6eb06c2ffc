"""Device-side scaling sweep: batch, image size, face count, render path.

Prints one table of per-step forward+backward device times measured with
the tunnel-robust protocol (lax.scan chains at two lengths, differenced
-- see bench.py / README "Measurement caveats").

Usage:  python benchmarks/scaling.py [--quick]
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

TEAPOT = "/root/reference/tests_torch/data/teapot.obj"


def subdivide(v, f):
    """Midpoint 1:4 triangle subdivision (no dedup; geometry identical).

    Children are emitted adjacent to their parent and vertices renumbered
    in first-use order -- the coherent layout every real mesh pipeline
    produces (loaders emit vertices in file order, subdividers per
    parent).  Id locality matters on TPU: the face-vertex gather/scatter
    kernels' one-hot work scales with how many vertex chunks each slot
    strip touches (ops/resolve_pallas.py gather_rows_pallas)."""
    v0, v1, v2 = v[f[:, 0]], v[f[:, 1]], v[f[:, 2]]
    m01, m12, m20 = (v0 + v1) / 2, (v1 + v2) / 2, (v2 + v0) / 2
    nv = np.concatenate([v0, v1, v2, m01, m12, m20], 0)
    n = f.shape[0]
    i = np.arange(n)
    A, B, C, AB, BC, CA = i, i + n, i + 2 * n, i + 3 * n, i + 4 * n, i + 5 * n
    # children interleaved per parent: [A-corner, B-corner, C-corner, center]
    nf = np.stack(
        [np.stack([A, AB, CA], 1), np.stack([AB, B, BC], 1),
         np.stack([CA, BC, C], 1), np.stack([AB, BC, CA], 1)], 1,
    ).reshape(-1, 3)
    # renumber vertices in first-use order
    flat = nf.reshape(-1)
    _, first = np.unique(flat, return_index=True)
    order = flat[np.sort(first)]
    remap = np.empty(nv.shape[0], np.int64)
    remap[order] = np.arange(order.shape[0])
    return nv[order].astype("float32"), remap[flat].reshape(-1, 3).astype("int32")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fewer scan iters")
    ap.add_argument("--obj", default=TEAPOT)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.models.lights import (
        AmbientLight, DirectionalLight, SpecularLight,
    )
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
    from neural_renderer_v2_pytorch_tpu.ops.rasterize import (
        RasterizeHyperparam, RasterizeParam, rasterize_rgba,
        rasterize_silhouettes,
    )

    n1, n2 = (10, 40) if args.quick else (30, 120)

    def device_time(step, carry, cycles=3):
        """Best-of-`cycles` INTERLEAVED N-differencing (bench.py's
        protocol, applied per row).  A single differencing cycle is not
        trustworthy on the shared tunneled chip: the round-4 battery log
        shows same-day single-cycle rows 2-2.5x apart (e.g. the loaded-
        atlas tex-grad step read 4.458 then 11.186 ms).  Contention is
        strictly additive, so the best of interleaved short/long pairs is
        the faithful device time; the spread over cycles is returned so
        published rows carry their own noise bar."""
        def make(N):
            @jax.jit
            def run(v):
                def body(v, _):
                    return step(v), None
                v, _ = jax.lax.scan(body, v, None, length=N)
                return v
            return run
        runs = {N: make(N) for N in (n1, n2)}
        for run in runs.values():  # compile + dedup-buster warm-up
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
                _ = float(jnp.sum(o))  # timed window must end with a fetch
                best = min(best, time.perf_counter() - t0)
            return best

        ds = []
        for cyc in range(cycles):
            w1, w2 = wall(n1, cyc), wall(n2, cyc)
            d = w2 - w1
            if d < 0.2 * w2:  # differencing drowned in dispatch noise
                d = w2 * (n2 - n1) / n2
            ds.append(d / (n2 - n1) * 1e3)
        best = min(ds)
        return best, (max(ds) - best) / best

    vertices, faces = nr.load_obj(args.obj)
    print("platform:", jax.default_backend())
    print("%-42s %10s %8s %12s" % ("config (fwd+bwd per step)", "ms", "+spr%", "Mpx/s"))

    def report(name, t_spread, px):
        t, spread = t_spread
        print("%-42s %10.3f %7.0f%% %12.1f" % (name, t, spread * 100, px / t / 1e3))

    def sil_step(F, eye, hp):
        def step(v):
            def loss(v):
                tv = perspective(look_at(v, eye), angle=30.0)
                return jnp.sum(rasterize_silhouettes(tv, F, None, hp) ** 2)
            return v - 1e-9 * jax.grad(loss)(v)
        return step

    eye1 = np.array(nr.get_points_from_angles(2.732, 30, 0), "float32")
    F = np.asarray(faces)
    V = jnp.asarray(vertices[None])

    # headline: 256^2 silhouette, AA on
    hp = RasterizeHyperparam(image_size=256)
    report("silhouette 256^2 AA bs=1 (2.5K faces)",
           device_time(sil_step(F, eye1, hp), V), 256 ** 2)

    # batched cameras
    for bs in (8, 30):
        eyes = np.stack([
            np.array(nr.get_points_from_angles(2.732, 30, a), "float32")
            for a in np.linspace(0, 360, bs, endpoint=False)])
        Vb = jnp.asarray(np.tile(vertices[None], (bs, 1, 1)))
        report("silhouette 256^2 AA bs=%d" % bs,
               device_time(sil_step(F, eyes, hp), Vb), bs * 256 ** 2)

    # textured (+ lights), per-face atlas fast path
    vt, ft, tex = nr.create_textures(F.shape[0], texture_size=2)
    VT, FT = np.asarray(vt[None]), np.asarray(ft)
    # all numpy: closure-capturing jnp DEVICE arrays into a jit costs a
    # fixed ~29 ms on every later execution (see README measurement notes)
    TEX = np.asarray(tex[None])
    ones3 = np.ones((1, 3), "float32")
    lights = (
        DirectionalLight(color=ones3 * 0.6,
                         direction=np.asarray([[1.0, 1.0, 1.0]], "float32")),
        AmbientLight(color=ones3 * 0.3),
        SpecularLight(color=ones3 * 0.2),
    )
    for name, l in (("textured 256^2 AA bs=1", None),
                    ("textured+3lights 256^2 AA bs=1", lights)):
        p = RasterizeParam(vertices_textures=VT,
                           faces_textures=FT, textures=TEX,
                           lights=l, texture_size=2)
        def step(v, p=p):
            def loss(v):
                tv = perspective(look_at(v, eye1), angle=30.0)
                return jnp.sum(rasterize_rgba(tv, F, p, hp) ** 2)
            return v - 1e-9 * jax.grad(loss)(v)
        report(name, device_time(step, V), 256 ** 2)

    # loaded-atlas (real mesh, 1190x1920 packed atlas) general sampler
    import os

    model = ("/root/reference/tests_torch/data/"
             "4e49873292196f02574b5684eaec43e9/model.obj")
    if os.path.exists(model):
        lv, lf, lvt, lft, ltex = nr.load_obj(model, load_textures=True)
        leye = np.array(nr.get_points_from_angles(2.5, 10, -90), "float32")
        lp = RasterizeParam(
            vertices_textures=np.asarray(lvt[None]),
            faces_textures=np.asarray(lft), textures=np.asarray(ltex[None]),
        )
        LF, LV = np.asarray(lf), jnp.asarray(lv[None])

        def lstep(v, p=lp):
            def loss(v):
                tv = perspective(look_at(v, leye), angle=30.0)
                return jnp.sum(rasterize_rgba(tv, LF, p, hp) ** 2)
            return v - 1e-9 * jax.grad(loss)(v)
        report("textured loaded-atlas 256^2 AA (3.6K faces)",
               device_time(lstep, LV), 256 ** 2)

        LT = jnp.asarray(np.asarray(ltex[None]))
        # numpy copy for the closure: capturing a jnp DEVICE array into a
        # jit costs ~29 ms on every later execution (README caveats)
        LVn = np.asarray(lv[None])

        def tstep(t):
            def loss(t):
                tv = perspective(look_at(LVn, leye), angle=30.0)
                p = RasterizeParam(
                    vertices_textures=np.asarray(lvt[None]),
                    faces_textures=np.asarray(lft),
                    textures=t,
                )
                return jnp.sum(rasterize_rgba(tv, LF, p, hp) ** 2)
            return t - 1e-9 * jax.grad(loss)(t)
        report("...optimizing the loaded atlas (tex grads)",
               device_time(tstep, LT), 256 ** 2)

    # face-count scaling at 512^2 (no AA)
    hp512 = RasterizeHyperparam(image_size=512, anti_aliasing=False)
    v, f = vertices, faces
    for lvl in range(5):
        if lvl:
            v, f = subdivide(v, f)
        if args.quick and f.shape[0] > 50_000:
            break
        Vs = jnp.asarray(v[None])
        report("silhouette 512^2 bs=1 (%dK faces)" % (f.shape[0] // 1000),
               device_time(sil_step(np.asarray(f), eye1, hp512), Vs), 512 ** 2)
        if lvl == 3:
            # textured at scale (heavy latch: 9 coord planes + UVs +
            # texels); exercises the large-mesh group-size tuning
            Fs = np.asarray(f)
            vts, fts, texs = nr.create_textures(Fs.shape[0], texture_size=2)
            ps = RasterizeParam(
                vertices_textures=np.asarray(vts[None]),
                faces_textures=np.asarray(fts),
                textures=np.asarray(texs[None]), texture_size=2,
            )

            def tstep512(vv, ps=ps, Fs=Fs):
                def loss(vv):
                    tv = perspective(look_at(vv, eye1), angle=30.0)
                    return jnp.sum(rasterize_rgba(tv, Fs, ps, hp512) ** 2)
                return vv - 1e-9 * jax.grad(loss)(vv)
            report("textured 512^2 bs=1 (%dK faces)" % (Fs.shape[0] // 1000),
                   device_time(tstep512, Vs), 512 ** 2)


if __name__ == "__main__":
    main()
