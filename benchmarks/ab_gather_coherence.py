"""A/B: does access-order coherence speed up the loaded-atlas forward
gathers?  (VERDICT round-3 item 4.)

The loaded-atlas forward's remaining cost is the four bilinear row
gathers (~1.4 ms per 262K rows at 512^2 -- the claimed hardware
random-access floor).  Patch reordering cut the *scatter* op count 3.6x;
this experiment applies the same coherence lever to the forward gathers
and measures three orderings of the REAL anchor ids from the reference
scene (4e49... model, 1190x1920 atlas, 512^2 AA canvas):

  pixel     -- raster order, what the sampler does today
  patch     -- (16, 128) spatial patches (the scatter's winning order)
  sorted    -- ids fully sorted (the coherence upper bound; not a real
               pipeline option -- the inverse permutation would cost more
               than the gather -- but it bounds what coherence CAN give)

If `sorted` is not materially faster than `pixel`, the gather is
element-throughput-bound and the floor argument stands measured, not
assumed.

Usage: PYTHONPATH=. python benchmarks/ab_gather_coherence.py
"""

import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

MODEL = ("/root/reference/tests_torch/data/"
         "4e49873292196f02574b5684eaec43e9/model.obj")


def main():
    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops import shading
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
    from neural_renderer_v2_pytorch_tpu.ops.resolve import (
        weight_planes_from_gathered,
    )
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        resolve_gather_pallas,
    )

    if not _os.path.exists(MODEL):
        print("reference model unavailable")
        return

    lv, lf, lvt, lft, ltex = nr.load_obj(MODEL, load_textures=True)
    eye = np.array(nr.get_points_from_angles(2.5, 10, -90), "float32")
    tv = perspective(look_at(jnp.asarray(lv[None]), jnp.asarray(eye)), angle=30.0)
    fv = jnp.asarray(np.asarray(jnp.take(tv, jnp.asarray(lf), axis=1)))
    S = 512  # the AA canvas of the 256^2 bench rows
    tex = np.asarray(ltex[None]) if ltex.ndim == 3 else np.asarray(ltex)
    th, tw = tex.shape[2], tex.shape[3]  # [bs, 3, th, tw]
    T = th * tw

    # latch UVs, rebuild the sampler's real anchor ids
    uvtri = np.asarray(lvt)[np.asarray(lft)].reshape(-1, 6)  # [nf, 6]
    fim, fvm, uvp = jax.jit(
        lambda fv: resolve_gather_pallas(fv, jnp.asarray(uvtri[None]), S)
    )(fv)
    wp = weight_planes_from_gathered(fvm, fim, S)
    x, y = shading._uv_coords(
        (fvm[:, 2], fvm[:, 5], fvm[:, 8]),
        (uvp[:, 0], uvp[:, 2], uvp[:, 4]),
        (uvp[:, 1], uvp[:, 3], uvp[:, 5]),
        (wp[:, 0], wp[:, 1], wp[:, 2]),
        fim >= 0, 1e-5,
    )
    x0, y0, _ = shading._bilinear_taps(x, y)
    idx00 = np.asarray((y0 * tw + x0).reshape(S * S))
    idx00 = np.clip(idx00, 0, T - tw - 2)
    print("anchors: %d pixels, %d unique texels, atlas %dx%d" % (
        S * S, len(np.unique(idx00)), th, tw))

    orders = {
        "pixel": idx00,
        "patch16x128": idx00.reshape(S // 16, 16, S // 128, 128)
            .transpose(0, 2, 1, 3).reshape(-1),
        "sorted": np.sort(idx00),
    }

    flat0 = jnp.asarray(tex.reshape(1, 3, T))

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

    for name, ids in orders.items():
        ids_np = ids[None].astype(np.int32)  # numpy closure: free

        def step(flat, ids_np=ids_np):
            taps = [
                jnp.take_along_axis(
                    flat, jnp.asarray(ids_np + off)[:, None], axis=2
                )
                for off in (0, 1, tw, tw + 1)
            ]
            s = sum(jnp.sum(t) for t in taps)
            return flat * (1.0 + 1e-12 * s)

        print("%-14s 4-tap gather: %7.3f ms" % (name, device_time(step, flat0)))


if __name__ == "__main__":
    main()
