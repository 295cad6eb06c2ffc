"""Is the loaded-atlas gather floor the GATHER UNIT or the HBM path?
(VERDICT round-4 item 7.)

Round 3/4 established ~1.8 ns/element for XLA's bilinear tap gathers
from the HBM-resident 2.3M-texel atlas, and rejected quad-packing and
access-order coherence as levers (ab_gather_coherence.py).  Both probes
kept the table in HBM; this one measures the same REAL anchor ids
against a VMEM-RESIDENT table -- the one mechanism Pallas offers for
arbitrary row gathers from VMEM is the predicated one-hot MXU matmul
(gather_rows_pallas keeps its whole table VMEM-resident by BlockSpec).
If the VMEM path beats 1.8 ns/element, a paged/tiled sampler is worth
building; if not, the floor is the gather mechanism itself and the XLA
sampler stands.

(A per-row scalar-addressed VMEM load does not exist on TPU: vector
loads are (sublane, lane)-tiled and lane slices must be 128-aligned, so
one-hot MXU selection IS the VMEM gather primitive.)

Usage: PYTHONPATH=. python benchmarks/ab_vmem_gather.py
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
        gather_rows_pallas, resolve_gather_pallas,
    )

    if not _os.path.exists(MODEL):
        print("reference model unavailable")
        return

    lv, lf, lvt, lft, ltex = nr.load_obj(MODEL, load_textures=True)
    eye = np.array(nr.get_points_from_angles(2.5, 10, -90), "float32")
    tv = perspective(look_at(jnp.asarray(lv[None]), jnp.asarray(eye)), angle=30.0)
    fv = jnp.asarray(np.asarray(jnp.take(tv, jnp.asarray(lf), axis=1)))
    S = 512
    tex = np.asarray(ltex[None]) if ltex.ndim == 3 else np.asarray(ltex)
    th, tw = tex.shape[2], tex.shape[3]
    T = th * tw

    # the sampler's real anchor ids (same construction as
    # ab_gather_coherence.py), in the scatter's winning patch order
    uvtri = np.asarray(lvt)[np.asarray(lft)].reshape(-1, 6)
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
    patch = (
        idx00.reshape(S // 16, 16, S // 128, 128)
        .transpose(0, 2, 1, 3).reshape(-1)
    )
    P = patch.shape[0]
    print("anchors: %d, atlas %dx%d = %d texels (%.1f MB f32 x3ch)"
          % (P, th, tw, T, T * 3 * 4 / 1e6))

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
                vi = carry + jnp.float32(1e-6 * (r + 1))
                jax.block_until_ready(vi)
                t0 = time.perf_counter()
                o = run(vi)
                jax.block_until_ready(o)
                _ = float(jnp.sum(o))
                best = min(best, time.perf_counter() - t0)
            return best
        w1, w2 = wall(n1), wall(n2)
        return max(w2 - w1, 0.0) / (n2 - n1) * 1e3

    flat0 = jnp.asarray(tex.reshape(1, 3, T))
    ids4 = np.concatenate(
        [patch + off for off in (0, 1, tw, tw + 1)]
    )[None].astype(np.int32)  # all 4 bilinear taps, one gather

    # --- XLA HBM-resident baseline (the production sampler's gathers) ---
    def xla_step(flat):
        taps = jnp.take_along_axis(flat, jnp.asarray(ids4)[:, None], axis=2)
        return flat * (1.0 + 1e-12 * jnp.sum(taps))

    t = device_time(xla_step, flat0)
    n_el = 4 * P * 3
    print("XLA HBM gather (4 taps):   %7.3f ms  = %.2f ns/element"
          % (t, t * 1e6 / n_el))

    # --- VMEM-resident one-hot MXU gather (whole table in VMEM) ---------
    table0 = jnp.asarray(tex.reshape(1, 3, T).transpose(0, 2, 1))  # [1,T,3]

    def mxu_step(table):
        out = gather_rows_pallas(table, jnp.asarray(ids4), planar_out=True)
        return table * (1.0 + 1e-12 * jnp.sum(out))

    t = device_time(mxu_step, table0, n1=6, n2=24)
    print("VMEM one-hot MXU (4 taps): %7.3f ms  = %.2f ns/element"
          % (t, t * 1e6 / n_el))

    # --- same, single-tap (coherence per strip is 4x better) ------------
    ids1 = patch[None].astype(np.int32)

    def mxu1_step(table):
        out = gather_rows_pallas(table, jnp.asarray(ids1), planar_out=True)
        return table * (1.0 + 1e-12 * jnp.sum(out))

    t = device_time(mxu1_step, table0, n1=6, n2=24)
    print("VMEM one-hot MXU (1 tap):  %7.3f ms  = %.2f ns/element"
          % (t, t * 1e6 / (P * 3)))


if __name__ == "__main__":
    main()
