"""A/B the windowed-resolve loop structure on device (round 5).

Variants of the 512^2 / 158K-face resolve forward (the config where
round 4's exact-schedule roofline read 34% SOL):

  * nested vs FLAT window loop (one fori_loop over n_rwin * n_cwin
    instead of two nested setups per group -- 90% of groups cover one
    window at this scale),
  * group_unroll (2 groups per loop iteration),
  * face_chunk 256 vs 1024 (618 vs 155 grid steps -- per-grid-step
    dispatch and SMEM-stream overhead),
  * row_window 8 vs 16.

Protocol: every variant's scan chains are compiled up front, then the
timed differencing cycles run INTERLEAVED across variants (3 sweeps,
best per variant) so chip drift hits all variants equally -- see
README "Measurement caveats".

Usage: PYTHONPATH=. python benchmarks/ab_window_loop.py [--level 3]
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
    ap.add_argument("--level", type=int, default=3)
    ap.add_argument("--iters", type=int, nargs=2, default=[6, 24])
    ap.add_argument("--sweeps", type=int, default=3)
    ap.add_argument("--latch-z", action="store_true",
                    help="9-plane latch (textured path) instead of xy-only")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
    from neural_renderer_v2_pytorch_tpu.ops import resolve_pallas as rp
    from scaling import subdivide

    v, f = nr.load_obj(TEAPOT)
    for _ in range(args.level):
        v, f = subdivide(v, f)
    nf = f.shape[0]
    S = 512
    eye = np.array(nr.get_points_from_angles(2.732, 30, 0), "float32")
    tv = perspective(look_at(jnp.asarray(v[None]), jnp.asarray(eye)), angle=30.0)
    fv = jnp.asarray(np.asarray(jnp.take(tv, jnp.asarray(f), axis=1)))
    G = 8 if nf >= 16384 else 4
    coords_dim = 9 if args.latch_z else 6
    print("platform:", jax.default_backend(), "| faces:", nf,
          "| G:", G, "| coords_dim:", coords_dim)

    n1, n2 = args.iters

    # (name, window_loop, unroll, face_chunk, row_window)
    variants = [
        ("nested fc256           ", "nested", 1, 256, 16),
        ("flat   fc256           ", "flat", 1, 256, 16),
        ("flat   fc256  unroll2  ", "flat", 2, 256, 16),
        ("nested fc1024          ", "nested", 1, 1024, 16),
        ("flat   fc1024          ", "flat", 1, 1024, 16),
        ("flat   fc1024 unroll2  ", "flat", 2, 1024, 16),
        ("flat   fc256  rw8      ", "flat", 1, 256, 8),
    ]

    def build(window_loop, unroll, fc, rw):
        def resolve_step(x):
            out = rp._run_windowed(
                x, None, S, 0.1, 100.0, True, fc, rw, 128, True, False,
                group_size=G, coords_dim=coords_dim,
                group_unroll=unroll,
            )
            return x + 1e-12 * out[2].mean()

        def chain(N):
            @jax.jit
            def run(x):
                def body(x, _):
                    return resolve_step(x), None
                x, _ = jax.lax.scan(body, x, None, length=N)
                return x
            return run

        old = rp._WINDOW_LOOP
        rp._WINDOW_LOOP = window_loop
        try:
            runs = {}
            for N in (n1, n2):
                r = chain(N)
                o = r(fv + jnp.float32(1e-5))  # trace+compile under the switch
                jax.block_until_ready(o)
                _ = float(jnp.sum(o))
                runs[N] = r
        finally:
            rp._WINDOW_LOOP = old
        return runs

    compiled = []
    for name, wl, u, fc, rw in variants:
        t0 = time.perf_counter()
        runs = build(wl, u, fc, rw)
        compiled.append((name, runs))
        print("compiled %s (%.1fs)" % (name.strip(), time.perf_counter() - t0))

    results = {name: [] for name, _ in compiled}
    for sweep in range(args.sweeps):
        for name, runs in compiled:
            def wall(N, r):
                best = float("inf")
                for rep in range(2):
                    vi = fv + jnp.float32(1e-6 * (sweep * 2 + rep + 1))
                    jax.block_until_ready(vi)
                    t0 = time.perf_counter()
                    o = runs[N](vi)
                    jax.block_until_ready(o)
                    _ = float(jnp.sum(o))
                    best = min(best, time.perf_counter() - t0)
                return best
            w1, w2 = wall(n1, runs), wall(n2, runs)
            results[name].append(max(w2 - w1, 0.0) / (n2 - n1) * 1e3)

    print()
    print("%-26s %10s   %s" % ("variant", "best ms", "cycles"))
    for name, _ in compiled:
        ds = results[name]
        print("%-26s %10.3f   %s" % (
            name, min(ds), " ".join("%.3f" % d for d in ds)))


if __name__ == "__main__":
    main()
