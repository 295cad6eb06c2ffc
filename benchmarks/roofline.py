"""Roofline: measured stage times vs their memory/compute bounds.

For each pipeline stage this prints the HBM bytes it must move, the
time a perfectly HBM-bound implementation would take at the chip's
bandwidth, the measured device time (scan-chain N-differencing with a
trailing fetch -- see README measurement caveats), and the implied
%-of-speed-of-light.  Stages whose arithmetic dwarfs their traffic are
compute-bound; for those the table also shows the VPU lane-op bound,
and %SOL is reported against max(HBM, VPU) -- the binding roof.

The resolve's VPU roof is EXACT-SCHEDULE: ``resolve_exact_lane_ops``
replays the windowed kernel's (chunk, group, union-bbox, window)
schedule host-side on the real face set and multiplies by a per-op
table read off the kernel body (42 lane-ops per face per window lane
for the accept math -- the divide counted as one -- plus the shared
load/store/cascade ops per window).  No "crude" constants.

Usage:
  PYTHONPATH=. python benchmarks/roofline.py                 # 512^2 / 158K
  PYTHONPATH=. python benchmarks/roofline.py --bench         # the driver
      bench config: 256^2 AA (512^2 internal canvas), 2.4K-face teapot,
      silhouette (xy-only latch)
  [--faces-level N] [--image-size S] [--aa] [--scatter-ci]

v5e reference numbers: ~819 GB/s HBM; the VPU is 8x128 lanes x 4 ALU
subunits at ~0.94 GHz (~3.9 Tlane-op/s) -- measured in-situ: the resolve
kernel differenced FASTER than a 1-op/lane/cycle roof built from its
exact schedule, so the 4-issue figure is the binding one.
"""

from __future__ import annotations

import argparse
import time

import numpy as np

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

TEAPOT = "/root/reference/tests_torch/data/teapot.obj"
HBM_GBS = 819.0
VPU_LANEOPS = 8 * 128 * 4 * 0.94e9

# lane-ops per face per window lane in _windowed_kernel's accept path
# (face_candidate + z-accept + depth select; the divide counted as 1 --
# on real hardware it's a few passes, so the roof is conservative):
# bbox rejects 7, barycentrics 12, sign tests 6, zp 6, near/far clip 5,
# accept 4, depth select 1.  (The former per-face valid mask is gone --
# round 4 prescheduled the culls into killed sentinel bboxes.)
ACCEPT_OPS = 41


def shared_ops(G, coords_dim):
    """Per-window lane-ops shared by a face group: depth load/store
    (2), hit or-cascade (G-1), index where-cascade (G-1) + store (2),
    and per latched plane a FULL (G-1)-select where-cascade plus
    broadcast + store (the round-4 roofline modeled 2 ops/plane and
    undercounted the cascades -- each latch plane pays G-1 vector
    selects per window, not a shared one)."""
    return 2 + (G - 1) + (G - 1) + 2 + coords_dim * ((G - 1) + 2)


def resolve_scalar_cycles(nf_valid, n_groups, n_windows, coords_dim):
    """Scalar-core cycles the windowed kernel issues (~1 op/cycle):
    per face 17 constant reads + coords_dim latch reads (SMEM scalar
    loads feeding vector broadcasts), per group 4 window-table reads +
    ~8 loop/bookkeeping ops, per window ~12 address/min/decode ops.
    The scalar port is a SEPARATE roof from the VPU: measured round 5
    (512^2/158K, interleaved): dropping the 6 xy-latch planes removes
    ~0.95 ms of scalar feed + ~0.7 ms of vector cascade work and the
    kernel gets 1.63 ms faster -- the two pipes ADD instead of
    overlapping, so max(scalar, vpu) is the attainable bound and the
    measured gap above it is the (real) overlap failure."""
    return (
        nf_valid * (17 + coords_dim)
        + n_groups * 12
        + n_windows * 12
    )


def resolve_exact_lane_ops(fv_np, S, rw=16, cw=128, G=4, coords_dim=6,
                           face_chunk=256, draw_backside=True):
    """Replay ``_windowed_kernel``'s exact schedule on the real face set:
    faces stream in id order in ``face_chunk`` chunks, ``G`` per group;
    each group with >= 1 valid member pays ``G*ACCEPT_OPS +
    shared_ops(G, coords_dim)`` lane-ops on every (rw x cw) lane of every
    window covering the group's union bbox (the same _row_windows /
    _col_windows integer math as the kernel)."""
    f = np.asarray(fv_np, np.float32)
    if f.ndim == 4:
        f = f[0]
    x, y = f[..., 0], f[..., 1]
    det = (
        (x[:, 1] * y[:, 2] - x[:, 2] * y[:, 1])
        + (x[:, 2] * y[:, 0] - x[:, 0] * y[:, 2])
        + (x[:, 0] * y[:, 1] - x[:, 1] * y[:, 0])
    )
    valid = np.abs(det) >= 1e-8
    if not draw_backside:
        valid &= det <= 0  # see ops/resolve.py backface note
    xmin, xmax = x.min(1), x.max(1)
    ymin, ymax = y.min(1), y.max(1)
    nf = f.shape[0]
    Hp = -(-S // 8) * 8
    half = (S - 1.0) * 0.5
    big = 4.0

    lane = 0
    groups_alive = 0
    windows = 0
    for c0f in range(0, nf, face_chunk):
        n_in = min(face_chunk, nf - c0f)
        for b in range(0, n_in, G):
            idx = [c0f + min(b + j, face_chunk - 1) for j in range(G)]
            vs = [
                (b + j < n_in) and idx[j] < nf and bool(valid[idx[j]])
                for j in range(G)
            ]
            if not any(vs):
                continue
            groups_alive += 1
            ux0 = min((xmin[i] for i, v in zip(idx, vs) if v), default=big)
            ux1 = max((xmax[i] for i, v in zip(idx, vs) if v), default=-big)
            uy0 = min((ymin[i] for i, v in zip(idx, vs) if v), default=big)
            uy1 = max((ymax[i] for i, v in zip(idx, vs) if v), default=-big)
            y_lo = np.floor(uy0 * (S * 0.5) + half)
            y_hi = np.ceil(uy1 * (S * 0.5) + half)
            r_lo = int(np.clip(y_lo, 0.0, Hp))
            r_hi = int(np.clip(y_hi + 1.0, 0.0, Hp))
            r0 = (r_lo // 8) * 8
            n_rwin = max(0, (r_hi - r0 + rw - 1) // rw)
            x_lo = np.floor(ux0 * (S * 0.5) + half)
            x_hi = np.ceil(ux1 * (S * 0.5) + half)
            c_lo = int(np.clip(x_lo, 0.0, S))
            c_hi = int(np.clip(x_hi + 1.0, 0.0, S))
            c0 = (c_lo // 128) * 128
            n_cwin = max(0, (c_hi - c0 + cw - 1) // cw)
            windows += n_rwin * n_cwin
            lane += n_rwin * n_cwin * rw * cw * (
                G * ACCEPT_OPS + shared_ops(G, coords_dim)
            )
    return lane, groups_alive, windows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--faces-level", type=int, default=3,
                    help="teapot subdivisions (0=2.4K, 3 -> 158K faces)")
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--aa", action="store_true",
                    help="anti-aliasing on (canvas = 2x image size)")
    ap.add_argument("--bench", action="store_true",
                    help="the driver bench config: --faces-level 0 "
                         "--image-size 256 --aa")
    ap.add_argument("--scatter-ci", action="store_true",
                    help="repeat the scatter differencing 5x and report "
                         "median + spread (VERDICT r3 item 5)")
    args = ap.parse_args()
    if args.bench:
        args.faces_level, args.image_size, args.aa = 0, 256, True

    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
    from neural_renderer_v2_pytorch_tpu.ops.differentiation import differentiation
    from neural_renderer_v2_pytorch_tpu.ops.rasterize import (
        RasterizeHyperparam, rasterize_silhouettes, _flip_pool,
    )
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        resolve_gather_pallas, scatter_to_faces_pallas,
    )
    from scaling import subdivide

    def device_time(fn, carry, n1=6, n2=24, reps=2):
        # N-differencing ONLY: the tunnel adds a fixed ~50-60 ms round-trip
        # per fetch, so wall/n for any single chain reports that latency
        # floor, not the op (a trivial x+1 body "reads" 2.3 ms at n=24).
        # Callers pick (n1, n2) so (n2-n1)*per_iter >> ~5 ms tunnel noise.
        def wall(N):
            @jax.jit
            def run(v):
                def body(v, _):
                    return fn(v), None
                v, _ = jax.lax.scan(body, v, None, length=N)
                return v
            o = run(carry + jnp.float32(1e-5))
            jax.block_until_ready(o)
            _ = float(jnp.sum(o))
            best = float("inf")
            for r in range(reps):
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

    v, f = nr.load_obj(TEAPOT)
    for _ in range(args.faces_level):
        v, f = subdivide(v, f)
    nf = f.shape[0]
    S = args.image_size * (2 if args.aa else 1)  # internal canvas
    eye = np.array(nr.get_points_from_angles(2.732, 30, 0), "float32")
    tv = perspective(look_at(jnp.asarray(v[None]), jnp.asarray(eye)), angle=30.0)
    fv = jnp.asarray(np.asarray(jnp.take(tv, jnp.asarray(f), axis=1)))
    fv_np = np.asarray(fv)
    F = np.asarray(f)

    # the schedule the kernel actually picks for this face count
    # (resolve_gather_pallas group-size heuristic, xy-only latch)
    coords_dim = 6
    if nf >= 16384:
        G = 8
    else:
        G = 4
    rw = 16

    print("platform:", jax.default_backend(),
          "| faces:", nf, "| canvas:", S,
          "| AA:", args.aa, "| group:", G)
    MB = 1024 * 1024
    rows = []

    def report(name, measured_ms, hbm_bytes, lane_ops=0, note="",
               scalar_cycles=0):
        hbm_ms = hbm_bytes / (HBM_GBS * 1e9) * 1e3
        vpu_ms = lane_ops / VPU_LANEOPS * 1e3
        scalar_ms = scalar_cycles / 0.94e9 * 1e3
        roof = max(hbm_ms, vpu_ms, scalar_ms)
        if measured_ms < roof:
            # differenced wall below the roof: the stage is at speed of
            # light and the residual is tunnel noise -- report the bound
            measured_ms = roof
            note = "<= roof (sub-noise); " + note
        rows.append((name, measured_ms, hbm_bytes / MB, hbm_ms, vpu_ms,
                     100.0 * roof / measured_ms if measured_ms else 0.0, note))

    small = nf < 16384
    t_n = dict(n1=24, n2=120) if small else dict(n1=6, n2=24)

    # --- resolve + latch forward ------------------------------------------
    # xy-only latch (the silhouette path)
    t = device_time(
        lambda x: x + 1e-12 * resolve_gather_pallas(
            x, None, S, latch_z=False)[1].mean(), fv, **t_n,
    )
    # HBM: faces in (+ chunk copy), consts, index/depth/6 latch planes out
    bytes_resolve = (nf * 9 * 4) * 2 + nf * 17 * 4 + (2 + 6) * S * S * 4
    # EXACT-SCHEDULE op count (replaces round-3's crude estimate)
    lane_ops, n_groups, n_windows = resolve_exact_lane_ops(
        fv_np, S, rw=rw, G=G, coords_dim=coords_dim)
    scal = resolve_scalar_cycles(nf, n_groups, n_windows, coords_dim)
    report("resolve+latch fwd", t, bytes_resolve, lane_ops,
           "exact schedule: %d live groups, %d windows; scalar %.2f ms"
           % (n_groups, n_windows, scal / 0.94e9 * 1e3),
           scalar_cycles=scal)

    # --- pixel->face gradient scatter -------------------------------------
    # numpy: a jnp closure into the timing jit adds ~29 ms per execution
    fim = np.asarray(resolve_gather_pallas(fv, None, S)[0])
    g6 = jnp.asarray(
        np.random.RandomState(0).randn(1, coords_dim, S, S).astype("f"))
    from neural_renderer_v2_pytorch_tpu.ops.resolve_pallas import (
        _scatter_geometry,
    )

    def scatter_step(x):
        return x + 1e-12 * scatter_to_faces_pallas(
            x, fim, nf, planar=True).sum()

    sc_n = dict(n1=48, n2=240) if small else dict(n1=24, n2=120)
    if args.scatter_ci:
        samples = sorted(
            device_time(scatter_step, g6, reps=3, **sc_n) for _ in range(5)
        )
        t = samples[2]
        ci_note = " [5-cycle median; spread %.3f-%.3f]" % (
            samples[0], samples[-1])
    else:
        t = device_time(scatter_step, g6, **sc_n)
        ci_note = ""
    bytes_scatter = coords_dim * S * S * 4 + S * S * 4 + nf * coords_dim * 4
    if nf < 16384:
        # the copy path's two full-image relayouts (see
        # scatter_to_faces_pallas patch gating)
        bytes_scatter += 2 * 2 * coords_dim * S * S * 4
    # EXACT active (strip, chunk) pairs for the kernel's patch-reordered
    # layout, computed from the real fim; per pair the kernel pays
    #   one-hot build: 2 lane-ops per [K, T] element (compare + cast)
    #   MXU: 2 dots (bf16 hi+lo) x T/128 contraction passes
    #   accumulator RMW: ~8 cycles on the [D, K] slice
    ph, pw = 16, 128
    patch_fim = fim[0].reshape(S // ph, ph, S // pw, pw).transpose(
        0, 2, 1, 3).reshape(-1)
    strip, K = _scatter_geometry(S * S, nf, 2048, 128)[:2]
    ch = np.where(patch_fim < 0, -1, patch_fim // K).reshape(-1, strip)
    pairs = sum(len(np.unique(r[r >= 0])) for r in ch)
    lane_ops = pairs * K * strip * 2
    mxu_rmw_cycles = pairs * (2 * strip // 128 + 8)
    lane_ops += mxu_rmw_cycles * (VPU_LANEOPS / 0.94e9)  # cycles -> lane-op eq
    report("pixel->face scatter bwd", t, bytes_scatter, lane_ops,
           "%d active pairs: one-hot + MXU + RMW%s" % (pairs, ci_note))

    # --- NMR differentiation backward --------------------------------------
    coord = jnp.asarray(np.random.RandomState(1).rand(1, 2, S, S).astype("f"))
    img = np.random.RandomState(2).rand(1, 1, S, S).astype("f")  # numpy closure

    def nmr_step(x):
        g = jax.grad(
            lambda c: jnp.sum(differentiation(img, c) * img)
        )(x)
        return x + 1e-12 * g
    t = device_time(nmr_step, coord, n1=100, n2=500)
    bytes_nmr = (1 + 1 + 2) * S * S * 4 * 3   # images, grads, coords; shifts
    report("NMR differentiation bwd", t, bytes_nmr, 0, "elementwise shifts")

    # --- AA flip+pool (bench config only renders through it) ---------------
    if args.aa:
        img4 = jnp.asarray(
            np.random.RandomState(3).rand(1, 1, S, S).astype("f"))

        def aa_step(x):
            g = jax.grad(lambda i: jnp.sum(_flip_pool(i) ** 2))(x)
            return x + 1e-12 * g
        t = device_time(aa_step, img4, n1=100, n2=500)
        # fwd: read SxS, write (S/2)^2; bwd: read (S/2)^2 grad (+pool out
        # recompute path), write SxS
        bytes_aa = (S * S + (S // 2) ** 2) * 4 * 2 + (S // 2) ** 2 * 4 * 2
        report("AA flip+pool fwd+bwd", t, bytes_aa, 0,
               "reverse + reduce_window + hand VJP")

    # --- stages previously OUTSIDE the roofline (round 5): the bench
    # config measured 0.49 ms/step with only 0.39 ms attributed ---------
    from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import (
        gather_face_vertices,
    )
    from neural_renderer_v2_pytorch_tpu.ops.resolve import (
        weight_planes_from_gathered,
    )
    from neural_renderer_v2_pytorch_tpu.ops import shading

    nv = v.shape[0]
    glue_n = dict(n1=100, n2=500) if small else dict(n1=24, n2=120)

    # camera transform fwd+bwd (perspective . look_at)
    cot_tv = np.random.RandomState(5).randn(1, nv, 3).astype("f")

    def cam_step(x):
        g = jax.grad(
            lambda vv: jnp.sum(perspective(look_at(vv, eye), angle=30.0) * cot_tv)
        )(x)
        return x + 1e-12 * g
    t = device_time(cam_step, jnp.asarray(v[None]), **glue_n)
    report("camera fwd+bwd", t, nv * 3 * 4 * 4, 0, "VPU fma rotation")

    # face-vertex gather fwd + shared-vertex slot-scatter bwd (THE grad
    # path into vertices)
    cot_fv = np.random.RandomState(6).randn(1, nf, 9).astype("f")

    def fg_step(x):
        g = jax.grad(
            lambda vv: jnp.sum(
                gather_face_vertices(vv, F, "xla").reshape(1, nf, 9) * cot_fv
            )
        )(x)
        return x + 1e-12 * g
    t = device_time(fg_step, jnp.asarray(v[None]), **glue_n)
    bytes_fg = (nv * 3 * 4 + nf * 3 * 4 + nf * 9 * 4) * 2
    report("face gather fwd + slot bwd", t, bytes_fg, 0,
           "XLA row gather + segment-sum transpose")

    # weight planes (stop-grad, forward only) + coordinate planes fwd+bwd
    fvm6 = jnp.asarray(
        np.asarray(resolve_gather_pallas(fv, None, S, latch_z=False)[1])
    )
    fim_j = jnp.asarray(fim)
    cot_c = np.random.RandomState(7).randn(1, 2, S, S).astype("f")

    def wc_step(x):
        def f(x):
            w = weight_planes_from_gathered(x, fim_j, S)
            return jnp.sum(shading.coordinate_planes(x, w) * cot_c)
        return x + 1e-12 * jax.grad(f)(x)
    t = device_time(wc_step, fvm6, **glue_n)
    # fwd: read 6 fvm + fim + write 3 w; coord: read (6 fvm, 3 w) write 2;
    # bwd: read 2 grad + 3 w, write 6 plane grads
    bytes_wc = (6 + 1 + 3 + 9 + 2 + 5 + 6) * S * S * 4
    report("weight+coordinate planes", t, bytes_wc, 0,
           "fused elementwise over planes")

    # --- mask + loss + SGD glue --------------------------------------------
    # The step work outside every stage above: the foreground cast
    # (fim >= 0 -> f32 plane), the sum(img^2) loss forward, the 2*img
    # gradient seed, and the vertex SGD update.  All elementwise.
    out_sz = args.image_size
    img_out = jnp.asarray(
        np.random.RandomState(8).rand(1, 1, out_sz, out_sz).astype("f"))
    fim_f32 = np.asarray(fim, "float32")  # numpy closure (see caveats)

    def glue_step(x):
        fg = (jnp.asarray(fim_f32) + x[0, 0, 0, 0] * 1e-12 >= 0.0)
        g = jax.grad(lambda i: jnp.sum(i * i))(x)
        return x - 1e-9 * g + 1e-12 * jnp.sum(fg)
    t = device_time(glue_step, img_out, n1=100, n2=500)
    # fim read + fg plane write; loss read + seed write + update r/w on
    # the output-size image; vertex update traffic is noise (nv*3*4*3)
    bytes_glue = 2 * S * S * 4 + 4 * out_sz * out_sz * 4 + nv * 3 * 4 * 3
    report("mask+loss+SGD glue", t, bytes_glue, 0,
           "foreground cast, loss fwd, grad seed, vertex update")

    # --- per-kernel sequencing floor ----------------------------------------
    # The census (kernel_census.py) shows the bench step dispatches ~61
    # top-level kernels; each measured stage chain above contains its own
    # kernels (so their sequencing gaps are already inside the stage
    # times), but the step also runs glue kernels that belong to no
    # stage (relayout copies, channel concats, scan plumbing).  Measure
    # the floor: a chain of trivial barrier-separated kernels.
    from jax import lax as _lax
    tiny = jnp.asarray(np.random.RandomState(9).rand(8, 128).astype("f"))

    def seq_step(x):
        for _ in range(16):
            x = _lax.optimization_barrier(x + 1.0)
        return x
    t_seq = device_time(seq_step, tiny, n1=24, n2=120) / 16.0
    seq_note = "measured %.2f us/kernel (barrier chain)" % (t_seq * 1e3)

    # --- full training step -----------------------------------------------
    hp = RasterizeHyperparam(image_size=args.image_size,
                             anti_aliasing=args.aa)

    def step(vv):
        def loss(vv):
            tvv = perspective(look_at(vv, eye), angle=30.0)
            return jnp.sum(rasterize_silhouettes(tvv, F, None, hp) ** 2)
        return vv - 1e-9 * jax.grad(loss)(vv)
    t = device_time(jax.jit(step), jnp.asarray(v[None]),
                    *( (24, 120) if small else (4, 16) ))
    bytes_step = bytes_resolve + bytes_scatter + bytes_nmr \
        + 2 * (nf * 9 * 4 + v.shape[0] * 3 * 4)   # vertex gather + transpose
    report("FULL silhouette step", t, bytes_step, 0,
           "sum of parts; resolve roof applies")
    attributed = sum(r[1] for r in rows[:-1])
    rows.append((
        "(attributed / step)", attributed, 0, 0, 0,
        100.0 * attributed / t if t else 0.0,
        "stage-sum coverage of the measured step",
    ))
    residual = t - attributed
    rows.append((
        "(residual)", residual, 0, 0, 0, 0.0,
        "step minus stage sum; bounded by the ~61 glue dispatches x "
        "the %s plus chip drift between measurements (same-day runs "
        "read this row anywhere in [-0.05, +0.05] ms)" % seq_note,
    ))

    print()
    print("%-26s %9s %9s %9s %9s %7s  %s" % (
        "stage", "ms", "MB", "HBM ms", "VPU ms", "%SOL", "note"))
    for name, ms, mb, hbm, vpu, sol, note in rows:
        print("%-26s %9.3f %9.1f %9.3f %9.3f %6.1f%%  %s" % (
            name, ms, mb, hbm, vpu, sol, note))
    print()
    print("Reading: %SOL is measured-vs-binding-roof (max of HBM and VPU")
    print("bounds). The resolve roof replays the kernel's exact group/")
    print("window schedule on the real face set (resolve_exact_lane_ops);")
    print("its headroom is now purely per-op-table slack (divide cost,")
    print("scalar-core bookkeeping), not schedule guesswork.")


if __name__ == "__main__":
    import sys
    sys.path.insert(0, "benchmarks")
    main()
