"""Headline benchmark: pixels/s forward+backward, 256x256 teapot silhouette.

Matches the driver's north-star metric (BASELINE.json) and the reference
harness scene (misc/measure_time.py:13-24: teapot, distance 2.732,
elevation 30, image_size 256, batch 1, renderer defaults => AA on, i.e.
the z-resolve runs at 512x512 internally).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline compares
against this repo's committed round-1 measurement (BENCH_BASELINE.json);
on first run the file is created with the current value (ratio 1.0).
"""

import json
import os
import sys
import time

import numpy as np

# persistent compile cache: keeps driver/cold runs fast
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache"),
)


def main():
    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
    from neural_renderer_v2_pytorch_tpu.ops.rasterize import (
        RasterizeHyperparam,
        rasterize_silhouettes,
    )

    obj = os.environ.get(
        "NR_BENCH_OBJ", "/root/reference/tests_torch/data/teapot.obj"
    )
    image_size = int(os.environ.get("NR_BENCH_IMAGE_SIZE", "256"))
    batch_size = int(os.environ.get("NR_BENCH_BATCH", "1"))

    vertices, faces = nr.load_obj(obj)
    vertices = jnp.asarray(np.tile(vertices[None], (batch_size, 1, 1)))
    # NOTE: faces/eye stay NUMPY on purpose -- closure-capturing a jnp
    # DEVICE array into a jit permanently adds ~29 ms of per-execution
    # overhead process-wide on tunneled (axon) backends; numpy closures
    # bake into the executable as constants and are free.
    faces = np.asarray(faces)
    eye = np.array(nr.get_points_from_angles(2.732, 30, 0), "float32")
    hp = RasterizeHyperparam(image_size=image_size)  # AA on (defaults)

    def loss_fn(vertices):
        tv = perspective(look_at(vertices, eye), angle=30.0)
        images = rasterize_silhouettes(tv, faces, None, hp)
        # IoU-style scalar so the full NMR backward runs
        return jnp.sum(images * images) / (jnp.sum(images) + 1.0)

    # 200-step chains (~150/300 ms on device) keep the N-differencing well
    # above the tunnel's ~30 ms dispatch noise; scan compiles the body once,
    # so the longer chain costs no extra compile time
    n_iters = int(os.environ.get("NR_BENCH_ITERS", "200"))

    def make_chain(n):
        # a genuine (tiny-lr) gradient-descent update chains every
        # iteration's input to the previous output, so the steps execute
        # strictly sequentially on device; running the chain inside one
        # program (lax.scan) measures device throughput rather than the
        # host/tunnel dispatch path
        @jax.jit
        def run(vertices):
            def step(vertices, _):
                loss, grad = jax.value_and_grad(loss_fn)(vertices)
                return vertices - 1e-6 * grad, loss
            return jax.lax.scan(step, vertices, None, length=n)
        return run

    def time_chain(n):
        run = make_chain(n)
        # warm/compile on a DIFFERENT input than the timed call: tunneled
        # device runtimes may dedup repeat executions of an identical
        # (executable, inputs) pair
        out = run(vertices + jnp.float32(1e-5))
        jax.block_until_ready(out)
        _ = float(out[1][-1])
        best = float("inf")
        for rep in range(3):
            v_in = vertices + jnp.float32(1e-6 * rep)
            jax.block_until_ready(v_in)
            t0 = time.perf_counter()
            out = run(v_in)
            jax.block_until_ready(out)
            _ = float(out[1][-1])  # force materialization through the tunnel
            best = min(best, time.perf_counter() - t0)
        return best

    # N-differencing cancels the fixed dispatch/fetch overhead of the
    # tunnel (which can exceed the device time itself).  Chip contention
    # on the shared tunnel is strictly additive noise, so the best of a
    # few differencing cycles is the most faithful device time.  Six
    # cycles (round 5, was 3): same-day identical-code readings spread
    # 135-148 Mpx/s under drift; each extra cycle costs ~0.4 s of device
    # time and materially improves the odds of touching the true floor.
    elapsed = float("inf")
    for _cycle in range(6):
        t1 = time_chain(n_iters)
        t2 = time_chain(2 * n_iters)
        d = t2 - t1
        if d < 0.2 * t2:
            # differencing drowned in dispatch noise (tiny workloads):
            # fall back to the raw long-chain time -- conservative
            # (includes the fixed overhead) but never nonsense
            d = t2 / 2.0
        elapsed = min(elapsed, d)

    pixels_per_s = batch_size * image_size * image_size * n_iters / elapsed

    baseline_path = os.path.join(os.path.dirname(__file__), "BENCH_BASELINE.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            baseline = json.load(f)["value"]
    else:
        baseline = pixels_per_s
        with open(baseline_path, "w") as f:
            json.dump(
                {
                    "metric": "pixels/s fwd+bwd 256x256 teapot silhouette",
                    "value": pixels_per_s,
                    "note": "round-1 first measurement (reference publishes none)",
                    "platform": jax.default_backend(),
                },
                f,
            )

    print(
        json.dumps(
            {
                "metric": "pixels/s fwd+bwd 256x256 teapot silhouette",
                "value": round(pixels_per_s, 1),
                "unit": "pixels/s",
                "vs_baseline": round(pixels_per_s / baseline, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
