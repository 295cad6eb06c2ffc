"""Kernel census of the driver-bench training step on the current backend.

Compiles the exact bench.py step (256^2 teapot silhouette, AA on, fwd+bwd
+ SGD update) and prints the post-optimization kernel list: one line per
top-level HLO instruction of the entry computation (fusions, custom-calls
= Pallas kernels, reduce-windows, copies...), with shapes.  This is the
ground truth for "how many kernels does one step dispatch" -- the lever
VERDICT round-2 item 3 names for the driver metric.

Usage: PYTHONPATH=. python benchmarks/kernel_census.py [--no-scan]
"""

import argparse
import collections
import os as _os
import re
import sys as _sys

import numpy as np

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

DEFAULT_OBJ = "/root/reference/tests_torch/data/teapot.obj"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--image-size", type=int, default=256)
    p.add_argument("--obj", default=DEFAULT_OBJ)
    p.add_argument(
        "--scan", action="store_true",
        help="census the lax.scan-chained body (as bench.py runs it) "
        "instead of a single step",
    )
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
    from neural_renderer_v2_pytorch_tpu.ops.rasterize import (
        RasterizeHyperparam,
        rasterize_silhouettes,
    )

    v, f = nr.load_obj(args.obj)
    vertices = jnp.asarray(v[None])
    faces = np.asarray(f)
    eye = np.array(nr.get_points_from_angles(2.732, 30, 0), "float32")
    hp = RasterizeHyperparam(image_size=args.image_size)

    def loss_fn(vertices):
        tv = perspective(look_at(vertices, eye), angle=30.0)
        images = rasterize_silhouettes(tv, faces, None, hp)
        return jnp.sum(images * images) / (jnp.sum(images) + 1.0)

    def step(vertices, _=None):
        loss, grad = jax.value_and_grad(loss_fn)(vertices)
        return vertices - 1e-6 * grad, loss

    if args.scan:
        def fn(vertices):
            return jax.lax.scan(step, vertices, None, length=8)
    else:
        fn = step

    compiled = jax.jit(fn).lower(vertices).compile()
    txt = compiled.as_text()

    # Entry computation = the ENTRY block; in optimized HLO every top-level
    # instruction there is one dispatched thunk/kernel (fusions, custom
    # calls, copies, while-loops...).
    entry = []
    in_entry = False
    depth = 0
    for line in txt.splitlines():
        if re.match(r"ENTRY ", line):
            in_entry = True
            depth = 0
            continue
        if in_entry:
            depth += line.count("{") - line.count("}")
            if depth < 0:
                break
            m = re.match(
                r"\s*(?:ROOT\s+)?%?([\w.-]+)\s*=\s*(\S+)\s+([a-z0-9_-]+)\(",
                line,
            )
            if m:
                name, shape, op = m.groups()
                entry.append((op, shape, name, line.strip()))

    skip = {"parameter", "constant", "get-tuple-element", "tuple", "bitcast"}
    kernels = [e for e in entry if e[0] not in skip]
    print("entry instructions: %d, dispatched kernels: %d" % (len(entry), len(kernels)))
    counts = collections.Counter(k[0] for k in kernels)
    for op, c in counts.most_common():
        print("  %4d  %s" % (c, op))
    print()
    for op, shape, name, line in kernels:
        detail = ""
        if op == "fusion":
            mk = re.search(r"kind=(\w+)", line)
            if mk:
                detail = mk.group(1)
        if "custom-call" in op:
            mc = re.search(r'custom_call_target="([^"]+)"', line)
            if mc:
                detail = mc.group(1)
        print("%-14s %-34s %-28s %s" % (op, shape[:34], name[:28], detail))

    # while-loop bodies (the resolve scan etc.) dispatch their own kernels
    # every iteration -- census those too
    for m in re.finditer(r"^%?([\w.-]*while[\w.-]*) .*\{", txt, re.M):
        pass
    n_while = len(re.findall(r"\bwhile\(", txt))
    print("\n(while ops in module: %d -- each body kernel re-dispatches per iteration)" % n_while)


if __name__ == "__main__":
    main()
