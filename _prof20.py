import time
import numpy as np
import jax, jax.numpy as jnp
import neural_renderer_v2_pytorch_tpu as nr
from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
from neural_renderer_v2_pytorch_tpu.ops.gather_resolve import resolve_and_gather
from neural_renderer_v2_pytorch_tpu.ops.resolve import weight_map_from_gathered
from neural_renderer_v2_pytorch_tpu.ops import shading
from neural_renderer_v2_pytorch_tpu.ops.differentiation import differentiation

vertices, faces = nr.load_obj("/root/reference/tests_torch/data/teapot.obj")
V = jnp.asarray(vertices[None]); F = jnp.asarray(faces)
eye = jnp.asarray(np.array(nr.get_points_from_angles(2.732, 30, 0), "float32"))
S = 512

def device_time(fn, N=50):
    @jax.jit
    def run(v):
        def body(v, _):
            out = fn(v)
            return v + 1e-20 * out, None
        v, _ = jax.lax.scan(body, v, None, length=N)
        return v
    o = run(V); jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = run(V); jax.block_until_ready(o)
    return (time.perf_counter() - t0) / N * 1e3

def stage(level, bwd=False):
    def f(v):
        tv = perspective(look_at(v, eye), angle=30.0)
        fv = tv[:, F]
        fim, fvm, _ = resolve_and_gather(fv, None, S, 0.1, 100.0, True, "pallas")
        if level == 0:
            return jnp.sum(fvm)
        wm = weight_map_from_gathered(fvm, fim, S)
        cm = shading.compute_coordinate_map_from(fvm, wm)
        if level == 1:
            return jnp.sum(cm)
        sil = (fim >= 0).astype(jnp.float32)[..., None]
        im = differentiation(sil, cm)
        if level == 2:
            return jnp.sum(im)
        im = im[:, ::-1, ::-1]
        b, h, w, c = im.shape
        im = im.reshape(b, h//2, 2, w//2, 2, c).mean((2, 4))
        im = jnp.transpose(im, (0, 3, 1, 2))
        return jnp.sum(im ** 2)
    if bwd:
        g = jax.grad(f)
        return lambda v: jnp.sum(g(v))
    return f

for lvl, name in [(0, "resolve+gather"), (1, "+weight+coord"), (2, "+sil+diff"), (3, "+finalize")]:
    t_f = device_time(stage(lvl))
    t_b = device_time(stage(lvl, bwd=True))
    print(f"{name:16s} fwd {t_f:6.3f} ms   fwd+bwd {t_b:6.3f} ms")
