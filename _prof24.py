import time
import numpy as np
import jax, jax.numpy as jnp
import neural_renderer_v2_pytorch_tpu as nr
from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
from neural_renderer_v2_pytorch_tpu.ops import resolve_pallas as rp

vertices, faces = nr.load_obj("/root/reference/tests_torch/data/teapot.obj")
V = jnp.asarray(vertices[None]); F = jnp.asarray(faces)
eye = jnp.asarray(np.array(nr.get_points_from_angles(2.732, 30, 0), "float32"))
S = 512
tv = jax.jit(lambda v: perspective(look_at(v, eye), angle=30.0))(V)
FV = tv[:, F]

def wall(fn, carry, N):
    @jax.jit
    def run(v):
        def body(v, _):
            return fn(v), None
        v, _ = jax.lax.scan(body, v, None, length=N)
        return v
    o = run(carry); jax.block_until_ready(o)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        o = run(carry); jax.block_until_ready(o)
        best = min(best, time.perf_counter() - t0)
    return best

def device_time(fn, N1=50, N2=200):
    return (wall(fn, FV, N2) - wall(fn, FV, N1)) / (N2 - N1) * 1e3

for (th, tw, K, rw) in [(512,128,64,16),(512,128,64,8),(512,128,256,16),(512,128,616,16),
                        (256,128,64,16),(512,128,64,32),(512,256,64,16),(512,512,64,16),
                        (512,128,32,8),(512,128,128,16)]:
    def f(fv, th=th, tw=tw, K=K, rw=rw):
        idx, coords, _ = rp._run_binned(fv, None, S, 0.1, 100.0, True, K, (th,tw), rw, True, False)
        return fv + 1e-20*(jnp.sum(coords) + jnp.sum(idx.astype(jnp.float32)))
    print("latch tile=(%3d,%3d) K=%3d rw=%2d: %.3f ms" % (th, tw, K, rw, device_time(f)))
