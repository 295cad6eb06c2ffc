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

def device_time(fn, N=50):
    @jax.jit
    def run(v):
        def body(v, _):
            return v + 1e-20 * fn(v), None
        v, _ = jax.lax.scan(body, v, None, length=N)
        return v
    o = run(FV); jax.block_until_ready(o)
    t0 = time.perf_counter()
    o = run(FV); jax.block_until_ready(o)
    return (time.perf_counter() - t0) / N * 1e3

# a: binning prepass only
def f_bin(fv):
    order, cnt = rp._bin_faces(fv, S, 1, 4, 512, 128, True)
    return jnp.sum(order.astype(jnp.float32)) + jnp.sum(cnt.astype(jnp.float32))
print("bin prepass:                 %.3f ms" % device_time(f_bin))

# b: resolve only (no latch)
def f_res(fv):
    idx = rp.compute_face_index_map_pallas(fv, S)
    return jnp.sum(idx.astype(jnp.float32))
print("resolve (no latch):          %.3f ms" % device_time(f_res))

# c: full _run_binned latch, planar outputs (no transpose)
def f_latch(fv):
    idx, coords, _ = rp._run_binned(fv, None, S, 0.1, 100.0, True, 64, None, 16, True, False)
    return jnp.sum(coords) + jnp.sum(idx.astype(jnp.float32))
print("resolve+latch planar:        %.3f ms" % device_time(f_latch))

# d: + the [bs,9,H,W] -> [bs,H,W,3,3] transpose
def f_latch_t(fv):
    idx, coords, _ = rp._run_binned(fv, None, S, 0.1, 100.0, True, 64, None, 16, True, False)
    fvm = coords.transpose(0, 2, 3, 1).reshape(1, S, S, 3, 3)
    return jnp.sum(fvm) + jnp.sum(idx.astype(jnp.float32))
print("resolve+latch + transpose:   %.3f ms" % device_time(f_latch_t))

# e: latch with different tiles
for (th, K, rw) in [(512,64,16),(256,64,16),(256,256,16),(128,256,16),(512,256,16),(512,616,16),(512,616,8)]:
    def f(fv, th=th, K=K, rw=rw):
        idx, coords, _ = rp._run_binned(fv, None, S, 0.1, 100.0, True, K, (th,128), rw, True, False)
        return jnp.sum(coords) + jnp.sum(idx.astype(jnp.float32))
    print("latch tile=(%d,128) K=%d rw=%d: %.3f ms" % (th, K, rw, device_time(f)))
