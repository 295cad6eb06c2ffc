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
bs, nf = 1, FV.shape[1]
n_tiles, K = 4, 64
order, cnt = jax.jit(lambda fv: rp._bin_faces(fv, S, 1, 4, 512, 128, True))(FV)

def device_time(fn, N=100):
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


def f_gather(fv):
    flat = fv.reshape(bs, 1, nf, 9)
    binned = jnp.take_along_axis(flat, order[..., None], axis=2)
    binned = jnp.pad(binned, ((0,0),(0,0),(0,(-nf)%K),(0,0)))
    nc = binned.shape[2] // K
    fc = binned.reshape(bs, n_tiles*nc, K, 9).transpose(0, 1, 3, 2)
    return jnp.sum(fc)
print("bin gather+layout: %.3f ms" % device_time(f_gather))
