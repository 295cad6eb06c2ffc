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


hit = jnp.asarray(np.random.RandomState(0).rand(1, 4, nf) < 0.3)
def f_compact(fv):
    h = hit
    hp_ = jnp.cumsum(h, -1, dtype=jnp.int32) - 1
    mp = nf - jnp.cumsum(~h, -1, dtype=jnp.int32)
    pos = jnp.where(h, hp_, mp)
    ids = jnp.broadcast_to(jnp.arange(nf, dtype=jnp.int32), h.shape)
    o = jnp.zeros(h.shape, jnp.int32).at[
        jnp.arange(1)[:, None, None], jnp.arange(4)[None, :, None], pos
    ].set(ids, mode="drop")
    return jnp.sum(o.astype(jnp.float32)) + jnp.sum(fv) * 0
print("cumsum+scatter:    %.3f ms" % device_time(f_compact))
