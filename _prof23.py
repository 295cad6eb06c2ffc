import time
import numpy as np
import jax, jax.numpy as jnp
import neural_renderer_v2_pytorch_tpu as nr
from neural_renderer_v2_pytorch_tpu.ops.camera import look_at, perspective
from neural_renderer_v2_pytorch_tpu.ops import resolve_pallas as rp
from neural_renderer_v2_pytorch_tpu.models.lights import AmbientLight, DirectionalLight, SpecularLight
from neural_renderer_v2_pytorch_tpu.ops.rasterize import RasterizeHyperparam, RasterizeParam, rasterize_rgba, rasterize_silhouettes

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

def device_time(fn, carry=None, N1=50, N2=200):
    c = FV if carry is None else carry
    return (wall(fn, c, N2) - wall(fn, c, N1)) / (N2 - N1) * 1e3

print("prepass:            %.3f ms" % device_time(lambda fv: fv + 1e-20*jnp.sum(rp._bin_faces(fv, S, 1, 4, 512, 128, True)[0].astype(jnp.float32))))
print("resolve (no latch): %.3f ms" % device_time(lambda fv: fv + 1e-20*jnp.sum(rp.compute_face_index_map_pallas(fv, S).astype(jnp.float32))))
def f_latch(fv):
    idx, coords, _ = rp._run_binned(fv, None, S, 0.1, 100.0, True, 64, None, 16, True, False)
    return fv + 1e-20*(jnp.sum(coords) + jnp.sum(idx.astype(jnp.float32)))
print("resolve+latch:      %.3f ms" % device_time(f_latch))

hp = RasterizeHyperparam(image_size=256)
def sil_step(v):
    def loss(v):
        im = rasterize_silhouettes(perspective(look_at(v, eye), angle=30.0), F, None, hp)
        return jnp.sum(im * im)
    return v - 1e-9 * jax.grad(loss)(v)
t = device_time(sil_step, V)
print("silhouette fwd+bwd: %.3f ms (%.1f Mpx/s)" % (t, 256*256/t/1e3))

vt, ft, tex = nr.create_textures(F.shape[0], texture_size=2)
VT = jnp.asarray(vt[None]); FT = jnp.asarray(ft); TEX = jnp.asarray(tex[None])
p = RasterizeParam(vertices_textures=VT, faces_textures=FT, textures=TEX, texture_size=2)
def tex_step(v):
    def loss(v):
        im = rasterize_rgba(perspective(look_at(v, eye), angle=30.0), F, p, hp)
        return jnp.sum(im * im)
    return v - 1e-9 * jax.grad(loss)(v)
print("textured fwd+bwd:   %.3f ms" % device_time(tex_step, V))
