"""Worker for the 2-process jax.distributed dryrun (test_examples.py).

Run as: python distributed_worker.py <process_id> <num_processes> <port>

Each process owns 2 virtual CPU devices; the workers bring up the
multi-process runtime through ``parallel.distributed.initialize`` (the
production entry point, BASELINE.json config 5), build a global
(data, tile) mesh spanning both processes, render a sharded silhouette,
and check the cross-process result against a locally computed oracle.
"""

import os
import sys


def main():
    process_id, num_processes, port = (int(a) for a in sys.argv[1:4])
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax

    jax.config.update("jax_platforms", "cpu")
    # cross-process CPU collectives (TPU pods use ICI natively)
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    from neural_renderer_v2_pytorch_tpu.parallel import distributed

    assert distributed.initialize(
        coordinator_address="localhost:%d" % port,
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    n_global = num_processes * 2
    assert len(jax.devices()) == n_global, jax.devices()

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    import neural_renderer_v2_pytorch_tpu as nr
    from neural_renderer_v2_pytorch_tpu.ops.rasterize import (
        RasterizeHyperparam,
        rasterize_silhouettes,
    )
    from neural_renderer_v2_pytorch_tpu.parallel import rasterize_silhouettes_sharded

    mesh = distributed.global_mesh(data=2)  # tile = n_global // 2
    assert mesh.shape["data"] == 2 and mesh.shape["tile"] == n_global // 2
    # a second mesh with the face axis spanning processes: the ordered
    # z-combine's all_gather crosses the process boundary
    mesh_face = distributed.global_mesh(data=1, tile=n_global // 2, face=2)

    vertices = np.array(
        [[1, 0, 0], [-1, 0, 0], [0, 1, 0], [0, -1, 0], [0, 0, 1], [0, 0, -1]],
        "float32",
    )
    faces = np.array(
        [[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
         [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]],
        "int32",
    )
    renderer = nr.Renderer()
    bs = 2
    eyes = np.stack(
        [np.array(nr.get_points_from_angles(2.732, 20, 50 * (i + 1)), "float32")
         for i in range(bs)]
    )
    renderer.viewpoints = jnp.asarray(eyes)
    tv = renderer.transform_vertices(jnp.asarray(np.tile(vertices[None], (bs, 1, 1))))
    hp = RasterizeHyperparam(image_size=32, anti_aliasing=False)

    # shard the (replicated host) inputs onto the global mesh
    tv_sharded = jax.device_put(tv, NamedSharding(mesh, P("data")))
    out = rasterize_silhouettes_sharded(
        tv_sharded, jnp.asarray(faces), None, hp, mesh=mesh
    )
    # replicate across processes for comparison (an all_gather over DCN)
    gathered = jax.jit(
        lambda x: x, out_shardings=NamedSharding(mesh, P(None))
    )(out)
    got = np.asarray(gathered.addressable_data(0))

    want = np.asarray(rasterize_silhouettes(tv, jnp.asarray(faces), None, hp))
    np.testing.assert_array_equal(got, want)
    assert got.sum() > 0  # the octahedron is visible

    # face-sharded across the process boundary: each process resolves a
    # face range and the ordered z-combine all_gathers winners over the
    # (gloo / DCN-like) link
    tv_f = jax.device_put(tv, NamedSharding(mesh_face, P()))
    out_f = rasterize_silhouettes_sharded(
        tv_f, jnp.asarray(faces), None, hp, mesh=mesh_face
    )
    got_f = np.asarray(
        jax.jit(lambda x: x, out_shardings=NamedSharding(mesh_face, P()))(
            out_f
        ).addressable_data(0)
    )
    np.testing.assert_array_equal(got_f, want)
    print("distributed_worker %d/%d OK" % (process_id, num_processes), flush=True)


if __name__ == "__main__":
    main()
