from vct_tpu.parallel.mesh import make_mesh, shard_batch_arrays, replicate  # noqa: F401
