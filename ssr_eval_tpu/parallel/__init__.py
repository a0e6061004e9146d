from ssr_eval_tpu.parallel.mesh import batch_sharding, data_mesh, pad_batch_for_mesh

__all__ = ["batch_sharding", "data_mesh", "pad_batch_for_mesh"]
