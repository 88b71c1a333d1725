from gaussctrl_tpu.core.mesh import make_mesh, shard_views, replicate
