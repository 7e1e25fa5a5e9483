from tpuflow.sharding.mesh import make_flow_mesh
from tpuflow.sharding.halo import exchange_halo_2d
from tpuflow.sharding.tiled_flow import tiled_lucas_kanade_single_scale

__all__ = [
    "make_flow_mesh",
    "exchange_halo_2d",
    "tiled_lucas_kanade_single_scale",
]
