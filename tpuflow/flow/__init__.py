from tpuflow.flow.single_scale import lucas_kanade_single_scale
from tpuflow.flow.pyramidal import lucas_kanade_pyramidal

__all__ = ["lucas_kanade_single_scale", "lucas_kanade_pyramidal"]
