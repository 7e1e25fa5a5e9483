from tpuflow.vo import se3, tracking, pose_graph, ba

__all__ = ["se3", "tracking", "pose_graph", "ba"]
