from tpuflow.vo import se3, tracking, pose_graph, ba, checkpoint

__all__ = ["se3", "tracking", "pose_graph", "ba", "checkpoint"]
