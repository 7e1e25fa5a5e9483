from tpuflow.io.frames import (
    load_frame_bin,
    save_frame_bin,
    load_frame_mem,
    save_frame_mem,
    load_flow_text,
    save_flow_text,
)

__all__ = [
    "load_frame_bin",
    "save_frame_bin",
    "load_frame_mem",
    "save_frame_mem",
    "load_flow_text",
    "save_flow_text",
]
