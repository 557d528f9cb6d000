from . import pose_graph, scan_context  # noqa: F401
