from . import config, pcd, replay, synthetic, trajectory  # noqa: F401
